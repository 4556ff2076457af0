package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: membership test of a string against a
  * serialized `org.apache.spark.util.sketch.BloomFilter` literal.
  *
  * This is the corpus-side half of a 100 TB semi-join: the SMALL side
  * (an eval set, a blocklist, yesterday's keys) folds into a bloom filter
  * — a driver-side model artifact of a few MB, like the ANN codebooks —
  * and ships to every task as a literal, so the 100 TB side tests
  * membership inside its scan (narrow, codegen'd, no shuffle, no
  * broadcast hash table of the raw strings). False positives are possible
  * by construction; callers that need exactness follow with an exact join
  * on the (orders-of-magnitude smaller) surviving rows — the standard
  * bloom-gate-then-verify shape Spark's own runtime row-level filters use.
  *
  * Spark's equivalent expression (`BloomFilterMightContain`) is
  * internal-only and keyed on xxhash64; this one hashes the UTF-8 bytes
  * exactly as `DataFrameStatFunctions.bloomFilter` puts them
  * (`putString(s) ≡ putBinary(utf8(s))`), so filters built with
  * `df.stat.bloomFilter` are directly usable.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      // Null/empty filter bytes would otherwise surface as an opaque
      // NPE/EOF inside the lazy deserialization, far from the call site.
      case (BinaryType, StringType)
          if left.foldable && left.eval(null) == null =>
        TypeCheckResult.TypeCheckFailure(
          "graft_bloom_contains: serialized-filter literal is NULL")
      case (BinaryType, StringType) if left.foldable &&
          left.eval(null).asInstanceOf[Array[Byte]].isEmpty =>
        TypeCheckResult.TypeCheckFailure(
          "graft_bloom_contains: serialized-filter literal is empty")
      case (BinaryType, StringType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, StringType) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_bloom_contains requires a FOLDABLE serialized-filter " +
            "literal as the first argument")
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_bloom_contains requires (binary, string), got " +
            s"${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = BooleanType

  /** Plans print the registered SQL name, not the class name. */
  override def prettyName: String = "graft_bloom_contains"

  /** Deserialized once per executor/task from the foldable literal, not
    * per row. */
  @transient private lazy val bloom: BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    try BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
    catch {
      case e: java.io.IOException => throw new IllegalArgumentException(
        s"graft_bloom_contains: cannot deserialize the ${bytes.length}-byte " +
          "filter literal (truncated or not a spark BloomFilter)", e)
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    bloom.mightContainBinary(b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, b) =>
      s"${ev.value} = $ref.mightContainBinary($b.getBytes());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  /** The serialization this expression's lazy `readFrom` mirrors — the
    * one place the filter-bytes contract lives. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
