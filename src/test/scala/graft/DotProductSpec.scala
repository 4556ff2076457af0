package graft

import graft.expressions.{DotProduct, GraftFunctions}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("registered function computes the dot product in SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(r == 32.0)
  }

  test("text-kernel expressions are SQL-callable with pinned semantics") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      "SELECT graft_simhash('hello world', 64) AS s64, " +
        "graft_simhash('', 64) AS s0, " +
        "graft_shingle_bands('a b c d', 2, 8).shingles AS sh, " +
        "graft_shingle_bands('too short', 3, 8) AS none").head()
    assert(row.getLong(0) != 0L)
    assert(row.getLong(1) == 0L) // empty text → zero signature
    assert(row.getSeq[String](2) == Seq("a b", "b c", "c d"))
    assert(row.isNullAt(3)) // sub-k docs → null struct (callers drop)
  }

  test("matches the aggregate/zip_with fold bit-for-bit on real doubles") {
    GraftFunctions.register(spark)
    val df = Seq.tabulate(50)(i =>
      (i.toLong, Array.tabulate(64)(j => math.sin(i * 64 + j)),
        Array.tabulate(64)(j => math.cos(i * 64 + j))))
      .toDF("id", "a", "b")
    val both = df.select(
      call_function("graft_dot", col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), _ * _), lit(0.0), _ + _).as("fold"))
    assert(both.filter(col("native") =!= col("fold")).count() == 0)
  }

  test("interpreted eval matches codegen and truncates to the shorter array") {
    val e = DotProduct(
      Literal.create(Seq(1.0, 2.0, 3.0), ArrayType(DoubleType)),
      Literal.create(Seq(10.0, 20.0), ArrayType(DoubleType)))
    assert(e.eval(null) == 50.0)
  }

  test("null arrays propagate null") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d")
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("extensions deployment path installs graft_dot at session build") {
    import org.apache.spark.sql.SparkSession
    // spark.sql.extensions instantiates the class reflectively via its
    // zero-arg constructor — pin that contract...
    val ext = classOf[graft.expressions.GraftExtensions]
      .getDeclaredConstructor().newInstance()
    // ...and drive the same injection machinery through the public
    // withExtensions builder on a genuinely new SparkSession.
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val fresh = SparkSession.builder().master("local[2]")
        .withExtensions(ext).getOrCreate()
      val r = fresh.sql(
        "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .collect()(0).getDouble(0)
      assert(r == 11.0)
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }
}
