package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with a typed
  * metadata struct, plus a per-partition batched "decode" operator.
  *
  * The decode itself is a STUB — this container has no image/audio codecs —
  * but everything Spark-side is real and load-bearing: the schema shape
  * (binary + struct metadata), the per-partition batch iteration (the same
  * shape a Pandas-UDF/mapInPandas decode would have), and the partitioning
  * story (payload stays columnar-compressed in parquet; decode is a narrow
  * map, no shuffle).
  */
object Multimodal {

  val MetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("lang", StringType)))

  /** Wrap a text table as multimodal assets: payload bytes + typed meta.
    * Stands in for real image/audio blobs in the fixtures. */
  def toAssets(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("content"),
      struct(
        lit("text/plain").as("mime"),
        length(col("text")).cast("long").as("n_bytes"),
        col("lang").as("lang")).as("meta"))

  case class DecodedFeature(
      doc_id: Long, n_bytes: Long, content_md5: String, head_hex: String)

  /** Batched per-partition decode. The inner `decodeBytes` is the stub —
    * a real deployment swaps in an image/audio codec with this exact
    * signature; the iterator shape (one partition in, lazily one feature
    * row out per asset, no materialization of the whole partition) is the
    * production shape. */
  def decodeFeatures(assets: DataFrame): Dataset[DecodedFeature] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        val md = java.security.MessageDigest.getInstance("MD5")
        batch.map { case (id, bytes) =>
          val feature = decodeBytes(md, bytes)
          DecodedFeature(id, bytes.length.toLong, feature._1, feature._2)
        }
      }
  }

  /** STUB decode: deterministic fake features (md5 + head bytes) standing
    * in for codec output. Replace with a real decoder off-container. */
  private def decodeBytes(
      md: java.security.MessageDigest, bytes: Array[Byte]): (String, String) = {
    md.reset()
    val digest = md.digest(bytes).map("%02x".format(_)).mkString
    val head = bytes.take(8).map("%02x".format(_)).mkString
    (digest, head)
  }

  /** Byte-range sampling (the "frame sample" analogue): slice the payload
    * without decoding — pure column ops, stays in whole-stage codegen. */
  def sampleBytes(assets: DataFrame, offset: Int, len: Int): DataFrame =
    assets.select(
      col("doc_id"),
      expr(s"substring(content, ${offset + 1}, $len)").as("sample"),
      col("meta.n_bytes").as("n_bytes"))

  /** Frame sampling as 1-to-N: `n` evenly spaced fixed-width slices per
    * asset, one output row per frame — the output shape of real video
    * frame extraction. Offsets are computed as columns and exploded;
    * slicing never decodes, so the whole operator is a narrow map (the
    * explode amplifies rows, never shuffles). */
  def sampleFrames(assets: DataFrame, n: Int, frameLen: Int = 16): DataFrame = {
    val offsets = sequence(
      lit(0), lit(n - 1)).cast("array<int>") // frame indices 0..n-1
    assets
      .withColumn("frame_idx", explode(offsets))
      .withColumn("__off",
        (col("frame_idx").cast("long") *
          greatest(col("meta.n_bytes") / n, lit(1L))).cast("int"))
      .select(
        col("doc_id"), col("frame_idx"),
        expr(s"substring(content, __off + 1, $frameLen)").as("frame_bytes"))
  }

  case class ResizedAsset(doc_id: Long, content: Array[Byte],
      mime: String, n_bytes: Long)

  /** Resize stub with the production signature: batched per-partition
    * transform of payload bytes that also EVOLVES the metadata (new size,
    * derived mime) — the part a column-level slice can't model. The byte
    * transform itself (truncate) stands in for a codec re-encode. */
  def resizeAssets(assets: DataFrame, maxBytes: Int): Dataset[ResizedAsset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("doc_id", "content", "meta.mime")
      .as[(Long, Array[Byte], String)]
      .mapPartitions { batch =>
        batch.map { case (id, bytes, mime) =>
          val out = if (bytes.length <= maxBytes) bytes else bytes.take(maxBytes)
          ResizedAsset(id, out, mime + ";resized", out.length.toLong)
        }
      }
  }
}
