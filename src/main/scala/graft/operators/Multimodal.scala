package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with a typed
  * metadata struct, plus per-partition batched decode operators.
  *
  * Two tiers of honesty: the PPM (P6) path is a REAL codec — encode,
  * decode, pixel features, nearest-neighbour resize, all pure Scala and
  * oracle-verified against independent ground truth. Heavy codecs
  * (JPEG/audio/video) are not in this container, so [[decodeFeatures]] /
  * [[resizeAssets]] keep that tier's decode a documented STUB while the
  * Spark-side shape — binary + struct schema, lazy per-partition batch
  * iteration (the mapInPandas shape), narrow no-shuffle decode — is real
  * and load-bearing for both tiers.
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

  // ---- Real codec path: binary PPM (P6) ----------------------------------
  // Heavy codecs (JPEG/PNG/audio) stay out of this container, but P6 PPM
  // needs none — so this decode path is REAL: bytes are parsed, pixel
  // features computed, and the oracle checks them against independently
  // derived ground truth (not a replay of the same code).

  case class PpmImage(width: Int, height: Int, pixels: Array[Byte])

  /** Encode an RGB image as binary PPM (P6, maxval 255). */
  def encodePpm(width: Int, height: Int,
      rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val body = new Array[Byte](width * height * 3)
    var i = 0
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        body(i) = r.toByte; body(i + 1) = g.toByte; body(i + 2) = b.toByte
        i += 3; x += 1
      }
      y += 1
    }
    header ++ body
  }

  /** Decode binary PPM (P6, maxval 255): whitespace-delimited header
    * tokens, then raw RGB triples. */
  def decodePpm(bytes: Array[Byte]): PpmImage = {
    var pos = 0
    def token(): String = {
      while (Character.isWhitespace(bytes(pos))) pos += 1
      val st = pos
      while (!Character.isWhitespace(bytes(pos))) pos += 1
      new String(bytes, st, pos - st, "US-ASCII")
    }
    require(token() == "P6", "not a binary PPM")
    val w = token().toInt
    val h = token().toInt
    require(token().toInt == 255, "unsupported maxval")
    pos += 1 // exactly one whitespace byte separates header from data
    PpmImage(w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + w * h * 3))
  }

  /** Nearest-neighbour resize — a REAL re-encode (the thing the byte-slice
    * stubs can't model): decode, remap pixels, encode. */
  def resizePpm(bytes: Array[Byte], newW: Int, newH: Int): Array[Byte] = {
    val img = decodePpm(bytes)
    encodePpm(newW, newH, (x, y) => {
      val sx = x * img.width / newW
      val sy = y * img.height / newH
      val i = (sy * img.width + sx) * 3
      (img.pixels(i) & 0xff, img.pixels(i + 1) & 0xff, img.pixels(i + 2) & 0xff)
    })
  }

  case class PpmFeature(
      doc_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Batched per-partition PPM decode → per-channel pixel sums (exact
    * integers, so the cross-engine compare is hash-stable). Narrow map,
    * same shape as [[decodeFeatures]] but with a real codec inside. */
  def ppmChannelSums(assets: DataFrame): Dataset[PpmFeature] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img = decodePpm(bytes)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var i = 0
        while (i < img.pixels.length) {
          sr += img.pixels(i) & 0xff
          sg += img.pixels(i + 1) & 0xff
          sb += img.pixels(i + 2) & 0xff
          i += 3
        }
        PpmFeature(id, img.width, img.height, sr, sg, sb)
      })
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
