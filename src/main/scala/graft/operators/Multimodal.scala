package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with a typed
  * metadata struct, plus per-partition batched decode operators.
  *
  * Two real codec tiers: the PPM (P6) path is a pure-Scala codec —
  * encode, decode, pixel features, nearest-neighbour resize, all
  * oracle-verified against independent ground truth — and the
  * PNG/JPEG/BMP/GIF tier runs the JDK's bundled `javax.imageio` codecs
  * (no external dependency): [[imageChannelSums]] decodes real
  * compressed bytes, [[resizeImage]] decodes → remaps → re-encodes.
  * [[decodeFeatures]] sniffs each payload with ImageIO and emits
  * decoded dimensions for recognized images, falling back to
  * fingerprint features for opaque payloads. The Spark-side shape is
  * shared across tiers — binary + struct schema, lazy per-partition
  * batch iteration (the mapInPandas shape), narrow no-shuffle decode.
  */
object Multimodal {

  // ImageIO's default stream cache round-trips EVERY encode/decode
  // through a temp FILE — per-row disk create/write/delete in the codec
  // hot path, which on a real cluster is per-row disk thrash across every
  // executor. One static switch moves the cache in-memory; it runs when
  // this object first loads in each JVM (driver and, because the
  // mapPartitions closures reference the object, each executor).
  javax.imageio.ImageIO.setUseCache(false)

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
      doc_id: Long, n_bytes: Long, kind: String,
      content_md5: String, head_hex: String)

  /** Batched per-partition decode with real format sniffing: each payload
    * is probed with the JDK's ImageIO registry; recognized images decode
    * (for real — the compressed bytes are parsed) and report
    * `"<format>:<w>x<h>"`, opaque payloads report `"opaque"` plus
    * fingerprint features. The iterator shape (one partition in, lazily
    * one feature row out per asset, no materialization of the whole
    * partition) is the production shape. */
  def decodeFeatures(assets: DataFrame): Dataset[DecodedFeature] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        val md = java.security.MessageDigest.getInstance("MD5")
        batch.map { case (id, bytes) =>
          md.reset()
          val digest = md.digest(bytes).map("%02x".format(_)).mkString
          val head = bytes.take(8).map("%02x".format(_)).mkString
          val kind = sniffImage(bytes)
            .map { case (fmt, img) => s"$fmt:${img.getWidth}x${img.getHeight}" }
            .getOrElse("opaque")
          DecodedFeature(id, bytes.length.toLong, kind, digest, head)
        }
      }
  }

  // ---- Cached ImageIO SPIs ------------------------------------------------
  // ImageIO.read / ImageIO.write / getImageReaders walk the SPI REGISTRY on
  // every call, and those traversals synchronize on shared registry state.
  // Under 32 decode threads the lock convoys: measured at the 1000× ladder
  // point, dd_phash_canonical burned 2.8× MORE core-time at 32 threads
  // (38.3 s × 32) than at 8 (54.8 s × 8) on identical work — a super-linear
  // wall-clock term that is pure contention, not codec cost (SCALE.md r13).
  // The SPIs are stateless factories, so resolve them ONCE per JVM in
  // registry order and create a fresh (thread-confined) reader/writer per
  // call — the same provider-selection semantics ImageIO's own lookup has,
  // minus the per-call registry walk.
  private lazy val readerSpis: Array[javax.imageio.spi.ImageReaderSpi] = {
    val it = javax.imageio.spi.IIORegistry.getDefaultInstance
      .getServiceProviders(classOf[javax.imageio.spi.ImageReaderSpi], true)
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[javax.imageio.spi.ImageReaderSpi]
    while (it.hasNext) buf += it.next()
    buf.toArray
  }
  private val writerSpiCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[javax.imageio.spi.ImageWriterSpi]]
  /** ALL registry-order writer SPIs naming `format` — cached per JVM.
    * Callers must still apply ImageIO.write's per-image filter
    * (`canEncodeImage(ImageTypeSpecifier)`) before writing: the
    * first-named SPI may not encode a given image type, and write()'s
    * own selection would have skipped it rather than fail inside the
    * writer or emit invalid bytes. */
  private def writerSpisFor(format: String): Array[javax.imageio.spi.ImageWriterSpi] =
    writerSpiCache.computeIfAbsent(format.toLowerCase(java.util.Locale.ROOT), f => {
      val it = javax.imageio.spi.IIORegistry.getDefaultInstance
        .getServiceProviders(classOf[javax.imageio.spi.ImageWriterSpi], true)
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[javax.imageio.spi.ImageWriterSpi]
      while (it.hasNext) {
        val spi = it.next()
        if (spi.getFormatNames.exists(
          _.toLowerCase(java.util.Locale.ROOT) == f)) buf += spi
      }
      require(buf.nonEmpty, s"no ImageIO writer for format '$format'")
      buf.toArray
    })

  /** A fresh reader over `bytes`, chosen by each cached SPI's own
    * canDecodeInput probe (registry order — the selection ImageIO's
    * getImageReaders makes). Caller must dispose the reader and close the
    * stream; None if no installed codec recognizes the payload. */
  private def newReaderFor(bytes: Array[Byte])
      : Option[(javax.imageio.ImageReader, javax.imageio.stream.ImageInputStream)] = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    var i = 0
    while (i < readerSpis.length) {
      val spi = readerSpis(i)
      // the registry's own filter swallows IOException (a too-short
      // payload EOFs inside canDecodeInput); it also leaves the stream
      // position undefined on that path, so restore it before probing
      // the next SPI
      val pos = iis.getStreamPosition
      val can =
        try spi.canDecodeInput(iis)
        catch { case _: java.io.IOException => iis.seek(pos); false }
      if (can) {
        val reader = spi.createReaderInstance()
        reader.setInput(iis)
        return Some((reader, iis))
      }
      i += 1
    }
    iis.close()
    None
  }

  /** Decode `bytes` with the cached-SPI path — ImageIO.read minus the
    * per-call registry walk. Null when no codec recognizes the payload. */
  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
    newReaderFor(bytes) match {
      case None => null
      case Some((reader, iis)) =>
        try reader.read(0)
        finally { reader.dispose(); iis.close() }
    }

  /** Probe bytes against the cached reader SPIs; on a match, REALLY
    * decode (returns the format name and the decoded image). Returns None
    * for payloads no installed codec recognizes. */
  private def sniffImage(bytes: Array[Byte])
      : Option[(String, java.awt.image.BufferedImage)] =
    newReaderFor(bytes) match {
      case None => None
      case Some((reader, iis)) =>
        try {
          Some((reader.getFormatName.toLowerCase, reader.read(0)))
        } catch {
          case _: java.io.IOException => None
        } finally { reader.dispose(); iis.close() }
    }

  // ---- Real codec path #1: binary PPM (P6), pure Scala -------------------
  // This decode path is REAL: bytes are parsed, pixel features computed,
  // and the oracle checks them against independently derived ground truth
  // (not a replay of the same code).

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

  /** Batched per-partition resize that also EVOLVES the metadata (new
    * size, derived mime) — the part a column-level slice can't model.
    * ImageIO-decodable payloads go through a REAL codec round-trip
    * (decode → nearest-neighbour remap to `imgW`×`imgH` → re-encode in
    * the source format); opaque payloads fall back to a byte-cap
    * truncation. */
  def resizeAssets(assets: DataFrame, maxBytes: Int,
      imgW: Int = 8, imgH: Int = 6): Dataset[ResizedAsset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("doc_id", "content", "meta.mime")
      .as[(Long, Array[Byte], String)]
      .mapPartitions { batch =>
        batch.map { case (id, bytes, mime) =>
          sniffImage(bytes) match {
            case Some((fmt, img)) =>
              val out = encodeImage(imgW, imgH, fmt, (x, y) => {
                val rgb = img.getRGB(x * img.getWidth / imgW,
                  y * img.getHeight / imgH)
                ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
              })
              ResizedAsset(id, out, s"image/$fmt;resized", out.length.toLong)
            case None =>
              val out =
                if (bytes.length <= maxBytes) bytes else bytes.take(maxBytes)
              ResizedAsset(id, out, mime + ";resized", out.length.toLong)
          }
        }
      }
  }

  // ---- Real codec path #2: JDK ImageIO (PNG/JPEG/BMP/GIF) ----------------
  // The JDK bundles real image codecs in javax.imageio — no external
  // dependency. PNG is lossless, so a formula-generated image
  // round-trips exactly and the oracle checks channel sums against the
  // generating formula (the PPM pattern); JPEG is lossy, so the oracle
  // checks the decoded dimensions instead.

  /** Encode an RGB image through a JDK ImageIO writer ("png", "jpeg",
    * "bmp", ...). */
  def encodeImage(width: Int, height: Int, format: String,
      rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    // cached-SPI writer (see readerSpis): replay ImageIO.write's FULL
    // selection — first registry-order SPI naming the format that also
    // canEncodeImage this image's type — created per call, no registry
    // walk. Name-only selection could hand TYPE_INT_RGB to a writer that
    // cannot encode it and fail inside write() (or emit invalid bytes).
    val ts = javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img)
    val spi = writerSpisFor(format).find(_.canEncodeImage(ts)).getOrElse(
      throw new IllegalArgumentException(
        s"no ImageIO writer for format '$format' can encode a " +
          s"${img.getType}-type image"))
    val writer = spi.createWriterInstance()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.write(img)
      ios.flush()
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  case class ImageFeature(doc_id: Long, format: String,
      width: Int, height: Int, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Batched per-partition REAL image decode via `ImageIO.read`: the
    * compressed payload (PNG/JPEG/...) is parsed by the JDK codec and
    * reduced to per-channel pixel sums (exact integers, hash-stable).
    * Narrow map — same shape as [[ppmChannelSums]]. */
  def imageChannelSums(assets: DataFrame): Dataset[ImageFeature] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (fmt, img) = sniffImage(bytes).getOrElse(
          throw new IllegalArgumentException(
            s"asset $id: no installed ImageIO codec recognizes the payload"))
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        ImageFeature(id, fmt, img.getWidth, img.getHeight, sr, sg, sb)
      })
  }

  /** Real resize through a real codec: ImageIO decode → nearest-neighbour
    * remap → re-encode in `format`. */
  def resizeImage(bytes: Array[Byte], newW: Int, newH: Int,
      format: String): Array[Byte] = {
    val src = readImage(bytes)
    require(src != null, "no installed ImageIO codec recognizes the payload")
    encodeImage(newW, newH, format, (x, y) => {
      val rgb = src.getRGB(x * src.getWidth / newW, y * src.getHeight / newH)
      ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
    })
  }

  // ---- Perceptual hashing over real decoded pixels -----------------------

  case class AHash(doc_id: Long, sig: Long)

  /** Average-hash (aHash) perceptual fingerprint computed from REAL
    * decoded bytes: the JDK codec parses the payload, an 8×8
    * nearest-neighbour grid samples the red channel, and bit j = y·8+x
    * sets when the sample strictly exceeds the integer mean
    * (`sum div 64`). All arithmetic is integer, so the 64-bit signature
    * is engine-exact and the downstream Hamming banding
    * (Dedup.simhashPairsFromSigs) sits on the oracle gate. Narrow
    * per-partition map — decode cost only, no shuffle. */
  def aHash64(assets: DataFrame): Dataset[AHash] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img = readImage(bytes)
        require(img != null, s"asset $id: not a decodable image payload")
        val w = img.getWidth
        val h = img.getHeight
        val g = new Array[Int](64)
        var sum = 0L
        var j = 0
        while (j < 64) {
          val sx = ((j % 8) * w) / 8
          val sy = ((j / 8) * h) / 8
          val v = (img.getRGB(sx, sy) >> 16) & 0xff
          g(j) = v
          sum += v
          j += 1
        }
        val mean = sum / 64
        var sig = 0L
        j = 0
        while (j < 64) {
          if (g(j) > mean) sig |= 1L << j
          j += 1
        }
        AHash(id, sig)
      })
  }

  // ---- Real codec path #4: multi-frame GIF (video-frame extraction) ------
  // The byte-slice frame sampler models the SHAPE of frame extraction;
  // this tier does the real thing on a real container: frames are written
  // into one animated-GIF payload (JDK ImageIO sequence writer) and read
  // back frame-by-frame. GIF is palette-indexed, so frames use an explicit
  // 256-level grayscale palette — the round trip is lossless and the
  // formula oracle holds bit-exactly per frame.

  private lazy val grayPalette: java.awt.image.IndexColorModel = {
    val ramp = Array.tabulate[Byte](256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** Encode `nFrames` grayscale frames as ONE animated GIF payload via the
    * JDK's ImageIO sequence writer. `gray(frame, x, y)` ∈ [0, 256). */
  def encodeGifFrames(width: Int, height: Int, nFrames: Int,
      gray: (Int, Int, Int) => Int): Array[Byte] = {
    // frames here are always TYPE_BYTE_INDEXED over the grayscale palette
    // — every JDK GIF writer encodes indexed images, but run write()'s
    // canEncodeImage filter anyway for parity with encodeImage
    val gifTs = javax.imageio.ImageTypeSpecifier.createFromBufferedImageType(
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    val writer = writerSpisFor("gif").find(_.canEncodeImage(gifTs)).getOrElse(
      throw new IllegalArgumentException(
        "no ImageIO GIF writer can encode indexed frames")).createWriterInstance()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      // The JDK GIF writer defaults to interlaced row order, which its own
      // reader mis-reassembles for short images (rows land permuted/zeroed).
      // Non-interlaced output round-trips bit-exactly.
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val raster = img.getRaster
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            raster.setSample(x, y, 0, gray(f, x, y))
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), param)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      ios.close()
      writer.dispose()
    }
    baos.toByteArray
  }

  case class GifFrame(
      doc_id: Long, frame_idx: Int, width: Int, height: Int, sum_gray: Long)

  /** Batched per-partition REAL frame extraction: each GIF payload is
    * parsed by the JDK codec, every contained frame decoded
    * (`reader.read(i)`), and reduced to an exact gray-channel sum — the
    * 1-to-N output shape of video frame extraction with a real container
    * parse inside. Narrow flatMap, no shuffle. */
  def gifFrameSums(assets: DataFrame): Dataset[GifFrame] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val opened = newReaderFor(bytes)
        require(opened.nonEmpty, s"asset $id: not a decodable image payload")
        val (reader, iis) = opened.get
        try {
          try {
            val n = reader.getNumImages(true)
            (0 until n).map { i =>
              val img = reader.read(i)
              var sum = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  sum += (img.getRGB(x, y) >> 16) & 0xff // gray: r == g == b
                  x += 1
                }
                y += 1
              }
              GifFrame(id, i, img.getWidth, img.getHeight, sum)
            }
          } finally reader.dispose()
        } finally iis.close()
      })
  }

  // ---- Real codec path #3: RIFF/WAV PCM audio ----------------------------
  // Audio is the third modality the multimodal pillar claims; this tier is
  // a pure-Scala RIFF/WAV container codec (mono 16-bit PCM) with the same
  // independent-ground-truth oracle contract as the PPM tier: the fixture
  // samples come from a closed-form formula, the engine round-trips the
  // actual WAV bytes, and the oracle evaluates the formula directly in SQL
  // without touching the bytes.

  case class WavAudio(sampleRate: Int, samples: Array[Short])

  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
  }
  private def getLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def getLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Encode mono 16-bit PCM as a RIFF/WAVE container: `RIFF` header,
    * `fmt ` chunk (PCM, 1 channel, 16-bit), `data` chunk of little-endian
    * samples. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
    putLe32(out, 4, 36 + dataLen)
    "WAVEfmt ".getBytes("US-ASCII").copyToArray(out, 8)
    putLe32(out, 16, 16)               // fmt chunk size
    out(20) = 1; out(21) = 0           // audio format: PCM
    out(22) = 1; out(23) = 0           // channels: mono
    putLe32(out, 24, sampleRate)
    putLe32(out, 28, sampleRate * 2)   // byte rate
    out(32) = 2; out(33) = 0           // block align
    out(34) = 16; out(35) = 0          // bits per sample
    "data".getBytes("US-ASCII").copyToArray(out, 36)
    putLe32(out, 40, dataLen)
    var i = 0
    while (i < samples.length) {
      out(44 + 2 * i) = samples(i).toByte
      out(44 + 2 * i + 1) = (samples(i) >> 8).toByte
      i += 1
    }
    out
  }

  /** Decode a RIFF/WAVE container by walking its chunk list (fmt/data can
    * appear in any order, with unknown chunks skipped — the real container
    * grammar, not a fixed-offset slice). Requires mono 16-bit PCM. */
  def decodeWav(bytes: Array[Byte]): WavAudio = {
    require(bytes.length >= 44 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE payload")
    var pos = 12
    var rate = -1
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length && (rate < 0 || samples == null)) {
      val tag = new String(bytes, pos, 4, "US-ASCII")
      val len = getLe32(bytes, pos + 4)
      tag match {
        case "fmt " =>
          require(getLe16(bytes, pos + 8) == 1, "not PCM")
          require(getLe16(bytes, pos + 10) == 1, "not mono")
          require(getLe16(bytes, pos + 22) == 16, "not 16-bit")
          rate = getLe32(bytes, pos + 12)
        case "data" =>
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) {
            samples(i) = getLe16(bytes, pos + 8 + 2 * i).toShort
            i += 1
          }
        case _ => // skip unknown chunk
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(rate > 0 && samples != null, "missing fmt or data chunk")
    WavAudio(rate, samples)
  }

  /** Real audio resample through the codec: decode → decimate to `outN`
    * samples by nearest-index remap (`out(j) = s(j·n/outN)`) → re-encode.
    * The sample rate is preserved (this models frame-count normalization
    * for fixed-width model inputs, not pitch-correct resampling). */
  def resampleWav(bytes: Array[Byte], outN: Int): Array[Byte] = {
    val wav = decodeWav(bytes)
    val out = new Array[Short](outN)
    var j = 0
    while (j < outN) {
      out(j) = wav.samples(j * wav.samples.length / outN)
      j += 1
    }
    encodeWav(wav.sampleRate, out)
  }

  case class WavFeature(
      doc_id: Long, sample_rate: Int, n_samples: Int,
      sum_amp: Long, sum_abs: Long, peak: Int, zero_cross: Long)

  /** Batched per-partition REAL WAV decode → exact integer signal
    * statistics (sum, absolute sum, peak amplitude, zero crossings) —
    * hash-stable, so the cross-engine compare is exact. Narrow map, the
    * [[ppmChannelSums]] shape with an audio codec inside. */
  def wavStats(assets: DataFrame): Dataset[WavFeature] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val wav = decodeWav(bytes)
        var (sum, sumAbs, zc) = (0L, 0L, 0L)
        var peak = 0
        var i = 0
        while (i < wav.samples.length) {
          val s = wav.samples(i).toInt
          sum += s
          sumAbs += math.abs(s)
          if (math.abs(s) > peak) peak = math.abs(s)
          if (i > 0 && (s >= 0) != (wav.samples(i - 1) >= 0)) zc += 1
          i += 1
        }
        WavFeature(id, wav.sampleRate, wav.samples.length, sum, sumAbs, peak, zc)
      })
  }

  case class ImageTilePatch(
      doc_id: Long, tile_x: Int, tile_y: Int, n_px: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** ViT-style patch extraction over REAL decoded pixels: the image
    * splits into a `tile`×`tile` grid (edge tiles smaller) and each
    * patch reduces to exact per-channel integer sums — the
    * image-side analogue of document chunking, and the shape a
    * patch-embedding pipeline runs before projection. One decode per
    * asset, a bounded 1→(⌈w/t⌉·⌈h/t⌉) flatMap, no shuffle. */
  def imageTiles(assets: DataFrame, tile: Int): Dataset[ImageTilePatch] = {
    require(tile >= 1, s"tile must be >= 1, got $tile")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val img = readImage(bytes)
        require(img != null, s"asset $id: not a decodable image payload")
        val (w, h) = (img.getWidth, img.getHeight)
        for {
          ty <- 0 until (h + tile - 1) / tile
          tx <- 0 until (w + tile - 1) / tile
        } yield {
          var (sr, sg, sb, n) = (0L, 0L, 0L, 0L)
          var y = ty * tile
          while (y < math.min((ty + 1) * tile, h)) {
            var x = tx * tile
            while (x < math.min((tx + 1) * tile, w)) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff
              sg += (rgb >> 8) & 0xff
              sb += rgb & 0xff
              n += 1
              x += 1
            }
            y += 1
          }
          ImageTilePatch(id, tx, ty, n, sr, sg, sb)
        }
      })
  }

  case class WavSegments(
      doc_id: Long, n_segments: Long, active_samples: Long,
      first_start: Long, last_end: Long)

  /** Energy-run activity segmentation over REAL decoded audio — the
    * VAD-shaped pass a speech pipeline runs before transcription: an
    * ACTIVE run is ≥ `minRun` consecutive samples with |amplitude| ≥
    * `threshold`. Pure integer decisions on decoded PCM (no float
    * energy), so segment boundaries are engine-exact and the oracle
    * replays them from the generating formula with a gaps-and-islands
    * window. Narrow per-partition map, decode-bound, no shuffle —
    * the same scale shape as every codec operator. `first_start` /
    * `last_end` are -1 when a clip has no qualifying run. */
  def wavActiveSegments(
      assets: DataFrame, threshold: Int, minRun: Int): Dataset[WavSegments] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val wav = decodeWav(bytes)
        var (nSeg, active, firstStart, lastEnd) = (0L, 0L, -1L, -1L)
        var runStart = -1
        var i = 0
        while (i <= wav.samples.length) {
          val on = i < wav.samples.length &&
            math.abs(wav.samples(i).toInt) >= threshold
          if (on && runStart < 0) runStart = i
          else if (!on && runStart >= 0) {
            val len = i - runStart
            if (len >= minRun) {
              nSeg += 1
              active += len
              if (firstStart < 0) firstStart = runStart.toLong
              lastEnd = (i - 1).toLong
            }
            runStart = -1
          }
          i += 1
        }
        WavSegments(id, nSeg, active, firstStart, lastEnd)
      })
  }
}
