package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world", "en"),
    (2L, "bonjour", "fr")
  ).toDF("doc_id", "text", "lang")

  test("PPM encode→decode roundtrips pixels exactly") {
    val bytes = Multimodal.encodePpm(5, 3, (x, y) => (x * 40, y * 80, x + y))
    val img = Multimodal.decodePpm(bytes)
    assert(img.width == 5 && img.height == 3)
    assert((img.pixels(0) & 0xff) == 0)
    // pixel (4, 2): r=160, g=160, b=6 at offset (2*5+4)*3
    val i = (2 * 5 + 4) * 3
    assert((img.pixels(i) & 0xff) == 160)
    assert((img.pixels(i + 1) & 0xff) == 160)
    assert((img.pixels(i + 2) & 0xff) == 6)
  }

  test("PPM resize remaps pixels by nearest neighbour") {
    val bytes = Multimodal.encodePpm(4, 4, (x, y) => (x * 60, y * 60, 0))
    val small = Multimodal.decodePpm(Multimodal.resizePpm(bytes, 2, 2))
    assert(small.width == 2 && small.height == 2)
    // output (1,1) samples source (2,2): r=120, g=120
    val i = (1 * 2 + 1) * 3
    assert((small.pixels(i) & 0xff) == 120)
    assert((small.pixels(i + 1) & 0xff) == 120)
  }

  test("ppmChannelSums decodes real bytes distributed") {
    val df = Seq((7L, Multimodal.encodePpm(2, 2, (_, _) => (1, 2, 3))))
      .toDF("doc_id", "content")
    val out = Multimodal.ppmChannelSums(df).collect()
    assert(out.head == Multimodal.PpmFeature(7L, 2, 2, 4L, 8L, 12L))
  }

  test("toAssets produces binary payload with typed metadata") {
    val assets = Multimodal.toAssets(docs)
    val r = assets.filter(col("doc_id") === 1).collect()(0)
    assert(new String(r.getAs[Array[Byte]]("content"), "UTF-8") == "hello world")
    val meta = r.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getAs[String]("mime") == "text/plain")
    assert(meta.getAs[Long]("n_bytes") == 11L)
  }

  test("decodeFeatures maps partitions to deterministic features") {
    val feats = Multimodal.decodeFeatures(Multimodal.toAssets(docs))
      .collect().sortBy(_.doc_id)
    assert(feats(0).n_bytes == 11L)
    assert(feats(0).kind == "opaque") // text bytes: no codec claims them
    // md5("hello world")
    assert(feats(0).content_md5 == "5eb63bbbe01eeed093cb22bb8f5acdc3")
    assert(feats(0).head_hex == "68656c6c6f20776f") // "hello wo"
  }

  test("decodeFeatures sniffs and really decodes PNG payloads") {
    val png = Multimodal.encodeImage(5, 3, "png", (x, y) => (x * 40, y * 80, 0))
    val assets = Seq((9L, png)).toDF("doc_id", "content")
    val f = Multimodal.decodeFeatures(assets).collect().head
    assert(f.kind == "png:5x3")
  }

  test("ImageIO PNG encode→decode round-trips channel sums losslessly") {
    val png = Multimodal.encodeImage(4, 2, "png", (x, y) => (x * 50, y * 100, 7))
    val df = Seq((3L, png)).toDF("doc_id", "content")
    val out = Multimodal.imageChannelSums(df).collect().head
    // sums from the formula: r = 2*(0+50+100+150), g = 4*(0+100), b = 8*7
    assert(out == Multimodal.ImageFeature(3L, "png", 4, 2, 600L, 400L, 56L))
  }

  test("JPEG payloads decode to the right dimensions") {
    val jpg = Multimodal.encodeImage(7, 5, "jpeg", (x, y) => (x * 30, y * 40, 9))
    val df = Seq((4L, jpg)).toDF("doc_id", "content")
    val out = Multimodal.imageChannelSums(df).collect().head
    assert(out.format == "jpeg" && out.width == 7 && out.height == 5)
  }

  test("resizeImage remaps pixels through the JDK codec") {
    val png = Multimodal.encodeImage(4, 4, "png", (x, y) => (x * 60, y * 60, 0))
    val small = Multimodal.resizeImage(png, 2, 2, "png")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(small))
    assert(img.getWidth == 2 && img.getHeight == 2)
    // output (1,1) samples source (2,2): r=120, g=120
    val rgb = img.getRGB(1, 1)
    assert(((rgb >> 16) & 0xff) == 120 && ((rgb >> 8) & 0xff) == 120)
  }

  test("resizeAssets re-encodes decodable images through the codec") {
    val png = Multimodal.encodeImage(16, 12, "png", (x, y) => (x, y, 0))
    val assets = Seq((8L, png)).toDF("doc_id", "content")
      .withColumn("meta", struct(
        lit("image/png").as("mime"),
        length(col("content")).cast("long").as("n_bytes"),
        lit("n/a").as("lang")))
    val out = Multimodal.resizeAssets(assets, maxBytes = 5, imgW = 8, imgH = 6)
      .collect().head
    assert(out.mime == "image/png;resized")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.content))
    assert(img.getWidth == 8 && img.getHeight == 6)
    // output (3,2) samples source (6,4) → r=6, g=4
    val rgb = img.getRGB(3, 2)
    assert(((rgb >> 16) & 0xff) == 6 && ((rgb >> 8) & 0xff) == 4)
  }

  test("sampleBytes slices payload without decode") {
    val s = Multimodal.sampleBytes(Multimodal.toAssets(docs), 0, 5)
      .filter(col("doc_id") === 1).collect()(0)
    assert(new String(s.getAs[Array[Byte]]("sample"), "UTF-8") == "hello")
  }

  test("sampleFrames explodes n evenly spaced slices per asset") {
    val frames = Multimodal.sampleFrames(Multimodal.toAssets(docs), n = 3, frameLen = 4)
      .filter(col("doc_id") === 1).orderBy("frame_idx").collect()
    assert(frames.length == 3)
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 1, 2))
    // n_bytes=11: even spacing floor(i*11/3) → offsets 0, 3, 7
    assert(frames.map(f =>
      new String(f.getAs[Array[Byte]]("frame_bytes"), "UTF-8")).toSeq ==
      Seq("hell", "lo w", "orld"))
  }

  test("resizeAssets truncates payloads and evolves metadata") {
    val out = Multimodal.resizeAssets(Multimodal.toAssets(docs), maxBytes = 5)
      .collect().sortBy(_.doc_id)
    assert(new String(out(0).content, "UTF-8") == "hello")
    assert(out(0).n_bytes == 5L)
    assert(out(0).mime == "text/plain;resized")
    assert(out(1).n_bytes == 5L) // "bonjo"
  }

  test("WAV encode→decode roundtrips samples and rate exactly") {
    val samples = Array[Short](0, 100, -100, 32767, -32768, 7)
    val wav = Multimodal.decodeWav(Multimodal.encodeWav(44100, samples))
    assert(wav.sampleRate == 44100)
    assert(wav.samples.toSeq == samples.toSeq)
  }

  test("WAV decode walks the chunk list, skipping unknown chunks") {
    val base = Multimodal.encodeWav(8000, Array[Short](5, -5))
    // splice a LIST chunk (odd length → padded) between fmt and data
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = base.take(36) ++ extra ++ base.drop(36)
    // RIFF size field is informational for our walker; fix it anyway
    val wav = Multimodal.decodeWav(spliced)
    assert(wav.sampleRate == 8000 && wav.samples.toSeq == Seq[Short](5, -5))
  }

  test("WAV decode rejects non-RIFF and non-PCM payloads") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav("not audio at all, just bytes".getBytes ++
        new Array[Byte](44))
    }
    val bad = Multimodal.encodeWav(8000, Array[Short](1))
    bad(20) = 3 // claim IEEE-float format
    intercept[IllegalArgumentException](Multimodal.decodeWav(bad))
  }

  test("resampleWav decimates by nearest index through a real re-encode") {
    val wav = Multimodal.decodeWav(Multimodal.resampleWav(
      Multimodal.encodeWav(16000, Array.tabulate[Short](8)(i => (i * 10).toShort)), 4))
    // out(j) = s(j*8/4): indices 0, 2, 4, 6
    assert(wav.samples.toSeq == Seq[Short](0, 20, 40, 60))
    assert(wav.sampleRate == 16000)
  }

  test("GIF multi-frame encode→decode is lossless on the gray palette") {
    val bytes = Multimodal.encodeGifFrames(4, 3, 3,
      (f, x, y) => (f * 50 + x * 10 + y * 20) % 256)
    val df = Seq((5L, bytes)).toDF("doc_id", "content")
    val out = Multimodal.gifFrameSums(df).collect().sortBy(_.frame_idx)
    assert(out.length == 3)
    // frame f sum = Σ (f*50 + x*10 + y*20) % 256 over 4x3 grid
    def expect(f: Int) = (for (x <- 0 until 4; y <- 0 until 3)
      yield (f * 50 + x * 10 + y * 20) % 256).sum.toLong
    out.foreach { fr =>
      assert(fr.width == 4 && fr.height == 3)
      assert(fr.sum_gray == expect(fr.frame_idx),
        s"frame ${fr.frame_idx}: ${fr.sum_gray} != ${expect(fr.frame_idx)}")
    }
  }

  test("wavStats decodes real RIFF bytes distributed with exact stats") {
    val df = Seq(
      (1L, Multimodal.encodeWav(8000, Array[Short](3, -4, 5, -6))))
      .toDF("doc_id", "content")
    val out = Multimodal.wavStats(df).collect()
    // sum=-2, sumAbs=18, peak=6, crossings at every step
    assert(out.head == Multimodal.WavFeature(1L, 8000, 4, -2L, 18L, 6, 3L))
  }

  test("wavActiveSegments flushes a run that ends exactly at clip end") {
    // run of 4 loud samples terminates AT the final sample — the off-end
    // flush must still count it; a 3-sample run must not qualify
    val loudTail = Array[Short](0, 0, 2000, 2000, 2000, 2000)
    val shortRun = Array[Short](2000, 2000, 2000, 0, 0, 0)
    val df = Seq(
      (1L, Multimodal.encodeWav(8000, loudTail)),
      (2L, Multimodal.encodeWav(8000, shortRun)))
      .toDF("doc_id", "content")
    val out = Multimodal.wavActiveSegments(df, threshold = 1024, minRun = 4)
      .collect().map(s => s.doc_id -> s).toMap
    assert(out(1L) == Multimodal.WavSegments(1L, 1L, 4L, 2L, 5L))
    assert(out(2L) == Multimodal.WavSegments(2L, 0L, 0L, -1L, -1L))
  }

  test("imageTiles covers every pixel exactly once, edge tiles smaller") {
    // 10x6 image, tile 4: grid 3x2; right-edge tiles are 2 wide
    val img = Multimodal.encodeImage(10, 6, "png", (x, y) => (x, y, 1))
    val df = Seq((1L, img)).toDF("doc_id", "content")
    val tiles = Multimodal.imageTiles(df, tile = 4).collect()
    assert(tiles.length == 6)
    assert(tiles.map(_.n_px).sum == 60L, "tiles must partition the pixels")
    val edge = tiles.find(t => t.tile_x == 2 && t.tile_y == 0).get
    // x in {8,9}, y in 0..3: n=8, sum_r = (8+9)*4 = 68, sum_b = n
    assert(edge.n_px == 8L && edge.sum_r == 68L && edge.sum_b == 8L)
  }
}
