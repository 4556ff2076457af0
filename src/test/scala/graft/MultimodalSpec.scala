package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world", "en"),
    (2L, "bonjour", "fr")
  ).toDF("doc_id", "text", "lang")

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
    // md5("hello world")
    assert(feats(0).content_md5 == "5eb63bbbe01eeed093cb22bb8f5acdc3")
    assert(feats(0).head_hex == "68656c6c6f20776f") // "hello wo"
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
}
