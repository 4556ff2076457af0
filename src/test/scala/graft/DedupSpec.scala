package graft

import graft.operators.{Dedup, TextOps}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"), // near-dup of 1
    (3L, "completely different content about spark query engines at scale"),
    (4L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 1
    (5L, "short text")
  ).toDF("doc_id", "text")

  test("exactKeepFirst keeps lowest id per key") {
    val out = Dedup.exactKeepFirst(
      docs.withColumn("fp", TextOps.fingerprint(col("text"))),
      Seq("fp"), "doc_id")
    assert(out.count() == 4)
    assert(out.filter(col("doc_id") === 4).count() == 0)
  }

  test("minhashNearDupPairs finds exact and near duplicates, not unrelated") {
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text")
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // exact dup always survives
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L))) // near-dup
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("jaccard integers are exact: identical docs give inter == union") {
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text")
      .filter(col("a") === 1 && col("b") === 4).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getAs[Long]("n_inter") == pairs(0).getAs[Long]("n_union"))
  }
}
