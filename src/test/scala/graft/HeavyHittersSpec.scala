package graft

import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("misraGries keeps at most k counters and never drops a > n/k item") {
    // 60× "hot" (> 100/8), mixed with 40 distinct cold items
    val data = Seq.fill(60)("hot") ++ (1 to 40).map(i => s"cold$i")
    val out = HeavyHitters.misraGries(data.iterator, 8).toSeq
    assert(out.size <= 8)
    assert(out.contains("hot"))
  }

  test("exactHeavyHitters equals the exact definition under any partitioning") {
    // skewed corpus: item i appears i·i times (deterministic, no RNG)
    val corpus = (1 to 30).flatMap(i => Seq.fill(i * i)(s"w$i"))
    val expected = {
      val n = corpus.size
      corpus.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * 10 > n }
        .toSeq.sortBy { case (w, c) => (-c, w) }
    }
    for (parts <- Seq(1, 3, 13)) {
      val got = HeavyHitters.exactHeavyHitters(
        corpus.toDS().repartition(parts), 10)
        .as[(String, Long)].collect().toSeq
      assert(got == expected, s"partitions=$parts")
    }
  }
}
