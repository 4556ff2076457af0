package graft

import graft.operators.{Packing, Sampling}
import org.apache.spark.sql.functions._

class SamplingPackingSpec extends SparkSpec {
  import spark.implicits._

  test("hash sample is deterministic and rate-accurate") {
    val df = (0L until 10000L).map(i => (i, if (i % 4 == 0) "a" else "b"))
      .toDF("id", "grp")
    val s1 = Sampling.bernoulli(df, "id", 0.1).select("id").as[Long].collect().toSet
    val s2 = Sampling.bernoulli(df, "id", 0.1).select("id").as[Long].collect().toSet
    assert(s1 == s2) // same sample every run — no RNG anywhere
    // md5 is uniform: 10% ± 1 percentage point over 10k keys
    assert(math.abs(s1.size - 1000) < 100, s"got ${s1.size}")
    // monotone in rate: a 10% sample is a subset of a 20% sample
    val s20 = Sampling.bernoulli(df, "id", 0.2).select("id").as[Long].collect().toSet
    assert(s1.subsetOf(s20))
  }

  test("stratified sample applies per-stratum rates over one filter") {
    val df = (0L until 10000L).map(i => (i, if (i % 2 == 0) "hi" else "lo"))
      .toDF("id", "grp")
    val out = Sampling.stratified(df, "id", "grp", Map("hi" -> 0.3), 0.05)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(math.abs(out("hi") - 1500) < 150, s"hi=${out("hi")}")
    assert(math.abs(out("lo") - 250) < 80, s"lo=${out("lo")}")
  }

  test("split labels every row exactly once and appends never move old rows") {
    val df = (0L until 10000L).map(i => (i, i % 7)).toDF("id", "x")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val labeled = Sampling.split(df, "id", splits)
    // a partition: every row gets exactly one of the declared labels
    assert(labeled.count() == 10000L)
    val counts = labeled.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train") - 8000) < 300, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 1000) < 150, s"val=${counts("val")}")
    // append stability: the first 5k rows' labels are identical whether
    // the other 5k exist or not — eval membership never drifts as the
    // corpus grows
    val half = Sampling.split(df.filter(col("id") < 5000), "id", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    val full = labeled.filter(col("id") < 5000)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(half == full)
    intercept[IllegalArgumentException] {
      Sampling.split(df, "id", Seq("a" -> 0.5, "b" -> 0.4)) // sums to 0.9
    }
  }

  test("approx_count_distinct stays within 5% of exact (an_approx_distinct)") {
    // the CORRECTNESS row hashes the within_5pct flag; this pins the same
    // bound executable-y at a second scale
    val rows = SparkEntry.queries("an_approx_distinct")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("within_5pct") == 1,
        s"${r.getString(0)}: exact=${r.getAs[Long]("exact_users")} outside 5%")
    }
  }

  test("seqPack: offsets are exclusive prefix sums, bins respect the budget") {
    val df = Seq(
      (1L, "s", 600), (2L, "s", 600), (3L, "s", 600), (4L, "s", 600),
      (5L, "t", 1000), (6L, "t", 1500)
    ).toDF("id", "stream", "n")
    val out = Packing.seqPack(df, "id", "stream", col("n"), budget = 1024)
      .select("id", "start_offset", "bin").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    // stream s: offsets 0,600,1200,1800 → bins 0,0,1,1
    assert(out.take(4).map(r => (r._2, r._3)).toSeq ==
      Seq((0L, 0L), (600L, 0L), (1200L, 1L), (1800L, 1L)))
    // stream t packs independently: offsets 0,1000 → bins 0,0
    assert(out.drop(4).map(r => (r._2, r._3)).toSeq ==
      Seq((0L, 0L), (1000L, 0L)))
  }
}
