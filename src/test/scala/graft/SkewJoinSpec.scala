package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the rows of the plain join under heavy skew") {
    // 90% of the large side lands on one key
    val large = (1 to 1000).map { i =>
      (if (i <= 900) 1L else (i % 7).toLong, s"v$i")
    }.toDF("k", "payload")
    val small = Seq((0L, "zero"), (1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("k", "dim")

    val plain = large.join(small, "k")
    val salted = SkewJoin.saltedEquiJoin(large, small, "k", factor = 8)

    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0)
    assert(plain.except(salted).count() == 0)
  }

  test("AQE skewJoin splits the SAME unsalted join at runtime") {
    // The alternative to manual salting: leave the join unsalted and let
    // AQE split the oversized shuffle partition at runtime. Thresholds
    // are shrunk so the test's ~MB-scale hot key trips the same detector
    // that fires at GB scale in production. Manual salting (above) still
    // wins where this mechanism cannot run: streaming joins (AQE is
    // disabled in streaming plans), bucketed/exchange-free joins (no
    // shuffle stats to split), and broadcast-ineligible single hot HASH
    // buckets pinned by an upstream repartition the plan must preserve.
    val keep = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // enough partitions that the MEDIAN partition is a non-hot one —
      // skew detection compares each partition against the median, so at
      // the suite default of 2 the hot partition IS the median
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // force sort-merge (skew split applies to shuffle joins, and a
      // broadcast would dodge the scenario under test)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val large = (1 to 60000).map { i =>
        (if (i <= 54000) 1L else (i % 7).toLong, s"payload-$i-${"x" * 32}")
      }.toDF("k", "payload")
      val small = (0L to 7L).map(k => (k, s"dim$k")).toDF("k", "dim")
      val joined = large.join(small, "k")
      // collect() drives THIS queryExecution (count() would plan its own),
      // so executedPlan below is the adaptive FINAL plan
      assert(joined.collect().length == 60000)
      val executed = joined.queryExecution.executedPlan.toString
      assert(executed.contains("skew=true"),
        s"expected AQE to mark the skewed join, got:\n$executed")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("the shuffle key includes the salt (mechanism, not just result)") {
    val large = Seq((1L, "a")).toDF("k", "payload")
    val small = Seq((1L, "dim")).toDF("k", "dim")
    val plan = SkewJoin.saltedEquiJoin(large, small, "k", factor = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"))
  }
}
