package graft

import graft.operators.Scd
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "alice", 10.0),
    (2L, "bob", 20.0),
    (3L, "carol", 30.0)
  ).toDF("id", "name", "bal")

  private def updates = Seq(
    (2L, 25.0, "2024-06-01"), // update of an existing key
    (9L, 99.0, "2024-07-01")  // brand-new key
  ).toDF("id", "bal", "eff")

  private def run = Scd.scd2(target, updates, "id",
    carryCols = Seq("name"), trackCols = Seq("bal"),
    effDateCol = "eff", initDate = "2020-01-01")
    .orderBy("id", "valid_from")

  test("untouched keys keep one open current version") {
    val rows = run.filter(col("id") === 1L).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("valid_from") == "2020-01-01")
    assert(r.getAs[String]("valid_to") == null)
    assert(r.getAs[Boolean]("is_current"))
    assert(r.getAs[Double]("bal") == 10.0)
  }

  test("updated keys close the old version and open the new one") {
    val rows = run.filter(col("id") === 2L).collect()
    assert(rows.length == 2)
    val Array(old, fresh) = rows
    assert(old.getAs[String]("valid_to") == "2024-06-01" &&
      !old.getAs[Boolean]("is_current") && old.getAs[Double]("bal") == 20.0)
    assert(fresh.getAs[String]("valid_from") == "2024-06-01" &&
      fresh.getAs[String]("valid_to") == null &&
      fresh.getAs[Boolean]("is_current") && fresh.getAs[Double]("bal") == 25.0)
    // carry column rides into the new version from the target
    assert(fresh.getAs[String]("name") == "bob")
  }

  test("brand-new keys insert one current version with null carry columns") {
    val rows = run.filter(col("id") === 9L).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("name") == null)
    assert(r.getAs[Double]("bal") == 99.0)
    assert(r.getAs[String]("valid_from") == "2024-07-01" &&
      r.getAs[Boolean]("is_current"))
  }

  test("row count is |target| + |updates| exactly (one new version per change)") {
    assert(run.count() == 5L)
  }

  test("applyBatches folds N change sets into one version chain") {
    val b1 = Seq((2L, 21.0, "2024-01-01")).toDF("id", "bal", "eff")
    val b2 = Seq((2L, 22.0, "2024-02-01"), (9L, 99.0, "2024-02-15")).toDF("id", "bal", "eff")
    val b3 = Seq((2L, 23.0, "2024-03-01")).toDF("id", "bal", "eff")
    val out = Scd.applyBatches(target, Seq(b1, b2, b3), "id",
      carryCols = Seq("name"), trackCols = Seq("bal"),
      effDateCol = "eff", initDate = "2020-01-01")
    val k2 = out.filter(col("id") === 2L).orderBy("valid_from").collect()
    assert(k2.map(_.getAs[String]("valid_from")).toSeq ==
      Seq("2020-01-01", "2024-01-01", "2024-02-01", "2024-03-01"))
    assert(k2.map(_.getAs[String]("valid_to")).toSeq ==
      Seq("2024-01-01", "2024-02-01", "2024-03-01", null))
    assert(k2.map(_.getAs[Boolean]("is_current")).toSeq ==
      Seq(false, false, false, true))
    assert(k2.map(_.getAs[Double]("bal")).toSeq == Seq(20.0, 21.0, 22.0, 23.0))
    // carry column rides through every version
    assert(k2.forall(_.getAs[String]("name") == "bob"))
    // untouched key: single open version
    val k1 = out.filter(col("id") === 1L).collect()
    assert(k1.length == 1 && k1.head.getAs[Boolean]("is_current"))
    // brand-new key: chain starts at its first restatement, null carry
    val k9 = out.filter(col("id") === 9L).collect()
    assert(k9.length == 1 && k9.head.getAs[String]("valid_from") == "2024-02-15"
      && k9.head.getAs[String]("name") == null)
  }

  test("applyTaggedBatches over one tagged frame equals applyBatches over N frames") {
    val b1 = Seq((2L, 21.0, "2024-01-01")).toDF("id", "bal", "eff")
    val b2 = Seq((2L, 22.0, "2024-02-01"), (9L, 99.0, "2024-02-15")).toDF("id", "bal", "eff")
    val b3 = Seq((2L, 23.0, "2024-03-01")).toDF("id", "bal", "eff")
    val viaSeq = Scd.applyBatches(target, Seq(b1, b2, b3), "id",
      carryCols = Seq("name"), trackCols = Seq("bal"),
      effDateCol = "eff", initDate = "2020-01-01")
    val tagged = Seq(
      (2L, 21.0, "2024-01-01", 0), (2L, 22.0, "2024-02-01", 1),
      (9L, 99.0, "2024-02-15", 1), (2L, 23.0, "2024-03-01", 2))
      .toDF("id", "bal", "eff", "batch")
    val viaTag = Scd.applyTaggedBatches(target, tagged, "id",
      carryCols = Seq("name"), trackCols = Seq("bal"),
      effDateCol = "eff", batchCol = "batch", initDate = "2020-01-01")
    assert(viaTag.except(viaSeq).count() == 0 &&
      viaSeq.except(viaTag).count() == 0)
  }

  test("applyBatches resolves same-(key, eff) restatements to the latest batch") {
    val b1 = Seq((2L, 21.0, "2024-01-01")).toDF("id", "bal", "eff")
    val b2 = Seq((2L, 99.0, "2024-01-01")).toDF("id", "bal", "eff")
    val out = Scd.applyBatches(target, Seq(b1, b2), "id",
      carryCols = Seq("name"), trackCols = Seq("bal"),
      effDateCol = "eff", initDate = "2020-01-01")
      .filter(col("id") === 2L).orderBy("valid_from").collect()
    assert(out.length == 2, s"same-eff restatement fanned out: ${out.length} rows")
    assert(out.last.getAs[Double]("bal") == 99.0) // later batch wins
  }

  test("applyBatches chains with ONE shuffle: dedupe and LEAD windows share the exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val b1 = Seq((2L, 21.0, "2024-01-01")).toDF("id", "bal", "eff")
    val b2 = Seq((2L, 22.0, "2024-02-01")).toDF("id", "bal", "eff")
    val plan = Scd.applyBatches(target, Seq(b1, b2), "id",
      carryCols = Seq("name"), trackCols = Seq("bal"),
      effDateCol = "eff", initDate = "2020-01-01")
      .queryExecution.executedPlan
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    // carry join broadcasts (delta-sized updates); the two window passes
    // must share one key-partitioned exchange — a second shuffle means
    // the sort-prefix reuse regressed
    assert(shuffles.size <= 1,
      s"applyBatches gained shuffles (${shuffles.size}):\n$plan")
  }

  test("duplicate keys in the change set resolve latest-wins, no fan-out") {
    val dupUpdates = Seq(
      (2L, 22.0, "2024-03-01"),
      (2L, 25.0, "2024-06-01"), // latest eff date wins
      (2L, 23.0, "2024-05-01")
    ).toDF("id", "bal", "eff")
    val out = Scd.scd2(target, dupUpdates, "id",
      carryCols = Seq("name"), trackCols = Seq("bal"),
      effDateCol = "eff", initDate = "2020-01-01")
      .filter(col("id") === 2L).orderBy("valid_from").collect()
    assert(out.length == 2, s"fan-out: ${out.length} rows for one key")
    val Array(old, fresh) = out
    assert(old.getAs[String]("valid_to") == "2024-06-01")
    assert(fresh.getAs[Double]("bal") == 25.0 &&
      fresh.getAs[String]("valid_from") == "2024-06-01" &&
      fresh.getAs[Boolean]("is_current"))
  }
}
