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
