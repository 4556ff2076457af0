package graft

import graft.operators.Cdc
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def old = Seq(
    (1L, Option(10.0), "a"),
    (2L, Option(20.0), "b"),
    (3L, Option(30.0), "c"),
    (4L, Option.empty[Double], "d")
  ).toDF("id", "bal", "tag")

  private def neu = Seq(
    (1L, Option(10.0), "a"), // unchanged → omitted
    (2L, Option(25.0), "b"), // bal changed → U
    (4L, Option(40.0), "d"), // null → value is a change → U
    (9L, Option(99.0), "z")  // new key → I
  ).toDF("id", "bal", "tag") // id 3 missing → D

  private def run = Cdc.snapshotDiff(old, neu, "id", Seq("bal", "tag"))
    .orderBy("id").collect()

  test("classifies inserts, deletes, updates; omits unchanged rows") {
    val ops = run.map(r => r.getAs[Long]("id") -> r.getAs[String]("op")).toMap
    assert(ops == Map(2L -> "U", 3L -> "D", 4L -> "U", 9L -> "I"))
  }

  test("carries old/new value pairs with nulls on the absent side") {
    val byId = run.map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(9L).getAs[Any]("old_bal") == null &&
      byId(9L).getAs[Double]("new_bal") == 99.0)
    assert(byId(3L).getAs[Double]("old_bal") == 30.0 &&
      byId(3L).getAs[Any]("new_bal") == null)
    assert(byId(2L).getAs[Double]("old_bal") == 20.0 &&
      byId(2L).getAs[Double]("new_bal") == 25.0)
  }

  test("null-to-value transitions are updates, not noise") {
    val r4 = run.find(_.getAs[Long]("id") == 4L).get
    assert(r4.getAs[String]("op") == "U" &&
      r4.getAs[Any]("old_bal") == null && r4.getAs[Double]("new_bal") == 40.0)
  }
}
