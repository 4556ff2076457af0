package graft

import graft.operators.Merge
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "name", "bal")

  test("mergeInto applies update, delete, insert, and carry in one pass") {
    val source = Seq(
      (2L, "b2", 25.0, false), // update
      (3L, "c", 30.0, true),   // delete
      (9L, "z", 90.0, false)   // insert
    ).toDF("k", "name", "bal", "is_delete")
    val out = Merge.mergeInto(target, source, "k",
      Seq("name", "bal"), col("s.is_delete"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq(
      (1L, "a", 10.0),  // untouched
      (2L, "b2", 25.0), // updated
      (4L, "d", 40.0),  // untouched
      (9L, "z", 90.0))) // inserted; 3 deleted
  }

  test("mergeInto treats a null delete flag as no-delete") {
    val source = Seq(
      (1L, "a1", 11.0, None: Option[Boolean]),
      (4L, "d", 40.0, Some(true))
    ).toDF("k", "name", "bal", "is_delete")
    val out = Merge.mergeInto(target, source, "k",
      Seq("name", "bal"), col("s.is_delete"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "a1", 11.0), (2L, "b", 20.0), (3L, "c", 30.0)))
  }

  test("mergeInto never deletes a source-only row (insert wins)") {
    val source = Seq((9L, "z", 90.0, true)).toDF("k", "name", "bal", "is_delete")
    val out = Merge.mergeInto(target, source, "k",
      Seq("name", "bal"), col("s.is_delete"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 4L, 9L))
  }
}
