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

  // --- applyVersioned: the confluent CDC merge --------------------------

  private val state0 = Seq(
    (1L, "a", 0, "U"), (2L, "b", 0, "U"), (3L, "c", 0, "U")
  ).toDF("k", "v", "version", "op")
  private val batchA = Seq(
    (1L, "a1", 1, "U"), (2L, "b-del", 1, "D"), (4L, "d", 1, "U")
  ).toDF("k", "v", "version", "op")
  private val batchB = Seq(
    (1L, "a2", 2, "U"), (4L, "d-del", 2, "D")
  ).toDF("k", "v", "version", "op")

  private def snap(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("k").as[(Long, String, Int, String)].collect().toSeq

  test("applyVersioned is confluent: one batch ≡ two batches ≡ reversed order") {
    val oneShot = Merge.applyVersioned(
      state0, batchA.unionByName(batchB), "k", "version", "op")
    val sequential = Merge.applyVersioned(
      Merge.applyVersioned(state0, batchA, "k", "version", "op"),
      batchB, "k", "version", "op")
    val reversed = Merge.applyVersioned(
      Merge.applyVersioned(state0, batchB, "k", "version", "op"),
      batchA, "k", "version", "op")
    // re-delivery: applying batchA again after everything changes nothing
    val redelivered = Merge.applyVersioned(
      sequential, batchA, "k", "version", "op")
    val expected = snap(oneShot)
    assert(snap(sequential) == expected)
    assert(snap(reversed) == expected)
    assert(snap(redelivered) == expected)
    // tombstones stay in state (k=2 v1 D, k=4 v2 D shadow lower versions)
    assert(expected == Seq(
      (1L, "a2", 2, "U"), (2L, "b-del", 1, "D"),
      (3L, "c", 0, "U"), (4L, "d-del", 2, "D")))
  }

  test("a tombstone blocks a late lower-version update from resurrecting") {
    val s1 = Merge.applyVersioned(state0, batchB, "k", "version", "op")
    // k=4 was deleted at v2; a late v1 insert for k=4 must NOT win
    val late = Seq((4L, "d-late", 1, "U")).toDF("k", "v", "version", "op")
    val s2 = Merge.applyVersioned(s1, late, "k", "version", "op")
    val k4 = snap(s2).filter(_._1 == 4L)
    assert(k4 == Seq((4L, "d-del", 2, "D")))
  }
}
