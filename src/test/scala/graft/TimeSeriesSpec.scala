package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  private val evs = Seq(
    // (event_id, ts, user_id, event_type, value)
    (1L, t("2024-01-01 10:00:00"), 1L, "view", 1.0),
    (2L, t("2024-01-01 10:05:00"), 1L, "purchase", 10.0),
    (3L, t("2024-01-01 10:05:00"), 1L, "click", 2.0), // tie with purchase ts
    (4L, t("2024-01-01 10:06:00"), 1L, "purchase", 20.0),
    (5L, t("2024-01-01 09:00:00"), 2L, "purchase", 30.0), // no prior event
    (6L, t("2024-01-01 12:00:00"), 2L, "view", 3.0),
    (7L, t("2024-01-01 12:30:00"), 2L, "purchase", 40.0)
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("asofJoin picks most recent right row at-or-before each left ts") {
    val out = TimeSeries.asofJoin(
      evs.filter($"event_type" === "purchase"),
      evs.filter($"event_type".isin("view", "click")),
      key = "user_id", ts = "ts", tieBreak = "event_id",
      leftCols = Seq("event_id", "value"),
      rightCols = Seq("event_id", "event_type"))
      .orderBy("event_id")
      .select("event_id", "asof_event_id", "asof_event_type")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2)))
    // purchase 2 @10:05: click 3 shares the ts and is included (<=), and
    // beats view 1; purchase 4 sees click 3; purchase 5 has no match;
    // purchase 7 sees view 6.
    assert(out.toSeq === Seq(
      (2L, 3L, "click"), (4L, 3L, "click"), (5L, -1L, null), (7L, 6L, "view")))
  }

  test("asofJoin forward picks earliest right row at-or-after each left ts") {
    val out = TimeSeries.asofJoin(
      evs.filter($"event_type" === "purchase"),
      evs.filter($"event_type".isin("view", "click")),
      key = "user_id", ts = "ts", tieBreak = "event_id",
      leftCols = Seq("event_id", "value"),
      rightCols = Seq("event_id", "event_type"),
      direction = "forward")
      .orderBy("event_id")
      .select("event_id", "asof_event_id", "asof_event_type")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2)))
    // purchase 2 @10:05: click 3 shares the ts and is included (>=);
    // purchase 4 @10:06 has nothing after; purchase 5 @09:00 sees view 6;
    // purchase 7 @12:30 has nothing after.
    assert(out.toSeq === Seq(
      (2L, 3L, "click"), (4L, -1L, null), (5L, 6L, "view"), (7L, -1L, null)))
  }

  test("asofJoin nearest picks the closer side; equal distance prefers backward") {
    val out = TimeSeries.asofJoin(
      evs.filter($"event_type" === "purchase"),
      evs.filter($"event_type".isin("view", "click")),
      key = "user_id", ts = "ts", tieBreak = "event_id",
      leftCols = Seq("event_id", "value"),
      rightCols = Seq("event_id", "event_type"),
      direction = "nearest")
      .orderBy("event_id")
      .select("event_id", "asof_event_id", "asof_event_type")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2)))
    // purchase 2 @10:05: click 3 at distance 0 (both directions see it;
    // backward preferred); purchase 4 @10:06: click 3 one minute back
    // beats nothing ahead; purchase 5 @09:00: only view 6 ahead —
    // forward fills when backward is null; purchase 7 @12:30: view 6
    // thirty minutes back.
    assert(out.toSeq === Seq(
      (2L, 3L, "click"), (4L, 3L, "click"), (5L, 6L, "view"), (7L, 6L, "view")))
  }

  test("asofJoin nearest equal-distance tie prefers the backward match") {
    // right rows exactly 1 minute before AND after the left row
    val left = Seq((10L, t("2024-01-01 10:01:00"), 1L, 5.0))
      .toDF("event_id", "ts", "user_id", "value")
    val right = Seq(
      (20L, t("2024-01-01 10:00:00"), 1L, "before"),
      (21L, t("2024-01-01 10:02:00"), 1L, "after"))
      .toDF("event_id", "ts", "user_id", "tag")
    val m = TimeSeries.asofJoin(left, right,
      key = "user_id", ts = "ts", tieBreak = "event_id",
      leftCols = Seq("event_id"), rightCols = Seq("event_id", "tag"),
      direction = "nearest")
      .select("asof_event_id", "asof_tag").collect().head
    assert((m.getLong(0), m.getString(1)) == ((20L, "before")))
  }

  test("sessionize splits on gaps strictly greater than the threshold") {
    val sess = TimeSeries.sessionize(
      evs.filter($"user_id" === 2L), key = "user_id", ts = "ts",
      tieBreak = "event_id", gapSeconds = 1800L)
      .orderBy("event_id")
      .select("event_id", "session_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // 09:00 → session 1; 12:00 is a 3h gap → session 2; 12:30 is exactly
    // the 1800 s threshold → NOT a new session (strict >)
    assert(sess.toSeq === Seq((5L, 1L), (6L, 2L), (7L, 2L)))
  }

  test("sessionStats aggregates bounds and values per session") {
    val sess = TimeSeries.sessionize(evs, "user_id", "ts", "event_id", 1800L)
    val stats = TimeSeries.sessionStats(sess, "user_id", "ts", "value")
      .filter($"user_id" === 1L).orderBy("session_seq")
      .collect()
    assert(stats.length === 1) // all user-1 events within 30 min of peers
    val r = stats.head
    assert(r.getAs[Long]("n_events") === 4L)
    assert(r.getAs[Double]("session_value") === 33.0)
  }
}
