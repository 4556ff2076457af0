package graft

import java.sql.Timestamp
import scala.util.Random
import graft.operators.TimeSeries

/** Randomized invariants for the time-series operators: the distributed
  * union+window as-of join must agree row-for-row with a brute-force
  * per-left-row scan, and sessionization must agree with a sequential
  * single-machine fold. Seeded RNG keeps failures reproducible.
  */
case class TsEv(event_id: Long, ts: Timestamp, user_id: Long,
    side: String, value: Double)

class TimeSeriesProperties extends SparkSpec {
  import spark.implicits._

  private val rng = new Random(20260812L)
  private val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime

  private val evs: Seq[TsEv] = (1L to 400L).map { i =>
    TsEv(i,
      // coarse steps force plenty of exact-timestamp ties across rows
      new Timestamp(base + rng.nextInt(120) * 60000L),
      rng.nextInt(8).toLong,
      if (rng.nextBoolean()) "L" else "R",
      rng.nextInt(100).toDouble)
  }

  test("asofJoin agrees with a brute-force reference on random data") {
    val df = evs.toDF()
    val got = TimeSeries.asofJoin(
      df.filter($"side" === "L"), df.filter($"side" === "R"),
      key = "user_id", ts = "ts", tieBreak = "event_id",
      leftCols = Seq("event_id"), rightCols = Seq("event_id"))
      .select("event_id", "asof_event_id")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    val rights = evs.filter(_.side == "R")
    val expected = evs.filter(_.side == "L").map { l =>
      val candidates = rights.filter(r =>
        r.user_id == l.user_id && !r.ts.after(l.ts))
      l.event_id -> (if (candidates.isEmpty) None
      else Some(candidates.maxBy(r => (r.ts.getTime, r.event_id)).event_id))
    }.toMap

    assert(got === expected)
  }

  test("sessionize agrees with a sequential fold on random data") {
    val gap = 600L // 10 min; event steps are minutes so boundaries get hit
    val got = TimeSeries.sessionize(evs.toDF(), "user_id", "ts",
      "event_id", gap)
      .select("event_id", "session_seq")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val expected = evs.groupBy(_.user_id).flatMap { case (_, us) =>
      val ordered = us.sortBy(e => (e.ts.getTime, e.event_id))
      var seq = 0L
      var prev: Option[Long] = None
      ordered.map { e =>
        val t = e.ts.getTime
        if (prev.forall(p => t - p > gap * 1000L)) seq += 1
        prev = Some(t)
        e.event_id -> seq
      }
    }

    assert(got === expected.toMap)
  }
}
