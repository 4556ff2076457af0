package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators the reference's engine family ships but Spark SQL
  * lacks as built-ins: as-of join and gap sessionization. Both are
  * expressed as one hash-partition on the entity key plus a linear
  * within-partition window pass — never a range self-join, whose
  * within-key quadratic blowup is exactly what dies first at 100 TB.
  * Skewed keys (one user with millions of events) are the remaining
  * hazard; both operators keep per-row state O(1) so a hot key costs one
  * task's linear scan, not memory.
  */
object TimeSeries {

  /** As-of join: for each left row, the most recent right row of the same
    * key with `right.ts <= left.ts` (ties included; deterministic via the
    * `tieBreak` column — among equal timestamps the highest tie-break
    * wins).
    *
    * Implementation: tag and union the two sides (cheap, narrow), then one
    * running `last(..., ignoreNulls)` window per key ordered by
    * (ts, side, tieBreak) with right rows sorting before left rows at
    * equal timestamps. One shuffle on `key`, one sort, zero row
    * amplification — the classic distributed as-of shape.
    *
    * Right columns are carried through the window as one struct; pass the
    * columns the caller needs in `rightCols` so everything rides a single
    * window expression.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, tieBreak: String,
      leftCols: Seq[String], rightCols: Seq[String],
      direction: String = "backward"): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"unknown as-of direction: $direction")
    // nearest mode also carries the right TIMESTAMP so the two candidate
    // matches can be distance-compared after the windows
    val carried =
      if (direction == "nearest")
        struct((col(ts).as("__cts") +: rightCols.map(col)): _*)
      else struct(rightCols.map(col): _*)
    val l = left.select(
      (Seq(col(key), col(ts), col(tieBreak).as("__tie"), lit(1).as("__side"),
        lit(null).cast(
          right.select(carried).schema.head.dataType).as("__carry")) ++
        leftCols.map(col)): _*)
    val r = right.select(
      (Seq(col(key), col(ts), col(tieBreak).as("__tie"), lit(0).as("__side"),
        carried.as("__carry")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    // backward: most recent right at-or-before (ties included — right
    // sorts before left at equal ts; highest tie-break wins via last()).
    // forward: earliest right at-or-after (ties included — left sorts
    // before right at equal ts; lowest tie-break wins via first()).
    val base = Window.partitionBy(key)
    val wB = base.orderBy(col(ts).asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = base.orderBy(col(ts).asc, col("__side").desc, col("__tie").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val unioned = l.unionByName(r)
    val matched = direction match {
      case "backward" =>
        unioned.withColumn("__match",
          last(col("__carry"), ignoreNulls = true).over(wB))
      case "forward" =>
        unioned.withColumn("__match",
          first(col("__carry"), ignoreNulls = true).over(wF))
      case _ =>
        // nearest: both directional matches ride the SAME exchange (two
        // sorts, one shuffle), then the closer one wins; equal distance
        // prefers the backward match
        val b = last(col("__carry"), ignoreNulls = true).over(wB)
        val f = first(col("__carry"), ignoreNulls = true).over(wF)
        unioned.withColumn("__mb", b).withColumn("__mf", f)
          .withColumn("__match",
            when(col("__mf").isNull, col("__mb"))
              .when(col("__mb").isNull, col("__mf"))
              .when(unix_micros(col(ts)) - unix_micros(col("__mb.__cts")) <=
                unix_micros(col("__mf.__cts")) - unix_micros(col(ts)),
                col("__mb"))
              .otherwise(col("__mf")))
    }
    matched
      .filter(col("__side") === 1)
      .select((Seq(col(key), col(ts)) ++ leftCols.map(col) ++
        rightCols.map(c => col(s"__match.$c").as(s"asof_$c"))): _*)
  }

  /** Gap sessionization: a new session starts when the gap to the previous
    * event of the same key exceeds `gapSeconds`. Session ids are
    * (key, session_seq) with session_seq a running sum of session-start
    * flags — one shuffle on `key`, two linear window passes.
    */
  def sessionize(events: DataFrame, key: String, ts: String,
      tieBreak: String, gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(key).orderBy(col(ts).asc, col(tieBreak).asc)
    // gap math in integer epoch-micros: second-truncated unix_timestamp
    // would mis-classify gaps that straddle the threshold by <1s
    val gap = unix_micros(col(ts)) -
      unix_micros(lag(col(ts), 1).over(order))
    val isNew = when(gap.isNull || gap > gapSeconds * 1000000L, 1).otherwise(0)
    events
      .withColumn("__new", isNew)
      .withColumn("session_seq",
        sum(col("__new")).over(
          order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** Per-session rollup on top of [[sessionize]]: bounds, size, value sum.
    * The groupBy reuses the sessionize partitioning key prefix, so AQE
    * plans it without a second full shuffle of the raw events. */
  def sessionStats(sessions: DataFrame, key: String, ts: String,
      valueCol: String): DataFrame =
    sessions.groupBy(col(key), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        round(sum(col(valueCol)), 2).as("session_value"))

  /** Bucketed interval join: match each point row to every same-key
    * interval CONTAINING its timestamp (`start <= ts <= end`).
    *
    * The naive formulation — an inequality join — plans as a (broadcast)
    * nested loop: O(points × intervals) per key, the first thing that
    * dies at 100 TB. Here both sides map onto fixed time buckets: a
    * point belongs to exactly ONE bucket (so no output dedup is needed),
    * an interval EXPLODES into the buckets it covers (row amplification
    * = span/bucket, bounded by construction when callers pick a bucket
    * near the typical interval length), and candidates meet in ONE
    * equi-shuffle on (key, bucket) before the exact containment filter.
    * All comparisons are integer epoch-micros — exact, portable, and the
    * same convention the as-of oracle replays. Hot (key, bucket) pairs
    * are the residual hazard; salt the key upstream as with any skewed
    * equi-join.
    *
    * `maxSpanBuckets` fails fast on runaway intervals: ONE open-ended
    * sentinel row (`end = 9999-12-31`) would otherwise materialize a
    * ~70M-element bucket array for that row — hundreds of MB before the
    * explode, an executor OOM with no useful error. A per-row guard
    * raises a diagnostic naming the bad span instead; widen the limit
    * (or pre-clamp sentinel ends) deliberately, not by accident. */
  def intervalJoin(
      points: DataFrame, intervals: DataFrame,
      key: String, tsCol: String, startCol: String, endCol: String,
      bucketSecs: Long = 3600, maxSpanBuckets: Long = 1000000L): DataFrame = {
    require(bucketSecs > 0, "bucketSecs must be positive")
    require(maxSpanBuckets > 0, "maxSpanBuckets must be positive")
    val bucketUs = bucketSecs * 1000000L
    val pb = points
      .withColumn("__t", unix_micros(col(tsCol)))
      .withColumn("__bkt", expr(s"__t div ${bucketUs}L"))
    val span = expr(s"unix_micros(`$endCol`) div ${bucketUs}L - " +
      s"unix_micros(`$startCol`) div ${bucketUs}L")
    val spanError = raise_error(concat(
      lit(s"intervalJoin: interval spans more than $maxSpanBuckets " +
        s"buckets of ${bucketSecs}s (start="), col(startCol).cast("string"),
      lit(", end="), col(endCol).cast("string"),
      lit(") — clamp sentinel end timestamps or raise maxSpanBuckets")))
    val ib = intervals
      .withColumn("__s", unix_micros(col(startCol)))
      .withColumn("__e",
        when(span > maxSpanBuckets, spanError.cast("long"))
          .otherwise(unix_micros(col(endCol))))
      .withColumn("__bkt",
        explode(sequence(expr(s"__s div ${bucketUs}L"), expr(s"__e div ${bucketUs}L"))))
    pb.join(ib, Seq(key, "__bkt"))
      .filter(col("__t") >= col("__s") && col("__t") <= col("__e"))
      .drop("__bkt", "__t", "__s", "__e")
  }
}
