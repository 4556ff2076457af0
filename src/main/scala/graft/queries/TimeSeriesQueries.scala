package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

/** Oracle-checked entries for the time-series operators (as-of join,
  * sessionization) over the `events` fixture. Timestamps cross the
  * engine boundary as integer epoch-micros — exact on both sides, no
  * timestamp-encoding comparison hazards.
  */
object TimeSeriesQueries {
  import Tables._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Each purchase matched to the user's most recent prior view/click
    "ts_asof_join" -> ((s, d) => {
      val ev = events(s, d)
      TimeSeries.asofJoin(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type").isin("view", "click")),
        key = "user_id", ts = "ts", tieBreak = "event_id",
        leftCols = Seq("event_id", "value"),
        rightCols = Seq("event_id", "event_type"))
        .select(
          col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("value"),
          col("asof_event_id"), col("asof_event_type"))
        .orderBy("event_id")
    }),

    // Forward as-of: each purchase matched to the user's NEXT view/click
    // at-or-after — same one-shuffle union+window shape, mirrored frame.
    "ts_asof_forward" -> ((s, d) => {
      val ev = events(s, d)
      TimeSeries.asofJoin(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type").isin("view", "click")),
        key = "user_id", ts = "ts", tieBreak = "event_id",
        leftCols = Seq("event_id", "value"),
        rightCols = Seq("event_id", "event_type"),
        direction = "forward")
        .select(
          col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("value"),
          col("asof_event_id"), col("asof_event_type"))
        .orderBy("event_id")
    }),

    // Resample: downsample the event stream to hourly buckets — one hash
    // aggregation (map-side partials), exact-cents sums.
    "ts_resample" -> ((s, d) =>
      events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("value_cents"))
        .select(col("event_type"), unix_micros(col("bucket")).as("bucket_us"),
          col("n_events"), col("value_cents"))
        .orderBy("event_type", "bucket_us")),

    // NEAREST as-of: each purchase matched to the user's closest
    // view/click in EITHER direction (ties prefer the backward match) —
    // the sensor-alignment join. Both directional candidates ride one
    // shuffle (two sorted window passes over the same exchange); the
    // oracle replays via per-user candidate ranking with the identical
    // (distance, direction, tie-break) order.
    "ts_asof_nearest" -> ((s, d) => {
      val ev = events(s, d)
      TimeSeries.asofJoin(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type").isin("view", "click")),
        key = "user_id", ts = "ts", tieBreak = "event_id",
        leftCols = Seq("event_id", "value"),
        rightCols = Seq("event_id", "ts"),
        direction = "nearest")
        .select(
          col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("value"),
          col("asof_event_id").as("nearest_id"),
          unix_micros(col("asof_ts")).as("nearest_ts_us"))
        .orderBy("event_id")
    }),

    // OHLC candle downsample — the finance-style bucket summary: per
    // (type, hour), the first/last value by (ts, event_id) — the id
    // tie-break makes open/close deterministic even under equal
    // timestamps — plus high/low in exact cents. One shuffle (the
    // window partition = the aggregate key, so the agg reuses the
    // window's exchange), same per-bucket shape at any scale.
    "ts_ohlc" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cents = round(col("value") * 100).cast("long")
      val w = Window.partitionBy(col("event_type"), col("bucket"))
        .orderBy(col("ts"), col("event_id"))
      val wDesc = Window.partitionBy(col("event_type"), col("bucket"))
        .orderBy(col("ts").desc, col("event_id").desc)
      events(s, d)
        .withColumn("bucket", date_trunc("hour", col("ts")))
        .withColumn("cents", cents)
        .withColumn("rn_a", row_number().over(w))
        .withColumn("rn_d", row_number().over(wDesc))
        .groupBy("event_type", "bucket")
        .agg(
          max(when(col("rn_a") === 1, col("cents"))).as("open_cents"),
          max("cents").as("high_cents"),
          min("cents").as("low_cents"),
          max(when(col("rn_d") === 1, col("cents"))).as("close_cents"),
          count(lit(1)).as("n_events"))
        .select(col("event_type"), unix_micros(col("bucket")).as("bucket_us"),
          col("open_cents"), col("high_cents"), col("low_cents"),
          col("close_cents"), col("n_events"))
        .orderBy("event_type", "bucket_us")
    }),

    // Forward fill: carry each user's last purchase value across their
    // subsequent events — last(ignoreNulls) over a streaming frame, the
    // sparse→dense repair for downstream feature joins.
    "ts_fill_forward" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d).filter(col("user_id") < 50)
        .select(col("event_id"), col("user_id"),
          last(when(col("event_type") === "purchase", round(col("value"), 4)),
            ignoreNulls = true).over(w).as("last_purchase_value"))
        .orderBy("event_id")
    }),

    // Bucketed interval join: every event inside a same-user 90-minute
    // campaign window (windows anchored on the deterministic
    // event_id % 101 slice). One equi-shuffle on (user, hour-bucket) +
    // exact containment — never an inequality nested loop.
    "ts_interval_join" -> ((s, d) => {
      val ev = events(s, d)
      val ivals = ev.filter(col("event_id") % 101 === 0).select(
        col("event_id").as("ival_id"), col("user_id"),
        col("ts").as("start_ts"),
        (col("ts") + expr("INTERVAL 90 MINUTES")).as("end_ts"))
      val pts = ev.select(col("event_id"), col("user_id"), col("ts"), col("value"))
      TimeSeries.intervalJoin(
        pts, ivals, "user_id", "ts", "start_ts", "end_ts")
        .select(col("ival_id"), col("event_id"), col("value"))
        .orderBy("ival_id", "event_id")
    }),

    // Calendar-spine gap fill: per-user daily totals densified to every
    // day between the user's first and last active day, missing days
    // forward-filled from the last observed value. Spine generation is
    // a narrow per-key sequence+explode (no cross join with a global
    // calendar), the join is co-partitioned on (user, day), and the
    // fill is one streaming-frame window — the sparse→dense repair
    // before feature extraction, at one shuffle.
    "ts_gapfill" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, d).filter(col("user_id") < 30)
        .groupBy(col("user_id"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("value_cents"))
      val spine = daily.groupBy("user_id")
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          when(col("value_cents").isNotNull, 1).otherwise(0).as("has_data"),
          last(col("value_cents"), ignoreNulls = true).over(w)
            .as("value_cents_filled"))
        .orderBy("user_id", "day")
    }),

    // OVERLAPPING sliding windows (1-hour span every 30 minutes): the
    // assignment is a narrow 2-element explode per event (span/slide
    // windows each row belongs to), then ONE keyed aggregate — the
    // generate-and-group form Spark's window() function plans; no
    // self-join, no per-window scans. The real-time feature-store
    // aggregation in batch form.
    "ts_sliding_counts" -> ((s, d) =>
      events(s, d)
        .select(col("event_type"), col("value"),
          explode(array(
            date_trunc("hour", col("ts")),
            date_trunc("hour", col("ts") - expr("INTERVAL 30 MINUTES"))
              + expr("INTERVAL 30 MINUTES"))).as("win_start"))
        .groupBy("event_type", "win_start")
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("value_cents"))
        .select(col("event_type"), unix_micros(col("win_start")).as("win_us"),
          col("n_events"), col("value_cents"))
        .orderBy("event_type", "win_us")),

    // Last-touch attribution with a 7-day horizon: every purchase
    // credits the user's most recent prior view/click (the as-of join),
    // unless the touch is older than 7 days — then it counts as
    // 'direct'. Rolled up to per-channel conversion counts and exact
    // cents revenue. Same single-shuffle union+window shape as
    // ts_asof_join; the horizon is a narrow post-filter.
    "an_attribution" -> ((s, d) => {
      val ev = events(s, d)
      val joined = TimeSeries.asofJoin(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type").isin("view", "click")),
        key = "user_id", ts = "ts", tieBreak = "event_id",
        leftCols = Seq("event_id", "value"),
        rightCols = Seq("event_type", "ts"))
      joined.select(
          when(col("asof_ts").isNotNull &&
            col("asof_ts") >= col("ts") - expr("INTERVAL 7 DAYS"),
            col("asof_event_type")).otherwise("direct").as("channel"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("cents")).as("revenue_cents"))
        .orderBy("channel")
    }),

    // LINEAR multi-touch attribution — every view/click in the 7 days
    // before a purchase shares its credit equally. Credit is EXACT
    // integers at ppm scale: each touch gets 1000000 div n ppm (the
    // remainder is deterministically dropped — same div on both
    // engines), attributed revenue is cents·ppm micro-cents, and the
    // per-channel rollup sums integers only. Untouched purchases credit
    // 'direct' in full. The windowed purchase×touch join is per-user
    // equi-keyed (at 100 TB bucket it by time like ts_interval_join;
    // per-user touch lists here are bounded).
    "an_attribution_linear" -> ((s, d) => {
      val ev = events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("p_ts"),
          round(col("value") * 100).cast("long").as("cents"))
      val t = ev.filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("event_type").as("channel"),
          col("ts").as("t_ts"))
      val touches = p.join(t, Seq("user_id"))
        .filter(col("t_ts") <= col("p_ts") &&
          col("t_ts") >= col("p_ts") - expr("INTERVAL 7 DAYS"))
        .select("p_id", "cents", "channel")
      val cnt = touches.groupBy("p_id").agg(count(lit(1)).as("n"))
      val credited = touches.groupBy("p_id", "cents", "channel")
        .agg(count(lit(1)).as("k"))
        .join(cnt, "p_id")
        .select(col("p_id"), col("channel"),
          (col("k") * expr("1000000 div n")).as("credit_ppm"),
          (col("cents") * col("k") * expr("1000000 div n")).as("rev_micro"))
      val direct = p
        .join(touches.select("p_id").distinct(), Seq("p_id"), "left_anti")
        .select(col("p_id"), lit("direct").as("channel"),
          lit(1000000L).as("credit_ppm"),
          (col("cents") * 1000000L).as("rev_micro"))
      credited.unionByName(direct)
        .groupBy("channel")
        .agg(countDistinct(col("p_id")).as("n_purchases"),
          sum("credit_ppm").as("credit_ppm_total"),
          sum("rev_micro").as("rev_micro_total"))
        .orderBy("channel")
    }),

    // 30-minute-gap sessions per user, rolled up to per-session stats
    "ts_sessionize" -> ((s, d) => {
      val sess = TimeSeries.sessionize(
        events(s, d), key = "user_id", ts = "ts",
        tieBreak = "event_id", gapSeconds = 1800L)
      TimeSeries.sessionStats(sess, "user_id", "ts", "value")
        .select(
          col("user_id"), col("session_seq"), col("n_events"),
          unix_micros(col("session_start")).as("start_us"),
          unix_micros(col("session_end")).as("end_us"),
          col("session_value"))
        .orderBy("user_id", "session_seq")
    })
  )

  def oracleSql: Map[String, String] = Map(
    // plain inequality join — correct at oracle scale; the engine's
    // bucketed plan must reproduce it exactly
    "ts_interval_join" ->
      ("WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t, value FROM events), " +
        "iv AS (SELECT event_id AS ival_id, user_id, epoch_us(ts) AS s_us, " +
        "epoch_us(ts) + 5400000000 AS e_us FROM events WHERE event_id % 101 = 0) " +
        "SELECT iv.ival_id, e.event_id, e.value " +
        "FROM e JOIN iv ON e.user_id = iv.user_id AND e.t >= iv.s_us AND e.t <= iv.e_us " +
        "ORDER BY ival_id, event_id"),
    "ts_asof_join" ->
      ("""WITH tagged AS (
        |  SELECT user_id, ts, event_id AS tie, 1 AS side,
        |    CAST(NULL AS BIGINT) AS r_event_id, CAST(NULL AS VARCHAR) AS r_event_type,
        |    event_id, value
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, ts, event_id, 0, event_id, event_type,
        |    CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
        |  FROM events WHERE event_type IN ('view', 'click')
        |), w AS (
        |  SELECT *,
        |    last_value(r_event_id IGNORE NULLS) OVER win AS asof_event_id,
        |    last_value(r_event_type IGNORE NULLS) OVER win AS asof_event_type
        |  FROM tagged
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, side, tie
        |    ROWS UNBOUNDED PRECEDING)
        |)
        |SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
        |  asof_event_id, asof_event_type
        |FROM w WHERE side = 1 ORDER BY event_id""".stripMargin),
    "ts_asof_forward" ->
      ("""WITH tagged AS (
        |  SELECT user_id, ts, event_id AS tie, 1 AS side,
        |    CAST(NULL AS BIGINT) AS r_event_id, CAST(NULL AS VARCHAR) AS r_event_type,
        |    event_id, value
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, ts, event_id, 0, event_id, event_type,
        |    CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
        |  FROM events WHERE event_type IN ('view', 'click')
        |), w AS (
        |  SELECT *,
        |    first_value(r_event_id IGNORE NULLS) OVER win AS asof_event_id,
        |    first_value(r_event_type IGNORE NULLS) OVER win AS asof_event_type
        |  FROM tagged
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, side DESC, tie
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |)
        |SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
        |  asof_event_id, asof_event_type
        |FROM w WHERE side = 1 ORDER BY event_id""".stripMargin),
    // candidate ranking replays the engine's exact choice: distance
    // first, backward (fwd=0) on equal distance, then the directional
    // tie-break (backward: max id; forward: min id)
    "ts_asof_nearest" ->
      ("WITH p AS (SELECT user_id, ts, event_id, value FROM events " +
        "WHERE event_type = 'purchase'), " +
        "o AS (SELECT user_id, ts, event_id FROM events " +
        "WHERE event_type IN ('view', 'click')), " +
        "cand AS (SELECT p.event_id, p.user_id, p.ts, p.value, " +
        "o.event_id AS o_id, o.ts AS o_ts, " +
        "abs(epoch_us(p.ts) - epoch_us(o.ts)) AS dist, " +
        "CASE WHEN o.ts <= p.ts THEN 0 ELSE 1 END AS fwd " +
        "FROM p JOIN o ON p.user_id = o.user_id), " +
        "ranked AS (SELECT *, row_number() OVER (PARTITION BY event_id " +
        "ORDER BY dist, fwd, CASE WHEN fwd = 0 THEN -o_id ELSE o_id END) AS rn " +
        "FROM cand) " +
        "SELECT p.user_id, epoch_us(p.ts) AS ts_us, p.event_id, p.value, " +
        "r.o_id AS nearest_id, epoch_us(r.o_ts) AS nearest_ts_us " +
        "FROM p LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r " +
        "ON p.event_id = r.event_id ORDER BY p.event_id"),
    "ts_ohlc" ->
      ("WITH b AS (SELECT event_type, date_trunc('hour', ts) AS bucket, " +
        "CAST(round(value * 100) AS BIGINT) AS cents, " +
        "row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts) " +
        "ORDER BY ts, event_id) AS rn_a, " +
        "row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts) " +
        "ORDER BY ts DESC, event_id DESC) AS rn_d FROM events) " +
        "SELECT event_type, epoch_us(bucket) AS bucket_us, " +
        "CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents, " +
        "CAST(max(cents) AS BIGINT) AS high_cents, " +
        "CAST(min(cents) AS BIGINT) AS low_cents, " +
        "CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents, " +
        "count(*) AS n_events " +
        "FROM b GROUP BY 1, 2 ORDER BY event_type, bucket_us"),
    "ts_resample" ->
      ("SELECT event_type, epoch_us(date_trunc('hour', ts)) AS bucket_us, " +
        "count(*) AS n_events, " +
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents " +
        "FROM events GROUP BY event_type, date_trunc('hour', ts) " +
        "ORDER BY event_type, bucket_us"),
    // generate_series is inclusive on both ends, like Spark's sequence;
    // day crosses the engines as a yyyy-MM-dd string (DATE renders
    // differently in pandas)
    "ts_gapfill" ->
      ("WITH daily AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, " +
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents " +
        "FROM events WHERE user_id < 30 GROUP BY 1, 2), " +
        "bounds AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1), " +
        "spine AS (SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds), " +
        "j AS (SELECT s.user_id, CAST(s.day AS DATE) AS day, d.value_cents " +
        "FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND CAST(s.day AS DATE) = d.day) " +
        "SELECT user_id, strftime(day, '%Y-%m-%d') AS day, " +
        "CAST(CASE WHEN value_cents IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS has_data, " +
        "CAST(last_value(value_cents IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day " +
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS value_cents_filled " +
        "FROM j ORDER BY user_id, day"),
    // both containing window-starts per event, unioned then grouped —
    // the same generate-and-group plan
    "ts_sliding_counts" ->
      ("WITH a AS (SELECT event_type, value, date_trunc('hour', ts) AS win FROM events " +
        "UNION ALL SELECT event_type, value, " +
        "date_trunc('hour', ts - INTERVAL 30 MINUTE) + INTERVAL 30 MINUTE FROM events) " +
        "SELECT event_type, epoch_us(win) AS win_us, count(*) AS n_events, " +
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents " +
        "FROM a GROUP BY 1, 2 ORDER BY event_type, win_us"),
    // the as-of carry window from ts_asof_join, plus the 7-day horizon
    // and the per-channel rollup
    "an_attribution" ->
      ("""WITH tagged AS (
        |  SELECT user_id, ts, event_id AS tie, 1 AS side,
        |    CAST(NULL AS VARCHAR) AS r_event_type, CAST(NULL AS TIMESTAMP) AS r_ts,
        |    value
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, ts, event_id, 0, event_type, ts,
        |    CAST(NULL AS DOUBLE)
        |  FROM events WHERE event_type IN ('view', 'click')
        |), w AS (
        |  SELECT *,
        |    last_value(r_event_type IGNORE NULLS) OVER win AS asof_event_type,
        |    last_value(r_ts IGNORE NULLS) OVER win AS asof_ts
        |  FROM tagged
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, side, tie
        |    ROWS UNBOUNDED PRECEDING)
        |)
        |SELECT CASE WHEN asof_ts IS NOT NULL AND asof_ts >= ts - INTERVAL 7 DAY
        |         THEN asof_event_type ELSE 'direct' END AS channel,
        |  count(*) AS n_purchases,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM w WHERE side = 1 GROUP BY 1 ORDER BY channel""".stripMargin),
    // identical integer ppm credit math; // = Spark's div on positives
    "an_attribution_linear" ->
      ("WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts, " +
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events " +
        "WHERE event_type = 'purchase'), " +
        "t AS (SELECT user_id, event_type AS channel, ts AS t_ts FROM events " +
        "WHERE event_type IN ('view', 'click')), " +
        "tc AS (SELECT p.p_id, p.cents, t.channel FROM p JOIN t " +
        "ON p.user_id = t.user_id AND t.t_ts <= p.p_ts " +
        "AND t.t_ts >= p.p_ts - INTERVAL 7 DAY), " +
        "cnt AS (SELECT p_id, count(*) AS n FROM tc GROUP BY 1), " +
        "pc AS (SELECT p_id, cents, channel, count(*) AS k FROM tc GROUP BY 1, 2, 3), " +
        "cr AS (SELECT pc.p_id, pc.channel, k * (1000000 // n) AS credit_ppm, " +
        "cents * k * (1000000 // n) AS rev_micro FROM pc JOIN cnt USING (p_id)), " +
        "dir AS (SELECT p_id, 'direct' AS channel, 1000000 AS credit_ppm, " +
        "cents * 1000000 AS rev_micro FROM p " +
        "WHERE p_id NOT IN (SELECT p_id FROM tc)), " +
        "allc AS (SELECT * FROM cr UNION ALL SELECT * FROM dir) " +
        "SELECT channel, count(DISTINCT p_id) AS n_purchases, " +
        "CAST(sum(credit_ppm) AS BIGINT) AS credit_ppm_total, " +
        "CAST(sum(rev_micro) AS BIGINT) AS rev_micro_total " +
        "FROM allc GROUP BY channel ORDER BY channel"),
    "ts_fill_forward" ->
      ("SELECT event_id, user_id, " +
        "last_value(CASE WHEN event_type = 'purchase' THEN round(value, 4) END IGNORE NULLS) " +
        "OVER (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS last_purchase_value " +
        "FROM events WHERE user_id < 50 ORDER BY event_id"),
    "ts_sessionize" ->
      ("""WITH g AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM g
        |)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  count(*) AS n_events,
        |  epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
        |  round(sum(value), 2) AS session_value
        |FROM s GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin)
  )
}
