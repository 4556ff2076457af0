package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational breadth a complete engine's users reach for beyond the
  * reference's own surface: semi/anti joins (existence filters without
  * row duplication), ROLLUP grouping sets (one-pass subtotal hierarchies),
  * pivot (conditional-aggregation histograms) and grouped exact
  * percentiles. All single-shuffle shapes; semi/anti keep the build side
  * as a broadcast when small.
  */
object Extended {
  import Tables._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Existence filter: customers with ≥1 open order. left_semi carries no
    // right columns and never duplicates left rows — the scalable form of
    // "WHERE EXISTS" (a join+distinct would shuffle and dedup).
    "j3_left_semi" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d).filter(col("o_orderstatus") === "O"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // Negative existence: customers who never placed a high-value order.
    "j4_left_anti" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d).filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // Data-quality gate: declarative constraints in ONE scan (conditional
    // sums + stack unpivot), key-uniqueness, and referential orphans —
    // the pre-training checks a pipeline alerts or aborts on.
    "qa_constraints" -> ((s, d) => {
      val o = orders(s, d)
      val rules = graft.operators.QualityChecks.ruleViolations(o, Seq(
        "orderkey_not_null" -> col("o_orderkey").isNotNull,
        "totalprice_positive" -> (col("o_totalprice") > 0),
        "status_in_domain" -> col("o_orderstatus").isin("O", "F", "P"),
        "priority_prefix_digit" ->
          col("o_orderpriority").rlike("^[1-5]-")))
      val dup = graft.operators.QualityChecks
        .duplicateKeyCount(o, Seq("o_orderkey"))
        .select(lit("orderkey_unique").as("rule"), col("violations"))
      val orphans = graft.operators.QualityChecks
        .orphanCount(o, "o_custkey", customer(s, d), "c_custkey")
        .select(lit("custkey_exists").as("rule"), col("violations"))
      rules.unionByName(dup).unionByName(orphans).orderBy("rule")
    }),

    // Null-safe equi-join (<=>): null keys MATCH each other instead of
    // dropping — the semantics a dimension join needs when "unknown" is
    // itself a category. Spark plans <=> as a hash join (null-safe
    // equality is still an equi-key); the 'P' statuses are nulled on
    // both sides to exercise the null bucket.
    "j7_null_safe_join" -> ((s, d) => {
      val keyed = orders(s, d)
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("P")).as("k"))
      val dim = keyed.groupBy(col("k").as("k2"))
        .agg(count(lit(1)).as("n_status"))
      keyed.join(dim, col("k") <=> col("k2"))
        .select(col("o_orderkey"),
          coalesce(col("k"), lit("<null>")).as("status_key"),
          col("n_status"))
        .orderBy("o_orderkey")
    }),

    // argmax/argmin aggregation (max_by/min_by): which order carries the
    // group's extreme price. Ties are broken by compounding the unique
    // key into the ordering value as exact integers — max_by's tie
    // behavior is otherwise engine-arbitrary and would flake the hash
    // gate. One map-side-combined aggregate.
    "a4_minmax_by" -> ((s, d) => {
      val cents = round(col("o_totalprice") * 100).cast("long")
      orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"), cents.as("cents"),
          (cents * 100000000L + col("o_orderkey")).as("ord"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          expr("max_by(o_orderkey, ord)").as("top_order"),
          expr("min_by(o_orderkey, ord)").as("bottom_order"),
          max(col("cents")).as("max_cents"),
          min(col("cents")).as("min_cents"))
        .orderBy("o_orderpriority")
    }),

    // Row-level expectation routing: each document carries the list of
    // expectations it fails (declaration order), and the quarantine
    // stream is the non-empty-list filter — ONE narrow projection over
    // the scan, no shuffle, no per-rule pass. The valid/quarantine split
    // is two filters over the same stage, so a pipeline writing both
    // sinks shares the scan. The aggregate rule-count view of the same
    // gate is qa_constraints; this is the row-routing half of the
    // expectations pattern.
    "qa_expectations" -> ((s, d) => {
      val rules = Seq(
        "lang_known" -> col("lang").isin("en", "de", "fr"),
        "min_length" -> (col("n_chars") >= 200),
        "has_space" -> col("text").contains(" "))
      graft.operators.QualityChecks
        .quarantine(documents(s, d), rules)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          concat_ws(",", col("failed_rules")).as("failed"))
        .orderBy("doc_id")
    }),

    // Bucketed co-located join as a CORRECTNESS row: both sides written
    // bucketed+sorted on the join key, so the sort-merge join elides BOTH
    // exchanges and sorts (BucketingSpec pins that plan) — here the
    // RESULT equality vs a plain join is what the oracle hashes.
    "j6_bucketed_join" -> ((s, d) => {
      val hadoopConf = s.sparkContext.hadoopConfiguration
      Seq("graft_bkt_orders", "graft_bkt_customer").foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS $t")
        val p = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), t)
        p.getFileSystem(hadoopConf).delete(p, true)
      }
      graft.sources.Bucketing.writeBucketed(
        orders(s, d).filter(col("o_custkey") < 300)
          .select("o_orderkey", "o_custkey", "o_totalprice"),
        "graft_bkt_orders", "o_custkey", buckets = 8)
      graft.sources.Bucketing.writeBucketed(
        customer(s, d).select("c_custkey", "c_name", "c_mktsegment"),
        "graft_bkt_customer", "c_custkey", buckets = 8)
      graft.sources.Bucketing.colocatedJoin(
        s, "graft_bkt_orders", "graft_bkt_customer", "o_custkey", "c_custkey")
        .orderBy("o_orderkey")
    }),

    // Salted skew join as a CORRECTNESS row: the salted form must return
    // EXACTLY the rows of the plain join (the oracle), only the shuffle
    // distribution differs — lineitem⋈supplier with the dimension
    // replicated ×8 across salt buckets.
    "j5_skew_salted" -> ((s, d) =>
      graft.operators.SkewJoin.saltedEquiJoin(
        lineitem(s, d).filter(col("l_orderkey") < 3000)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_suppkey").as("s_suppkey"), col("l_quantity")),
        supplier(s, d).select("s_suppkey", "s_name"),
        key = "s_suppkey", factor = 8)
        .orderBy("l_orderkey", "l_linenumber")),

    // Set intersection — plans as a left-semi over distinct sets, one
    // shuffle per side on the compared columns.
    "o4_intersect" -> ((s, d) => {
      val c = customer(s, d)
      c.filter(col("c_mktsegment") === "BUILDING").select("c_nationkey").distinct()
        .intersect(
          c.filter(col("c_mktsegment") === "MACHINERY").select("c_nationkey").distinct())
        .orderBy("c_nationkey")
    }),

    // Set difference — left-anti over distinct sets.
    "o5_except" -> ((s, d) =>
      customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select("c_nationkey").distinct()
        .except(
          supplier(s, d).filter(col("s_acctbal") > 9000)
            .select(col("s_nationkey").as("c_nationkey")).distinct())
        .orderBy("c_nationkey")),

    // Subtotal hierarchy in ONE aggregation pass over the fact table:
    // (status, priority), (status), () — Spark expands grouping sets
    // before the single shuffle, no per-level rescan.
    "an_rollup_sets" -> ((s, d) =>
      orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
        .orderBy(
          col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    // Language × source histogram as a pivot — compiles to conditional
    // aggregation: one shuffle on the groupBy key, each pivot value one
    // count(CASE WHEN) column. Explicit value list keeps it one pass
    // (value discovery would need a distinct pre-scan).
    "ta_pivot_hist" -> ((s, d) =>
      documents(s, d)
        .groupBy(col("lang"))
        .pivot("source", Seq("src0", "src1", "src2", "src3"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("lang")),

    // Explicit GROUPING SETS (the general form rollup/cube specialize)
    // with grouping_id to disambiguate the null-as-subtotal rows — ONE
    // aggregation pass via grouping-set expansion.
    "an_grouping_sets" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql("""SELECT o_orderstatus, o_orderpriority,
        CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        count(*) AS n_orders
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus))
        ORDER BY o_orderstatus ASC NULLS FIRST,
          o_orderpriority ASC NULLS FIRST, gid""")
    }),

    // ntile + percent_rank: the quantile-bucket windows feature stores
    // use for per-user decile features.
    "w5_ntile_prank" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("event_id")
      events(s, d).filter(col("user_id") < 20)
        .select(col("event_id"), col("event_type"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("prank"))
        .orderBy("event_id")
    }),

    // The remaining ranking/navigation window vocabulary: dense_rank
    // (no rank gaps), cume_dist (an exact small-integer ratio — one
    // correctly-rounded double division, engine-identical), and
    // first/last_value over an explicit running frame. Same single
    // exchange as every w-family query.
    "w7_rank_navigation" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type")
        .orderBy(col("cents"), col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d).filter(col("user_id") < 20)
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .select(col("event_id"), col("event_type"), col("cents"),
          dense_rank().over(w).as("drank"),
          round(cume_dist().over(w), 6).as("cdist"),
          first(col("event_id")).over(run).as("cheapest_id"),
          last(col("event_id")).over(run).as("running_last_id"))
        .orderBy("event_id")
    }),

    // Distribution drift (PSI): compare the order-value distribution
    // before/after a cutover date in fixed price buckets — the population
    // stability index every production pipeline monitors between
    // snapshots. Integer bucket counts ride ONE groupBy; the per-bucket
    // PSI term is computed against broadcast totals and rounded 6dp
    // (ratios are exact rationals; ln differs only in the last ulp
    // across libm implementations).
    "qa_drift" -> ((s, d) => {
      val o = orders(s, d).select(
        when(col("o_orderdate") < lit("1998-01-01").cast("timestamp"), "base")
          .otherwise("cur").as("half"),
        floor(col("o_totalprice") / 50000).cast("long").as("bucket"))
      val counts = o.groupBy("bucket").agg(
        sum(when(col("half") === "base", 1L).otherwise(0L)).as("n_base"),
        sum(when(col("half") === "cur", 1L).otherwise(0L)).as("n_cur"))
      val totals = counts.agg(
        sum("n_base").cast("double").as("t_base"),
        sum("n_cur").cast("double").as("t_cur"))
      counts.crossJoin(broadcast(totals))
        .withColumn("psi_term",
          when(col("n_base") > 0 && col("n_cur") > 0,
            round((col("n_cur") / col("t_cur") - col("n_base") / col("t_base")) *
              log((col("n_cur") / col("t_cur")) / (col("n_base") / col("t_base"))), 6)))
        .select("bucket", "n_base", "n_cur", "psi_term")
        .orderBy("bucket")
    }),

    // PSI on QUANTILE buckets — how production monitors actually bucket:
    // edges are the base period's deciles, so every base bucket holds
    // ~10% and the PSI measures reshaping, not where fixed $50k lines
    // happen to fall. The decile edges come from the same bounded
    // percentile_approx sketch as an_group_percentile_approx (accuracy
    // 1e6 ⇒ the sketch provably returns the element at rank ceil(q·n),
    // which the oracle replays with an explicit row_number — the check
    // stays tolerance-free). The 9-edge array is a driver-side scalar
    // broadcast; bucketing is a narrow fold over it per row.
    "qa_drift_quantile" -> ((s, d) => {
      val o = orders(s, d).select(
        when(col("o_orderdate") < lit("1998-01-01").cast("timestamp"), "base")
          .otherwise("cur").as("half"),
        col("o_totalprice").as("price"))
      val edges = o.filter(col("half") === "base")
        .agg(expr("percentile_approx(price, " +
          "array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D), 1000000)")
          .as("es"))
      val bucketed = o.crossJoin(broadcast(edges))
        .withColumn("bucket",
          expr("aggregate(es, 0L, (acc, e) -> acc + IF(price >= e, 1L, 0L))"))
      val counts = bucketed.groupBy("bucket").agg(
        sum(when(col("half") === "base", 1L).otherwise(0L)).as("n_base"),
        sum(when(col("half") === "cur", 1L).otherwise(0L)).as("n_cur"))
      val totals = counts.agg(
        sum("n_base").cast("double").as("t_base"),
        sum("n_cur").cast("double").as("t_cur"))
      counts.crossJoin(broadcast(totals))
        .withColumn("psi_term",
          when(col("n_base") > 0 && col("n_cur") > 0,
            round((col("n_cur") / col("t_cur") - col("n_base") / col("t_base")) *
              log((col("n_cur") / col("t_cur")) / (col("n_base") / col("t_base"))), 6)))
        .select("bucket", "n_base", "n_cur", "psi_term")
        .orderBy("bucket")
    }),

    // Tukey IQR outlier detection per order priority, all in scaled
    // integer arithmetic: quartiles are the DISCRETE elements at rank
    // ceil(n/4) / ceil(3n/4) of the integer-cents sort (selected by
    // row_number, the tolerance-free pattern from
    // an_group_percentile_approx), and the 1.5·IQR fences are compared
    // at 2× scale (2·cents vs 2·q1 − 3·iqr) so nothing ever touches a
    // float and the hash compare is exact. One sort shuffle for the
    // ranks, then the tiny per-group quartile table broadcasts back
    // onto the fact scan — the monitoring shape that holds at 100 TB.
    "qa_outliers" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val o = orders(s, d).select(
        col("o_orderpriority").as("grp"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val ranked = o.select(col("grp"), col("cents"),
        row_number().over(Window.partitionBy("grp").orderBy("cents")).as("rn"),
        count(lit(1)).over(Window.partitionBy("grp")).as("n"))
      val quart = ranked.groupBy("grp").agg(
        max(when(col("rn") === expr("(n + 3) div 4"), col("cents"))).as("q1"),
        max(when(col("rn") === expr("(3 * n + 3) div 4"), col("cents"))).as("q3"))
      o.join(broadcast(quart), "grp")
        .groupBy("grp")
        .agg(count(lit(1)).as("n"),
          max(col("q1")).as("q1_cents"),
          max(col("q3")).as("q3_cents"),
          sum(when(col("cents") * 2 < col("q1") * 2 - (col("q3") - col("q1")) * 3,
            1L).otherwise(0L)).as("n_low"),
          sum(when(col("cents") * 2 > col("q3") * 2 + (col("q3") - col("q1")) * 3,
            1L).otherwise(0L)).as("n_high"))
        .orderBy("grp")
    }),

    // Robust MAD outlier detection — the median-based alternative to
    // stddev/IQR monitoring (immune to the outliers it hunts). Same
    // tolerance-free discipline as qa_outliers: the median is the
    // DISCRETE element at rank (n+1) div 2 of the integer-cents sort (no
    // interpolation → no float), MAD is the discrete median of the
    // absolute deviations (longs), and the 3·1.4826·MAD fence compares
    // at 10⁴ scale (adev·10000 > mad·44478) so the flag is an integer
    // compare on both engines. Two sort shuffles + two broadcast-back
    // joins of group-sized tables — the monitoring shape at 100 TB.
    "qa_outliers_mad" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val o = events(s, d).select(
        col("event_type").as("grp"),
        round(col("value") * 100).cast("long").as("cents"))
      val med = o.select(col("grp"), col("cents"),
        row_number().over(Window.partitionBy("grp").orderBy("cents")).as("rn"),
        count(lit(1)).over(Window.partitionBy("grp")).as("n"))
        .groupBy("grp")
        .agg(max(when(col("rn") === expr("(n + 1) div 2"), col("cents"))).as("med"))
      val dev = o.join(broadcast(med), "grp")
        .withColumn("adev", abs(col("cents") - col("med")))
      val mad = dev.select(col("grp"), col("adev"),
        row_number().over(Window.partitionBy("grp").orderBy("adev")).as("rn"),
        count(lit(1)).over(Window.partitionBy("grp")).as("n"))
        .groupBy("grp")
        .agg(max(when(col("rn") === expr("(n + 1) div 2"), col("adev"))).as("mad"))
      dev.join(broadcast(mad), "grp")
        .groupBy("grp")
        .agg(count(lit(1)).as("n"),
          max(col("med")).as("med_cents"),
          max(col("mad")).as("mad_cents"),
          sum(when(col("adev") * 10000L > col("mad") * 44478L, 1L)
            .otherwise(0L)).as("n_outliers"))
        .orderBy("grp")
    }),

    // Event-time RANGE frame: per-user trailing-hour counts/sums — the
    // sliding-window feature every real-time feature store computes.
    // RANGE (not ROWS) so equal-timestamp peers land in the same frame on
    // both engines; the order key is integer epoch-seconds.
    "w6_range_frame" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts_sec"))
        .rangeBetween(-3599, Window.currentRow)
      events(s, d)
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_sec"), col("value"))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_last_hour"),
          round(sum("value").over(w), 2).as("sum_last_hour"))
        .orderBy("event_id")
    }),

    // Statistical aggregate battery: sample stddev/variance and Pearson
    // correlation per event type — rounded to 4dp so double-accumulation
    // order (~1e-10 relative) can never split the engines.
    "an_stats_battery" -> ((s, d) =>
      events(s, d)
        .select(col("event_type"), col("value"),
          unix_timestamp(col("ts")).cast("double").as("ts_sec"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          round(avg("value"), 4).as("avg_value"),
          round(stddev_samp(col("value")), 4).as("sd_value"),
          round(var_samp(col("value")), 4).as("var_value"),
          round(corr(col("value"), col("ts_sec")), 4).as("corr_ts"))
        .orderBy("event_type")),

    // Date arithmetic battery: add/diff/truncate/boundary — the calendar
    // verbs of every reporting rollup.
    "f26_date_battery" -> ((s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("due_dt"),
        date_format(add_months(col("o_orderdate"), 2), "yyyy-MM-dd").as("plus2m"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        date_format(trunc(col("o_orderdate"), "mm"), "yyyy-MM-dd").as("month_start"),
        datediff(lit("2026-01-01").cast("date"), col("o_orderdate"))
          .cast("long").as("age_days"))
        .orderBy("o_orderkey")),

    // Winsorize: clamp event values into each type's [p05, p95] — the
    // outlier-clipping step before feature aggregation. One percentile
    // aggregate (5 rows) broadcast back over the stream; the clamp is a
    // narrow least/greatest, no second shuffle of the fact table.
    "an_winsorize" -> ((s, d) => {
      val bounds = events(s, d).groupBy("event_type")
        .agg(
          expr("percentile(value, 0.05)").as("lo"),
          expr("percentile(value, 0.95)").as("hi"))
      events(s, d).filter(col("user_id") < 50)
        .join(broadcast(bounds), "event_type")
        .select(col("event_id"), col("event_type"),
          round(col("value"), 4).as("value_r"),
          round(least(greatest(col("value"), col("lo")), col("hi")), 4)
            .as("value_clipped"))
        .orderBy("event_id")
    }),

    // HLL++ sketch distinct counts — the 100 TB cardinality path:
    // mergeable fixed-size sketch, map-side partials, no exact-distinct
    // re-shuffle. The sketch VALUE is engine-specific (DuckDB's HLL
    // differs), so the oracle-checked contract is the error bound: the
    // query emits the exact count plus an integer within-5%-of-exact
    // flag, and the oracle asserts the flag is 1 for every group.
    "an_approx_distinct" -> ((s, d) =>
      events(s, d)
        .groupBy(col("event_type"))
        .agg(
          // rsd 1% (vs the 5% default): the emitted contract is the 5%
          // bound, so the sketch runs at 5σ margin — deterministic for a
          // given dataset, stable across scales
          approx_count_distinct(col("user_id"), 0.01).as("approx"),
          countDistinct("user_id").as("exact_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx") - col("exact_users")) * 20 <= col("exact_users"))
            .cast("int").as("within_5pct"))
        .orderBy("event_type")),

    // HLL sketch PARTIAL MERGE — the datasketches contract that makes
    // distinct counts incremental at 100 TB: per-nation sketches build
    // independently (one pass each, e.g. per ingest partition or per
    // day) and union via register-wise max. In coupon (sparse) mode the
    // merged estimate equals the direct one bit-for-bit; once sketches
    // go dense the mode transitions make them differ slightly — so the
    // checked contract is the ERROR BOUND: both the merged-partials
    // estimate and the direct estimate must land within 5% of the exact
    // count at every scale. The oracle asserts both flags and the
    // exact counts.
    "an_hll_merge" -> ((s, d) => {
      val c = customer(s, d).join(nation(s, d),
        col("c_nationkey") === col("n_nationkey"))
      val partials = c.groupBy("n_regionkey", "n_nationkey")
        .agg(hll_sketch_agg(col("c_custkey")).as("sk"))
      val merged = partials.groupBy("n_regionkey")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_merged"))
      val direct = c.groupBy("n_regionkey")
        .agg(hll_sketch_estimate(hll_sketch_agg(col("c_custkey"))).as("est_direct"),
          countDistinct("c_custkey").as("exact_keys"))
      direct.join(merged, "n_regionkey")
        .select(col("n_regionkey"), col("exact_keys"),
          (abs(col("est_merged") - col("exact_keys")) * 20 <= col("exact_keys"))
            .cast("int").as("merged_within_5pct"),
          (abs(col("est_direct") - col("exact_keys")) * 20 <= col("exact_keys"))
            .cast("int").as("direct_within_5pct"))
        .orderBy("n_regionkey")
    }),

    // CUBE: all 2^k subtotal combinations in ONE aggregation pass —
    // grouping-set expansion before the single shuffle, like rollup.
    "an_cube_sets" -> ((s, d) =>
      orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
        .orderBy(
          col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    // UNPIVOT/melt: wide per-group aggregates → long (metric, value)
    // rows. Spark plans Expand (row replication in the map stage) — no
    // shuffle beyond the feeding aggregate.
    "o6_unpivot" -> ((s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_cents"))
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price_cents")),
          "metric", "val")
        .orderBy("l_returnflag", "metric")),

    // lag/lead neighbours within a user's event stream — one window
    // shuffle on user_id, streaming frame.
    "w3_lag_lead" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("event_id")
      events(s, d).filter(col("user_id") < 50)
        .select(col("event_id"), col("user_id"),
          round(col("value"), 4).as("value_r"),
          round(lag("value", 1).over(w), 4).as("prev_value"),
          round(lead("value", 1).over(w), 4).as("next_value"))
        .orderBy("event_id")
    }),

    // Running total per user in exact cents (int64 — float running sums
    // would be partition-order-dependent).
    "w4_running_total" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d).filter(col("user_id") < 50)
        .select(col("event_id"), col("user_id"),
          sum(round(col("value") * 100).cast("long")).over(w).as("running_cents"))
        .orderBy("event_id")
    }),

    // Grouped exact percentiles of event value — single-shuffle sort-based
    // aggregate; at 100 TB swap `percentile` for `percentile_approx`
    // (t-digest sketch, mergeable map-side) at the cost of exactness.
    "an_group_percentile" -> ((s, d) =>
      events(s, d)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"),
          count(lit(1)).as("n"))
        .orderBy("event_type")),

    // The 100 TB path, oracle-anchored: percentile_approx buffers a
    // bounded sketch (mergeable map-side partial → no per-group value
    // buffering, unlike exact `percentile`). Accuracy 1e6 makes the rank
    // error < 1 row below 1M rows/group, so the sketch provably returns
    // the element at rank ceil(q·n) — which is what the oracle replays
    // with an explicit row_number, keeping the check tolerance-free. At
    // real scale, lower the accuracy: the plan shape is identical.
    "an_group_percentile_approx" -> ((s, d) =>
      events(s, d)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile_approx(value, 0.5, 1000000)"), 4).as("p50a"),
          round(expr("percentile_approx(value, 0.9, 1000000)"), 4).as("p90a"),
          count(lit(1)).as("n"))
        .orderBy("event_type"))
  )

  def oracleSql: Map[String, String] = Map(
    "j3_left_semi" ->
      ("SELECT c_custkey, c_name FROM customer WHERE EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O') " +
        "ORDER BY c_custkey"),
    "j4_left_anti" ->
      ("SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000) " +
        "ORDER BY c_custkey"),
    "qa_constraints" ->
      ("SELECT rule, violations FROM (" +
        "SELECT 'orderkey_not_null' AS rule, CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM orders " +
        "UNION ALL SELECT 'totalprice_positive', CAST(sum(CASE WHEN NOT coalesce(o_totalprice > 0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) FROM orders " +
        "UNION ALL SELECT 'status_in_domain', CAST(sum(CASE WHEN NOT coalesce(o_orderstatus IN ('O','F','P'), FALSE) THEN 1 ELSE 0 END) AS BIGINT) FROM orders " +
        "UNION ALL SELECT 'priority_prefix_digit', CAST(sum(CASE WHEN NOT coalesce(regexp_matches(o_orderpriority, '^[1-5]-'), FALSE) THEN 1 ELSE 0 END) AS BIGINT) FROM orders " +
        "UNION ALL SELECT 'orderkey_unique', CAST(coalesce((SELECT sum(n) FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey HAVING count(*) > 1)), 0) AS BIGINT) " +
        "UNION ALL SELECT 'custkey_exists', CAST((SELECT count(*) FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT)" +
        ") ORDER BY rule"),
    // IS NOT DISTINCT FROM is SQL's null-safe equality
    "j7_null_safe_join" ->
      ("WITH keyed AS (SELECT o_orderkey, nullif(o_orderstatus, 'P') AS k FROM orders), " +
        "dim AS (SELECT k AS k2, count(*) AS n_status FROM keyed GROUP BY 1) " +
        "SELECT o_orderkey, coalesce(k, '<null>') AS status_key, n_status " +
        "FROM keyed JOIN dim ON k IS NOT DISTINCT FROM k2 ORDER BY o_orderkey"),
    // arg_max/arg_min on the same compound integer ordering value
    "a4_minmax_by" ->
      ("WITH o AS (SELECT o_orderpriority, o_orderkey, " +
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents, " +
        "CAST(round(o_totalprice * 100) AS BIGINT) * 100000000 + o_orderkey AS ord " +
        "FROM orders) " +
        "SELECT o_orderpriority, count(*) AS n, " +
        "arg_max(o_orderkey, ord) AS top_order, " +
        "arg_min(o_orderkey, ord) AS bottom_order, " +
        "max(cents) AS max_cents, min(cents) AS min_cents " +
        "FROM o GROUP BY 1 ORDER BY o_orderpriority"),
    // list_filter replays Spark's filter(array(...), isNotNull) with the
    // same declaration order; NOT coalesce(pred, false) fails nulls on
    // both engines
    "qa_expectations" ->
      ("WITH r AS (SELECT doc_id, lang, n_chars, list_filter([" +
        "CASE WHEN NOT coalesce(lang IN ('en','de','fr'), FALSE) THEN 'lang_known' END, " +
        "CASE WHEN NOT coalesce(n_chars >= 200, FALSE) THEN 'min_length' END, " +
        "CASE WHEN NOT coalesce(contains(text, ' '), FALSE) THEN 'has_space' END" +
        "], x -> x IS NOT NULL) AS fr FROM documents) " +
        "SELECT doc_id, lang, n_chars, array_to_string(fr, ',') AS failed " +
        "FROM r WHERE len(fr) > 0 ORDER BY doc_id"),
    "j6_bucketed_join" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice, c_custkey, c_name, c_mktsegment " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "WHERE o_custkey < 300 ORDER BY o_orderkey"),
    "j5_skew_salted" ->
      ("SELECT l.s_suppkey, l.l_orderkey, l.l_linenumber, l.l_quantity, s.s_name " +
        "FROM (SELECT l_orderkey, l_linenumber, l_suppkey AS s_suppkey, l_quantity " +
        "FROM lineitem WHERE l_orderkey < 3000) l " +
        "JOIN supplier s ON l.s_suppkey = s.s_suppkey " +
        "ORDER BY l.l_orderkey, l.l_linenumber"),
    "o4_intersect" ->
      ("SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING' " +
        "INTERSECT " +
        "SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY' " +
        "ORDER BY c_nationkey"),
    "o5_except" ->
      ("SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING' " +
        "EXCEPT " +
        "SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000 " +
        "ORDER BY c_nationkey"),
    "an_approx_distinct" ->
      ("SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users, " +
        "CAST(1 AS INTEGER) AS within_5pct " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "an_hll_merge" ->
      ("SELECT n_regionkey, CAST(count(DISTINCT c_custkey) AS BIGINT) AS exact_keys, " +
        "CAST(1 AS INTEGER) AS merged_within_5pct, CAST(1 AS INTEGER) AS direct_within_5pct " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY n_regionkey ORDER BY n_regionkey"),
    "an_rollup_sets" ->
      ("SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders, " +
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents " +
        "FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority) " +
        "ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"),
    "ta_pivot_hist" ->
      ("SELECT lang, " +
        "count(*) FILTER (source = 'src0') AS src0, " +
        "count(*) FILTER (source = 'src1') AS src1, " +
        "count(*) FILTER (source = 'src2') AS src2, " +
        "count(*) FILTER (source = 'src3') AS src3 " +
        "FROM documents GROUP BY lang ORDER BY lang"),
    "an_grouping_sets" ->
      ("SELECT o_orderstatus, o_orderpriority, " +
        "CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid, " +
        "count(*) AS n_orders FROM orders " +
        "GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus)) " +
        "ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST, gid"),
    "w5_ntile_prank" ->
      ("SELECT event_id, event_type, " +
        "CAST(ntile(4) OVER (PARTITION BY event_type ORDER BY event_id) AS INTEGER) AS quartile, " +
        "round(percent_rank() OVER (PARTITION BY event_type ORDER BY event_id), 6) AS prank " +
        "FROM events WHERE user_id < 20 ORDER BY event_id"),
    "w7_rank_navigation" ->
      ("WITH e AS (SELECT event_id, event_type, " +
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events WHERE user_id < 20) " +
        "SELECT event_id, event_type, cents, " +
        "CAST(dense_rank() OVER w AS INTEGER) AS drank, " +
        "round(cume_dist() OVER w, 6) AS cdist, " +
        "first_value(event_id) OVER wr AS cheapest_id, " +
        "last_value(event_id) OVER wr AS running_last_id " +
        "FROM e WINDOW w AS (PARTITION BY event_type ORDER BY cents, event_id), " +
        "wr AS (PARTITION BY event_type ORDER BY cents, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "ORDER BY event_id"),
    // count ratios are exact rationals; ln agrees to well under 6dp
    "qa_drift" ->
      ("WITH o AS (SELECT CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 'base' ELSE 'cur' END AS half, " +
        "CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket FROM orders), " +
        "c AS (SELECT bucket, CAST(sum(CASE WHEN half = 'base' THEN 1 ELSE 0 END) AS BIGINT) AS n_base, " +
        "CAST(sum(CASE WHEN half = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS n_cur FROM o GROUP BY bucket), " +
        "t AS (SELECT CAST(sum(n_base) AS DOUBLE) AS t_base, CAST(sum(n_cur) AS DOUBLE) AS t_cur FROM c) " +
        "SELECT bucket, n_base, n_cur, " +
        "CASE WHEN n_base > 0 AND n_cur > 0 THEN " +
        "round((n_cur / t.t_cur - n_base / t.t_base) * ln((n_cur / t.t_cur) / (n_base / t.t_base)), 6) END AS psi_term " +
        "FROM c, t ORDER BY bucket"),
    // decile edges replay as explicit rank ceil(q*n) picks over the base
    // half (the sketch's accuracy makes it exact at these n); bucket =
    // number of edges <= price, same fold both engines
    "qa_drift_quantile" ->
      ("WITH o AS (SELECT CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 'base' ELSE 'cur' END AS half, " +
        "o_totalprice AS price FROM orders), " +
        "r AS (SELECT price, row_number() OVER (ORDER BY price) AS rn, count(*) OVER () AS n " +
        "FROM o WHERE half = 'base'), " +
        "e AS (SELECT list(price ORDER BY price) AS es FROM r WHERE rn IN " +
        "(CAST(ceil(0.1*n) AS BIGINT), CAST(ceil(0.2*n) AS BIGINT), CAST(ceil(0.3*n) AS BIGINT), " +
        "CAST(ceil(0.4*n) AS BIGINT), CAST(ceil(0.5*n) AS BIGINT), CAST(ceil(0.6*n) AS BIGINT), " +
        "CAST(ceil(0.7*n) AS BIGINT), CAST(ceil(0.8*n) AS BIGINT), CAST(ceil(0.9*n) AS BIGINT))), " +
        "b AS (SELECT half, CAST(list_sum(list_transform(e.es, x -> CASE WHEN price >= x THEN 1 ELSE 0 END)) AS BIGINT) AS bucket " +
        "FROM o, e), " +
        "c AS (SELECT bucket, CAST(sum(CASE WHEN half = 'base' THEN 1 ELSE 0 END) AS BIGINT) AS n_base, " +
        "CAST(sum(CASE WHEN half = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS n_cur FROM b GROUP BY bucket), " +
        "t AS (SELECT CAST(sum(n_base) AS DOUBLE) AS t_base, CAST(sum(n_cur) AS DOUBLE) AS t_cur FROM c) " +
        "SELECT bucket, n_base, n_cur, " +
        "CASE WHEN n_base > 0 AND n_cur > 0 THEN " +
        "round((n_cur / t.t_cur - n_base / t.t_base) * ln((n_cur / t.t_cur) / (n_base / t.t_base)), 6) END AS psi_term " +
        "FROM c, t ORDER BY bucket"),
    // same discrete rank selection ((n+3)//4 = ceil(n/4)) and the same
    // 2×-scaled integer fences — nothing floats, so the hash is exact
    "qa_outliers" ->
      ("WITH o AS (SELECT o_orderpriority AS grp, " +
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders), " +
        "r AS (SELECT grp, cents, row_number() OVER (PARTITION BY grp ORDER BY cents) AS rn, " +
        "count(*) OVER (PARTITION BY grp) AS n FROM o), " +
        "q AS (SELECT grp, max(CASE WHEN rn = (n + 3) // 4 THEN cents END) AS q1, " +
        "max(CASE WHEN rn = (3 * n + 3) // 4 THEN cents END) AS q3 FROM r GROUP BY grp) " +
        "SELECT o.grp, count(*) AS n, " +
        "CAST(max(q.q1) AS BIGINT) AS q1_cents, CAST(max(q.q3) AS BIGINT) AS q3_cents, " +
        "CAST(sum(CASE WHEN o.cents * 2 < q.q1 * 2 - (q.q3 - q.q1) * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_low, " +
        "CAST(sum(CASE WHEN o.cents * 2 > q.q3 * 2 + (q.q3 - q.q1) * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_high " +
        "FROM o JOIN q ON o.grp = q.grp GROUP BY o.grp ORDER BY o.grp"),
    // discrete lower-median ranks, integer fence at 10^4 scale — the
    // identical tolerance-free replay as qa_outliers
    "qa_outliers_mad" ->
      ("WITH o AS (SELECT event_type AS grp, " +
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events), " +
        "rm AS (SELECT grp, cents, row_number() OVER (PARTITION BY grp ORDER BY cents) AS rn, " +
        "count(*) OVER (PARTITION BY grp) AS n FROM o), " +
        "m AS (SELECT grp, max(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS med FROM rm GROUP BY grp), " +
        "dv AS (SELECT o.grp, o.cents, abs(o.cents - m.med) AS adev, m.med FROM o JOIN m ON o.grp = m.grp), " +
        "rd AS (SELECT grp, adev, row_number() OVER (PARTITION BY grp ORDER BY adev) AS rn, " +
        "count(*) OVER (PARTITION BY grp) AS n FROM dv), " +
        "md AS (SELECT grp, max(CASE WHEN rn = (n + 1) // 2 THEN adev END) AS mad FROM rd GROUP BY grp) " +
        "SELECT dv.grp, count(*) AS n, " +
        "CAST(max(dv.med) AS BIGINT) AS med_cents, " +
        "CAST(max(md.mad) AS BIGINT) AS mad_cents, " +
        "CAST(sum(CASE WHEN dv.adev * 10000 > md.mad * 44478 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers " +
        "FROM dv JOIN md ON dv.grp = md.grp GROUP BY dv.grp ORDER BY dv.grp"),
    // floor(epoch(ts)) matches Spark's unix_timestamp truncation; RANGE
    // frames include equal-key peers identically on both engines
    "w6_range_frame" ->
      ("WITH e AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, value FROM events) " +
        "SELECT event_id, user_id, " +
        "count(*) OVER w AS n_last_hour, " +
        "round(sum(value) OVER w, 2) AS sum_last_hour " +
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) " +
        "ORDER BY event_id"),
    "an_stats_battery" ->
      ("SELECT event_type, count(*) AS n, " +
        "round(avg(value), 4) AS avg_value, " +
        "round(stddev_samp(value), 4) AS sd_value, " +
        "round(var_samp(value), 4) AS var_value, " +
        "round(corr(value, CAST(floor(epoch(ts)) AS BIGINT)::DOUBLE), 4) AS corr_ts " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "f26_date_battery" ->
      ("SELECT o_orderkey, " +
        "strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_dt, " +
        "strftime(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus2m, " +
        "strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end, " +
        "strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start, " +
        "CAST(date_diff('day', o_orderdate, DATE '2026-01-01') AS BIGINT) AS age_days " +
        "FROM orders ORDER BY o_orderkey"),
    "an_winsorize" ->
      ("WITH b AS (SELECT event_type, quantile_cont(value, 0.05) AS lo, " +
        "quantile_cont(value, 0.95) AS hi FROM events GROUP BY event_type) " +
        "SELECT e.event_id, e.event_type, round(e.value, 4) AS value_r, " +
        "round(least(greatest(e.value, b.lo), b.hi), 4) AS value_clipped " +
        "FROM events e JOIN b ON e.event_type = b.event_type " +
        "WHERE e.user_id < 50 ORDER BY e.event_id"),
    "an_cube_sets" ->
      ("SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders, " +
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents " +
        "FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority) " +
        "ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"),
    "o6_unpivot" ->
      ("WITH a AS (SELECT l_returnflag, " +
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, " +
        "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents " +
        "FROM lineitem GROUP BY l_returnflag) " +
        "SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS val FROM a " +
        "UNION ALL " +
        "SELECT l_returnflag, 'sum_price_cents' AS metric, sum_price_cents AS val FROM a " +
        "ORDER BY l_returnflag, metric"),
    "w3_lag_lead" ->
      ("SELECT event_id, user_id, round(value, 4) AS value_r, " +
        "round(lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id), 4) AS prev_value, " +
        "round(lead(value, 1) OVER (PARTITION BY user_id ORDER BY event_id), 4) AS next_value " +
        "FROM events WHERE user_id < 50 ORDER BY event_id"),
    "w4_running_total" ->
      ("SELECT event_id, user_id, " +
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents " +
        "FROM events WHERE user_id < 50 ORDER BY event_id"),
    "an_group_percentile" ->
      ("SELECT event_type, round(quantile_cont(value, 0.5), 4) AS p50, " +
        "round(quantile_cont(value, 0.9), 4) AS p90, count(*) AS n " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    // replays rank = ceil(q*n) explicitly (convention-proof vs
    // quantile_disc's interpolation choice)
    "an_group_percentile_approx" ->
      ("WITH r AS (SELECT event_type, value, " +
        "row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn, " +
        "count(*) OVER (PARTITION BY event_type) AS n FROM events) " +
        "SELECT event_type, " +
        "round(max(CASE WHEN rn = CAST(ceil(0.5*n) AS BIGINT) THEN value END), 4) AS p50a, " +
        "round(max(CASE WHEN rn = CAST(ceil(0.9*n) AS BIGINT) THEN value END), 4) AS p90a, " +
        "count(*) AS n FROM r GROUP BY event_type ORDER BY event_type")
  )
}
