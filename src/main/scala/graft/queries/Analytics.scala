package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-join analytical queries over the star schema — the general
  * analytics surface beyond the reference's survey pipeline. Shapes the
  * plan for scale explicitly: dimension tables broadcast (no shuffle of
  * the fact side for them), fact-fact joins shuffle on their keys once,
  * and money aggregates run in exact integer cents (per-row round to
  * cents is engine-deterministic; the sums are then exact int64 — no
  * floating-point accumulation-order hazard at any scale).
  */
object Analytics {
  import Tables._

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  /** Basket fan-out folded into [[basketPairs]]'s width target: one
    * input line becomes up to m̄ pair instances (m̄ = mean basket size),
    * so the pair stage's per-partition input budget is the shuffle
    * target divided by this. 4 is the TPC-H lines-per-order shape; the
    * r15 same-day sweep measured widths in this region (~8× cores at
    * 1000×) time-neutral with the fixed-width form while a 16× factor
    * (~1 k partitions) paid a 10–30 % per-stage width tax — and a
    * heavier-basket corpus degrades by overshooting width (AQE
    * re-coalesces), not by spilling (see basketPairs). */
  val PairAmplification = 4

  /** Frequent co-purchase pairs over (l_orderkey, l_partkey) rows —
    * apriori k=1 prune, basket-shaped pair emission, and a BASKET-SIZE
    * GUARD (`maxBasket`, the maxGroupSize pattern from Dedup):
    *
    *  - apriori k=1 over the RAW rows: per-part raw line count ≥
    *    distinct-order count, so `raw count ≥ support` keeps a SUPERSET
    *    of the truly frequent parts — over-keeping never changes output,
    *    and pruning BEFORE the distinct shrinks its shuffle. The filter
    *    is an aggregate of the fact table, broadcastable at any
    *    realistic catalog size.
    *  - basket shape, not join shape (the 1000× lesson — the self-join
    *    form was the battery's biggest line at 481.7 s): collect_set per
    *    order IS the distinct (one corpus-wide shuffle), the double
    *    explode emits each basket's m² pairs MAP-SIDE where the partial
    *    pair-count aggregate absorbs them, and the only other exchange
    *    carries distinct pairs.
    *  - the guard bounds m: a basket emits m² pairs inside ONE task, so
    *    a single pathological basket (a degenerate mega-order, a
    *    catalog-spanning batch import) is a task-level blowup no
    *    partitioning can split. Baskets larger than `maxBasket` DISTINCT
    *    frequent parts are excluded outright — the dd_minhash_capped
    *    semantics: a basket with 10⁴+ distinct items is not co-purchase
    *    signal, and keeping it would let one row dominate every support
    *    count it touches. The cap is measured AFTER the frequent-part
    *    prune (junk parts don't disqualify a basket) and replayed by the
    *    oracle; at TPC-H shapes (≤ 7 lines/order) it never binds, so the
    *    default is plan-shape insurance, not a result change. */
  def basketPairs(raw: DataFrame, support: Int = 2,
      maxBasket: Int = 1024): DataFrame = {
    import graft.operators.Parallelism
    val spark = raw.sparkSession
    // Deferred-width execution (the iterative operators' contract,
    // Parallelism.scala NOTE): the sf100 support=32 probe at r14 pushed
    // ~126 M surviving pair instances through the session's 32 fixed
    // partitions (~4 M rows each) and measured a 6.3 → 13.3 → 73.0 s
    // 100×→1000× knee. The width must therefore track the PAIR volume,
    // not the input bytes alone. Two r15 lessons bound HOW it may be
    // derived (SCALE.md r15, measured same-day A/B at sf100):
    //  - materializing the basket table to estimate the volume exactly
    //    (persist + Σ m(m−1)/2) is 10⁸ cached array rows at 1000× — the
    //    heap pressure that OOM'd the sf100 battery;
    //  - a counts-only volume pre-pass is ~20 s of pure per-execution
    //    overhead at sf100 while buying nothing locally: the pipeline
    //    itself measured width-NEUTRAL from 32 to 2289 partitions
    //    (51–75 s, same-session BasketDebug) — the r14 knee is a
    //    memory/disk-contention regime, not a constant local tax.
    // So the width derives for FREE from the scan's plan-stats bytes
    // with the fan-out folded into the per-partition target: each input
    // line amplifies into ≤ m̄ pair instances (m̄ = lines/order, ~4 at
    // TPC-H shapes), so a 32 MB/4 = 8 MB input target keeps each
    // task's pair slice inside the shuffle spill budget at the TPC-H
    // shape; a heavier-basket corpus overshoots the width instead of
    // spilling, AQE coalesces the byte-small reduce partitions back,
    // and the Cap rails a corrupt estimate. Locally the floor keeps
    // gate-scale plans identical (nPairs = cores at sf0.1). Only the
    // support-filtered OUTPUT persists (distinct-pair-sized — the
    // scope's materialization contract).
    //
    // EAGER-EXECUTION NOTE: this method RUNS the pair pipeline at call
    // time (persist + count — the withShufflePartitions contract needs
    // the heavy phase materialized inside the scope), so a plan-only
    // consumer pays full execution here. The persisted output is
    // registered in the operator SCRATCH registry: any session-long
    // caller (Verify, Bench between samples) drops it via
    // Dedup.releaseScratch/releaseAllCaches, and because it is a plain
    // persist with live lineage, a consumer that reads the frame after
    // release silently recomputes — correct, just at session width.
    // Both halves of that contract are pinned by BasketPairsContractSpec;
    // a consumer that never wants the eager execution (plan inspection,
    // a caller that materializes inside its OWN width scope) takes
    // [[basketPairsPlan]] instead.
    val nPairs = Parallelism.forPlanBytes(
      raw, Parallelism.TargetPartitionBytes / PairAmplification)
    Parallelism.withShufflePartitions(spark, nPairs) {
      val c = graft.operators.Dedup.scratchPersist(
        basketPairsPlan(raw, support, maxBasket))
      c.count()
      c
    }
  }

  /** LAZY plan-only variant of [[basketPairs]] (r16 verdict hardening):
    * the identical pair pipeline with NO persist, NO count, NO scratch
    * registration — for consumers that only inspect the plan, or that
    * materialize inside their own derived-width scope. The caller owns
    * the width: executing this plan under the session default at 1000×
    * reproduces the r14 fixed-width knee that [[basketPairs]]' eager
    * in-scope materialization exists to prevent, so any consumer that
    * will RUN the plan at scale must wrap execution in
    * `Parallelism.withShufflePartitions(spark, Parallelism.forPlanBytes(
    * raw, TargetPartitionBytes / PairAmplification))` exactly as
    * [[basketPairs]] does. */
  def basketPairsPlan(raw: DataFrame, support: Int = 2,
      maxBasket: Int = 1024): DataFrame = {
    val freq = raw.groupBy("l_partkey")
      .agg(count(lit(1)).as("__pn"))
      .filter(col("__pn") >= support)
      .select("l_partkey")
    // No broadcast hint: the frequent-part set scales with the CATALOG
    // (every part at support=2 — ~20 B keys at TPC-H 100 TB), so forcing
    // a broadcast is a driver OOM at exactly the scale the prune matters.
    // AQE sees freq's runtime size and broadcasts when it fits (it does
    // at every fixture scale); above the threshold the semi-join shuffles
    // on l_partkey with no driver-resident artifact.
    raw.join(freq, Seq("l_partkey"), "left_semi")
      .groupBy("l_orderkey")
      .agg(collect_set(col("l_partkey")).as("__parts"))
      .filter(size(col("__parts")) <= maxBasket)
      .select(explode(col("__parts")).as("part_a"), col("__parts"))
      .select(col("part_a"), explode(col("__parts")).as("part_b"))
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= support)
  }

  /** Shared co-purchase edge phase of the three graph queries
    * (an_pagerank / an_bfs_hops / an_sssp): support≥2 part pairs over
    * orders, i.e. exactly [[basketPairs]] with the mega-basket guard
    * disabled (these queries' oracles replay UNguarded pair semantics —
    * Int.MaxValue keeps the contract byte-identical; at TPC-H shapes
    * the guard never binds anyway). The r16 motivation is the r13/r15
    * basket lesson landing on the graph family: all three previously
    * inlined a lineitem self-join + session-width pair aggregate, and
    * at 1000× the isolated an_sssp probe DIED on execution memory
    * (UNABLE_TO_ACQUIRE_MEMORY at 80 g heap, 32 fixed partitions)
    * inside that phase — the same per-task hash-state blowup
    * an_basket_pairs hit before its derived-width materialization.
    * Routing through basketPairs buys the map-side basket emission, the
    * plan-stats-derived shuffle width, and the in-scope materialization
    * in one move; the walk/rank phases then start from a persisted,
    * pair-sized table (the iterative operators' own width derivation is
    * unchanged). */
  private def coPurchaseEdges(s: SparkSession, d: String): DataFrame =
    basketPairs(
      lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
      support = 2, maxBasket = Int.MaxValue)

  // an_pagerank consumes basketPairsPlan (lazy) directly: pageRankScaled
  // localCheckpoints its symmetrized edge input as its first step, so the
  // eager variant would pay the pair pipeline's blocks twice (persist +
  // count, then the checkpoint copy) — a measured ~0.25–0.5 s of pure
  // overhead at sf0.1 (r17 BenchOne n=5 A/B: eager min 3.451 / median
  // 3.892 vs lazy 3.200 / 3.403) that held the query at the
  // regression-gate edge. bfs/sssp stay on the eager [[coPurchaseEdges]]:
  // their query bodies read the edge frame twice (edges AND seeds) before
  // any truncation, so a lazy plan would execute the pipeline once per
  // consumer. The lazy consumer owns the execution width — see the
  // derived-width wrapper at the an_pagerank call site.

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](
    // Revenue per region: lineitem ⋈ orders (shuffle) ⋈ customer (shuffle)
    // ⋈ nation ⋈ region (broadcast both)
    "an_revenue_by_region" -> ((s, d) => {
      val rev = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"))
        .agg(
          sum(rev).as("revenue_cents"),
          count(lit(1)).as("n_items"))
        .orderBy("region")
    }),

    // Top 10 customers by spend (exact cents), deterministic tiebreak
    "an_top_customers" -> ((s, d) =>
      orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(
          sum(cents(col("o_totalprice"))).as("spend_cents"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("spend_cents").desc, col("c_custkey").asc)
        .limit(10)),

    // Per-brand price/quantity stats: part (broadcast) ⋈ lineitem
    "an_brand_stats" -> ((s, d) =>
      lineitem(s, d)
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"))
        .agg(
          count(lit(1)).as("n_items"),
          min(cents(col("p_retailprice"))).as("min_price_cents"),
          max(cents(col("p_retailprice"))).as("max_price_cents"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy("brand"))
  ) ++ behavioralQueries

  /** Event-behavior analytics: funnel conversion and cohort retention —
    * the product-analytics staples. Both are single-keyed-shuffle shapes:
    * funnel is one per-user conditional-min aggregate then a global
    * conditional count; cohorts are one per-user first-event aggregate
    * joined back on user_id (co-partitioned with the event shuffle) and
    * one distinct-count per (cohort, week) cell. */
  private def behavioralQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Ordered funnel view → click → purchase on each user's FIRST event
    // per stage; a stage counts only when strictly after the previous
    // one. Null stage times fall out of the CASE comparisons identically
    // in Spark and the oracle.
    "an_funnel" -> ((s, d) => {
      val firsts = events(s, d).groupBy("user_id").agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
      firsts.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("t_view").isNotNull, 1L).otherwise(0L)).as("n_view"),
        sum(when(col("t_view") < col("t_click"), 1L).otherwise(0L))
          .as("n_view_click"),
        sum(when(col("t_view") < col("t_click") &&
          col("t_click") < col("t_purchase"), 1L).otherwise(0L))
          .as("n_full_funnel"))
    }),

    // Market-basket pair mining: parts co-purchased in one order, pair
    // support counted corpus-wide. Shape: ONE co-partitioned self-join on
    // the order key (pair fan-out bounded by lines-per-order, ~7 in
    // TPC-H, so amplification is a small constant — never all-pairs
    // across orders) and one pair-count shuffle. The classic
    // frequent-itemset k=2 pass, WITH the apriori k=1 prune: a pair can
    // reach support s only if BOTH parts individually appear in ≥ s
    // distinct orders, so infrequent parts are filtered out BEFORE the
    // pair expansion. Identical output; at 100 TB the prune is what
    // bounds the fan-out — the 300× ladder measured the unpruned join's
    // pair constant growing 5.3× on 3× data, and the frequent-part set
    // shrinks relative to the fact table as the catalog long-tails.
    "an_basket_pairs" -> ((s, d) =>
      basketPairs(lineitem(s, d).select(col("l_orderkey"), col("l_partkey")))
        .orderBy(col("support").desc, col("part_a"), col("part_b"))),

    // Top-k per group via rank pushdown: row_number ≤ k directly above
    // the window lets Catalyst infer a WindowGroupLimit, so each map
    // task keeps only its per-group top k BEFORE the shuffle (partial
    // limit) and each reduce task re-limits after (final). At 100 TB
    // this is the difference between shuffling the whole fact table and
    // shuffling ≤ k rows per (group × input partition) — pinned in
    // PlanSpec so a refactor that breaks the inference fails the build.
    "an_topk_per_group" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val bal = cents(col("c_acctbal"))
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("acctbal_cents").desc, col("c_custkey").asc)
      customer(s, d)
        .select(col("c_nationkey"), col("c_custkey"),
          bal.as("acctbal_cents"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .orderBy("c_nationkey", "rk")
    }),

    // Time-constrained funnel (the ClickHouse windowFunnel shape): each
    // step must land strictly after the previous step and within a
    // 1-hour horizon of it. Step k is one co-partitioned join back to
    // the step-(k-1) firsts plus a conditional min — every pass shuffles
    // on user_id only, and the depth counts are 1-row aggregates
    // broadcast-crossed at the end.
    "an_window_funnel" -> ((s, d) => {
      val e = events(s, d)
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val c = e.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts") > col("t1") &&
          col("ts") <= col("t1") + expr("INTERVAL 1 HOUR"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts") > col("t2") &&
          col("ts") <= col("t2") + expr("INTERVAL 1 HOUR"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      v.agg(count(lit(1)).as("n_step1"))
        .crossJoin(broadcast(c.agg(count(lit(1)).as("n_step2"))))
        .crossJoin(broadcast(p.agg(count(lit(1)).as("n_step3"))))
    }),

    // PageRank over the co-purchase graph: nodes are parts, edges both
    // directions of each supported basket pair. Exact scaled-integer
    // arithmetic (Graph.pageRankScaled) makes the 3-iteration result
    // bit-identical across engines — the oracle unrolls the identical
    // integer formula in SQL, so this is a true cross-engine replay of
    // an ITERATIVE distributed algorithm on the hash gate.
    "an_pagerank" -> ((s, d) => {
      val raw = lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
      val edges = basketPairsPlan(raw, support = 2, maxBasket = Int.MaxValue)
        .select(col("part_a").as("src"), col("part_b").as("dst"))
      val sym = edges.unionByName(
        edges.select(col("dst").as("src"), col("src").as("dst")))
      // The lazy edge plan executes inside pageRankScaled's FIRST step
      // (Checkpointer.truncate), which runs BEFORE pageRank's own
      // derived-width scope — so the pair aggregate would otherwise run
      // at the ambient session width, the r14 fixed-width knee
      // basketPairs' eager scope exists to prevent (the r17 sf30 subset
      // battery caught exactly that: 64.8 → 87.7 s). Wrap the call in
      // the same pair-volume-derived width basketPairs uses; the
      // rank loop re-derives its own width inside, and at gate scale
      // the floor keeps this the session width (plan-identical).
      import graft.operators.Parallelism
      val nPairs = Parallelism.forPlanBytes(
        raw, Parallelism.TargetPartitionBytes / PairAmplification)
      Parallelism.withShufflePartitions(s, nPairs) {
        graft.operators.Graph.pageRankScaled(sym, "src", "dst", iters = 3)
      }.orderBy(col("rank_scaled").desc, col("id"))
    }),

    // Multi-source BFS over the co-purchase graph: minimum hop distance
    // from the seed set (every 97th part) bounded at 3 hops —
    // neighborhood expansion, the reachability primitive behind
    // contamination-spread and related-item queries. Frontier-only
    // joins + anti-join visited set (Graph.bfsHops) keep round cost
    // proportional to newly-reached nodes; the oracle replays with a
    // bounded recursive CTE. Set semantics — no arithmetic — so the
    // hash compare is exact.
    "an_bfs_hops" -> ((s, d) => {
      val one = coPurchaseEdges(s, d)
        .select(col("part_a").as("src"), col("part_b").as("dst"))
      val edges = one.unionByName(
        one.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = edges.select(col("src").as("id"))
        .filter(col("id") % 97 === 0).distinct()
      graft.operators.Graph.bfsHops(edges, "src", "dst", seeds, "id", maxHops = 3)
        .orderBy("id")
    }),

    // Per-node triangle participation over the co-purchase graph — the
    // clustering-coefficient numerator. Edges are ORIENTED a<b once, so
    // each triangle (a<b<c) materializes exactly one wedge join
    // (e1.b=e2.a) plus one closing-edge semi-check — the standard
    // skew-bounded formulation (a hub's wedge count is deg²/2 on the
    // oriented list, not deg² on both directions; at larger scale the
    // orientation flips to degree order, same plan). Two equi-joins on
    // the bounded pair table, no cartesian; top-20 with deterministic
    // tie-break.
    "an_triangles" -> ((s, d) => {
      // The edge list is referenced 3× by the wedge join and the wedge
      // join 3× by the node union — left lazy, Catalyst inlines the
      // whole pipeline NINE times (18 lineitem scans in the sf30 plan,
      // with only runtime stage-reuse to deduplicate them), and every
      // ENSURE_REQUIREMENTS shuffle (the distinct and the wedge
      // aggregate — the spill sites at 300×, SCALE.md r12) stays at the
      // session width no matter what the join inputs are repartitioned
      // to. So the heavy phase materializes ONCE, inside a conf scope
      // whose shuffle width tracks the scanned bytes (identical to the
      // iterative operators' contract): persist + count executes the
      // distinct, the self-join, the support aggregate, and the wedge
      // join at the derived width; the deferred tail (node union +
      // count + top-20) reads the cached triangle table, which is
      // triangle-sized, not fact-table-sized. Bench's per-sample
      // releaseAllCaches barrier drops the scratch, so every sample
      // still re-executes the full pipeline.
      val nP = graft.operators.Parallelism.forInputBytes(
        s, Seq(s"$d/lineitem.parquet"))
      val tri = graft.operators.Parallelism.withShufflePartitions(s, nP) {
        val li = lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
          .distinct()
        val a = li.select(col("l_orderkey"), col("l_partkey").as("part_a"))
        val b = li.select(col("l_orderkey"), col("l_partkey").as("part_b"))
        val edges = a.join(b, "l_orderkey")
          .filter(col("part_a") < col("part_b"))
          .groupBy("part_a", "part_b")
          .agg(count(lit(1)).as("support"))
          .filter(col("support") >= 2)
          .select(col("part_a").as("u"), col("part_b").as("v"))
          .persist()
        val t = edges.select(col("u").as("x"), col("v").as("y"))
          .join(edges.select(col("u").as("y"), col("v").as("z")), "y")
          .join(edges.select(col("u").as("x"), col("v").as("z")),
            Seq("x", "z"), "left_semi")
          .persist()
        t.count()
        edges.unpersist(blocking = false)
        t
      }
      tri.select(col("x").as("node"))
        .unionByName(tri.select(col("y").as("node")))
        .unionByName(tri.select(col("z").as("node")))
        .groupBy("node").agg(count(lit(1)).as("n_triangles"))
        .orderBy(col("n_triangles").desc, col("node"))
        .limit(20)
    }),

    // Weighted shortest path over the same co-purchase graph: edge cost
    // 1000 div support (frequently co-bought pairs are cheap to
    // traverse), minimum total cost from the seed set over ≤3-edge
    // paths. Bellman–Ford with a frontier optimization (only nodes
    // improved last round relax their out-edges — Graph.ssspWeighted);
    // integer weights keep the min-fold exact, and the oracle replays
    // with a hop-bounded recursive CTE over identical integer sums.
    "an_sssp" -> ((s, d) => {
      val pairs = coPurchaseEdges(s, d)
      val edges = pairs.select(col("part_a").as("src"),
          col("part_b").as("dst"), col("support"))
        .unionByName(pairs.select(col("part_b").as("src"),
          col("part_a").as("dst"), col("support")))
        .withColumn("w", expr("1000 div support"))
      val seeds = edges.select(col("src").as("id"))
        .filter(col("id") % 97 === 0).distinct()
      graft.operators.Graph.ssspWeighted(
        edges, "src", "dst", "w", seeds, "id", maxHops = 3)
        .orderBy("id")
    }),

    // Weekly cohort retention: cohort = Monday-truncated week of the
    // user's first event; each (cohort, weeks-since) cell counts the
    // cohort's users active that week.
    "an_cohort_retention" -> ((s, d) => {
      val e = events(s, d)
      val cohorts = e.groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      e.join(cohorts, "user_id")
        .select(col("user_id"), col("cohort_week"),
          (datediff(date_trunc("week", col("ts")), col("cohort_week")) / 7)
            .cast("long").as("week_n"))
        .distinct()
        .groupBy(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
          col("week_n"))
        .agg(count(lit(1)).as("n_active"))
        .orderBy("cohort_week", "week_n")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "an_revenue_by_region" ->
      ("SELECT r_name AS region, CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents, " +
        "count(*) AS n_items FROM lineitem " +
        "JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY 1 ORDER BY region"),
    "an_top_customers" ->
      ("SELECT c_custkey, c_name, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents, count(*) AS n_orders " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY 1, 2 ORDER BY spend_cents DESC, c_custkey ASC LIMIT 10"),
    "an_brand_stats" ->
      ("SELECT p_brand AS brand, count(*) AS n_items, " +
        "min(CAST(round(p_retailprice * 100) AS BIGINT)) AS min_price_cents, " +
        "max(CAST(round(p_retailprice * 100) AS BIGINT)) AS max_price_cents, " +
        "round(sum(l_quantity), 2) AS sum_qty " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "GROUP BY 1 ORDER BY brand"),
    // NULL stage times drop out of the CASE comparisons on both engines.
    // ts::TIMESTAMP truncates DuckDB's nanosecond fixture timestamps to
    // the microsecond precision Spark reads (Tables.events), so a
    // same-microsecond view/click that differs only in nanos can never
    // split the two engines' strict-order comparisons.
    "an_funnel" ->
      ("WITH firsts AS (SELECT user_id, " +
        "min(CASE WHEN event_type = 'view' THEN ts::TIMESTAMP END) AS t_view, " +
        "min(CASE WHEN event_type = 'click' THEN ts::TIMESTAMP END) AS t_click, " +
        "min(CASE WHEN event_type = 'purchase' THEN ts::TIMESTAMP END) AS t_purchase " +
        "FROM events GROUP BY user_id) " +
        "SELECT count(*) AS n_users, " +
        "CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view, " +
        "CAST(sum(CASE WHEN t_view < t_click THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click, " +
        "CAST(sum(CASE WHEN t_view < t_click AND t_click < t_purchase THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel " +
        "FROM firsts"),
    // replays the basket-size guard (and with it the apriori prune the
    // guard is measured after): baskets keep only parts with raw line
    // count >= support, and baskets with > 1024 distinct surviving parts
    // are excluded outright (never binds at TPC-H shapes — <= 7
    // lines/order — so gate output is the unguarded result)
    "an_basket_pairs" ->
      ("WITH freq AS (SELECT l_partkey FROM lineitem GROUP BY 1 HAVING count(*) >= 2), " +
        "li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem JOIN freq USING (l_partkey)), " +
        "ok AS (SELECT l_orderkey FROM li GROUP BY 1 HAVING count(*) <= 1024) " +
        "SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, " +
        "count(*) AS support " +
        "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey " +
        "AND a.l_partkey < b.l_partkey JOIN ok ON ok.l_orderkey = a.l_orderkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2 " +
        "ORDER BY support DESC, part_a, part_b"),
    // cents-ranked with custkey tie-break → fully deterministic order;
    // DuckDB row_number is BIGINT, Spark's is INT — cast to match
    "an_topk_per_group" ->
      ("WITH r AS (SELECT c_nationkey, c_custkey, " +
        "CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents, " +
        "row_number() OVER (PARTITION BY c_nationkey " +
        "ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC, c_custkey ASC) AS rk " +
        "FROM customer) " +
        "SELECT c_nationkey, c_custkey, acctbal_cents, CAST(rk AS INTEGER) AS rk " +
        "FROM r WHERE rk <= 3 ORDER BY c_nationkey, rk"),
    // ts::TIMESTAMP truncates the fixture's nanos to Spark's micros
    // (the an_funnel convention) so horizon comparisons can never split
    // the engines
    "an_window_funnel" ->
      ("WITH v AS (SELECT user_id, min(ts::TIMESTAMP) AS t1 FROM events " +
        "WHERE event_type = 'view' GROUP BY 1), " +
        "c AS (SELECT e.user_id, min(e.ts::TIMESTAMP) AS t2 FROM events e " +
        "JOIN v ON e.user_id = v.user_id WHERE e.event_type = 'click' " +
        "AND e.ts::TIMESTAMP > v.t1 AND e.ts::TIMESTAMP <= v.t1 + INTERVAL 1 HOUR GROUP BY 1), " +
        "p AS (SELECT e.user_id, min(e.ts::TIMESTAMP) AS t3 FROM events e " +
        "JOIN c ON e.user_id = c.user_id WHERE e.event_type = 'purchase' " +
        "AND e.ts::TIMESTAMP > c.t2 AND e.ts::TIMESTAMP <= c.t2 + INTERVAL 1 HOUR GROUP BY 1) " +
        "SELECT (SELECT count(*) FROM v) AS n_step1, " +
        "(SELECT count(*) FROM c) AS n_step2, " +
        "(SELECT count(*) FROM p) AS n_step3"),
    // bounded recursive CTE: UNION (set) semantics dedupe revisits,
    // w.dist < 3 bounds the walk, min(dist) per node = BFS hop count
    "an_bfs_hops" ->
      ("WITH RECURSIVE li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "pairs AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb FROM li a " +
        "JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2), " +
        "edges AS (SELECT pa AS src, pb AS dst FROM pairs UNION ALL SELECT pb, pa FROM pairs), " +
        "seeds AS (SELECT DISTINCT src AS id FROM edges WHERE src % 97 = 0), " +
        "walk(id, dist) AS (SELECT id, 0 FROM seeds " +
        "UNION SELECT e.dst, w.dist + 1 FROM walk w JOIN edges e ON e.src = w.id " +
        "WHERE w.dist < 3) " +
        "SELECT id, CAST(min(dist) AS BIGINT) AS hops FROM walk " +
        "GROUP BY id ORDER BY id"),
    // oriented wedge join + closing-edge EXISTS = one row per triangle
    "an_triangles" ->
      ("WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "pairs AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb FROM li a " +
        "JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2), " +
        "e AS (SELECT pa AS u, pb AS v FROM pairs), " +
        "tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z FROM e e1 " +
        "JOIN e e2 ON e1.v = e2.u " +
        "WHERE EXISTS (SELECT 1 FROM e e3 WHERE e3.u = e1.u AND e3.v = e2.v)), " +
        "nodes AS (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri " +
        "UNION ALL SELECT z FROM tri) " +
        "SELECT node, count(*) AS n_triangles FROM nodes GROUP BY 1 " +
        "ORDER BY n_triangles DESC, node LIMIT 20"),
    // hop-bounded recursive CTE over the weighted graph: UNION dedupes
    // identical (id, cost, hops) states, min per node = shortest path;
    // // is floor division = Spark's div on the all-positive supports
    "an_sssp" ->
      ("WITH RECURSIVE li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "pairs AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS support FROM li a " +
        "JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2), " +
        "edges AS (SELECT pa AS src, pb AS dst, 1000 // support AS w FROM pairs " +
        "UNION ALL SELECT pb, pa, 1000 // support FROM pairs), " +
        "seeds AS (SELECT DISTINCT src AS id FROM edges WHERE src % 97 = 0), " +
        "walk(id, d, hops) AS (SELECT id, CAST(0 AS BIGINT), 0 FROM seeds " +
        "UNION SELECT e.dst, w.d + e.w, w.hops + 1 FROM walk w " +
        "JOIN edges e ON e.src = w.id WHERE w.hops < 3) " +
        "SELECT id, CAST(min(d) AS BIGINT) AS dist FROM walk " +
        "GROUP BY id ORDER BY id"),
    // the identical scaled-integer formula unrolled: // is floor
    // division = Spark's div on the all-positive ranks; integer sums
    // are order-independent, so the 3-iteration replay hash-matches
    "an_pagerank" -> {
      val S = "1000000000000"
      def iter(prev: String, out: String) =
        s"c$out AS (SELECT e.dst AS id, CAST(sum($prev.r // dg.d) AS BIGINT) AS c " +
          s"FROM edges e JOIN $prev ON e.src = $prev.id JOIN dg ON e.src = dg.src GROUP BY 1), " +
          s"$out AS (SELECT nodes.id, tele.t + (85 * coalesce(c$out.c, 0)) // 100 AS r " +
          s"FROM nodes CROSS JOIN tele LEFT JOIN c$out ON nodes.id = c$out.id), "
      ("WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), " +
        "pairs AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb FROM li a " +
        "JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey " +
        "GROUP BY 1, 2 HAVING count(*) >= 2), " +
        "edges AS (SELECT pa AS src, pb AS dst FROM pairs UNION ALL SELECT pb, pa FROM pairs), " +
        "dg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1), " +
        "nodes AS (SELECT DISTINCT src AS id FROM edges), " +
        s"tele AS (SELECT (15 * $S) // (100 * count(*)) AS t, $S // count(*) AS r0v FROM nodes), " +
        "r0 AS (SELECT id, tele.r0v AS r FROM nodes CROSS JOIN tele), " +
        iter("r0", "r1") + iter("r1", "r2") +
        "cr3 AS (SELECT e.dst AS id, CAST(sum(r2.r // dg.d) AS BIGINT) AS c " +
        "FROM edges e JOIN r2 ON e.src = r2.id JOIN dg ON e.src = dg.src GROUP BY 1) " +
        "SELECT nodes.id, CAST(tele.t + (85 * coalesce(cr3.c, 0)) // 100 AS BIGINT) AS rank_scaled " +
        "FROM nodes CROSS JOIN tele LEFT JOIN cr3 ON nodes.id = cr3.id " +
        "ORDER BY rank_scaled DESC, nodes.id")
    },
    // date_trunc('week') is Monday-based on both engines; the session
    // timezone is UTC on both
    "an_cohort_retention" ->
      ("WITH cohorts AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort_week " +
        "FROM events GROUP BY user_id), " +
        "cells AS (SELECT DISTINCT e.user_id, c.cohort_week, " +
        "date_diff('day', c.cohort_week, date_trunc('week', e.ts)) // 7 AS week_n " +
        "FROM events e JOIN cohorts c ON e.user_id = c.user_id) " +
        "SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week, week_n, " +
        "count(*) AS n_active FROM cells GROUP BY 1, 2 ORDER BY cohort_week, week_n")
  )
}
