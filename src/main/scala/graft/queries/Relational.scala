package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator battery: scans, filters, projections, joins,
  * aggregations, windows, sorts, unions — one named query per SURVEY.md §2
  * row, each with a DuckDB oracle in [[Relational.oracleSql]].
  *
  * Determinism rules (SURVEY.md §5.1): every query ends in an explicit
  * `orderBy` on a key; aggregates over doubles are rounded to 2dp; all
  * computed columns are aliased identically in Spark and oracle SQL.
  *
  * Scale notes (100 TB target): filters/projections stay declarative so
  * Catalyst pushes them into the parquet scan; aggregations use hash
  * partial+final (map-side combine) by construction; the only shuffles are
  * the groupBy/join/window/orderBy keys themselves.
  */
object Relational {
  import Tables._
  import org.apache.spark.sql.expressions.Window

  /** TPC-H market segments (fixed vocabulary, TESTDATA.md fixtures) used by
    * the O3 n-ary union mirroring the reference's per-demographic rollup
    * union (rollup_alchemer_data.py:37). */
  private val segments =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S3 — catalog/table scan through a temp view (ref transform_alchemer_data.py:8)
    "s3_table_scan" -> ((s, d) => {
      nation(s, d).createOrReplaceTempView("s3_nation_v")
      s.table("s3_nation_v").orderBy("n_nationkey")
    }),

    // S4 — catalog introspection: listTables + name filter (ref write_to_volume.py:7-8)
    "s4_catalog_introspect" -> ((s, d) => {
      Seq("region", "nation", "customer").foreach { t =>
        Tables.t(s, d, t).createOrReplaceTempView(s"cat_$t")
      }
      import s.implicits._
      s.catalog.listTables()
        .filter(t => t.name.startsWith("cat_"))
        .map(t => t.name.stripPrefix("cat_"))
        .toDF("table_name").orderBy("table_name")
    }),

    // P1 — schema-dispatch projection: regexp rewrite on StringType cols only
    // (ref transform_alchemer_data.py:20-23)
    "p1_schema_dispatch" -> ((s, d) => {
      val df = customer(s, d)
      import org.apache.spark.sql.types.StringType
      df.select(df.schema.fields.map { f =>
        if (f.dataType == StringType)
          regexp_replace(col(f.name), "[^a-zA-Z0-9 #]", "").as(f.name)
        else col(f.name)
      }.toSeq: _*).orderBy("c_custkey")
    }),

    // P2 — column projection/reorder (ref rollup_alchemer_data.py:40-41)
    "p2_project_reorder" -> ((s, d) =>
      lineitem(s, d).select("l_linenumber", "l_orderkey", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // P4 — filter inequality (ref rollup_alchemer_data.py:23, utils.py:210)
    "p4_filter_ne" -> ((s, d) =>
      orders(s, d).filter(col("o_orderstatus") =!= "O").orderBy("o_orderkey")),

    // P5 — drop columns (ref transform_alchemer_data.py:229-230)
    "p5_drop_cols" -> ((s, d) =>
      orders(s, d).drop("o_orderpriority", "o_orderstatus")
        .orderBy("o_orderkey")),

    // P6 — bulk rename via withColumnsRenamed (ref merge_census.py:10,17,73)
    "p6_rename_bulk" -> ((s, d) =>
      nation(s, d).withColumnsRenamed(
        Map("n_nationkey" -> "nation_key", "n_name" -> "nation_name"))
        .orderBy("nation_key")),

    // P8 — header normalization: strip/case-fix column names computed from
    // df.columns (ref extract_alchemer_data.py:30, transform_alchemer_data.py:13-14)
    "p8_header_normalize" -> ((s, d) => {
      val df = customer(s, d)
      val messy = df.withColumnsRenamed(
        df.columns.map(c => c -> s"  ${c.toUpperCase}  ").toMap)
      val normalized = messy.withColumnsRenamed(
        messy.columns.map(c => c -> c.trim.toLowerCase).toMap)
      normalized.orderBy("c_custkey")
    }),

    // J1 — online/offline merge: full-outer on all shared columns whose keys
    // never collide ≡ union-by-common-columns (ref extract_alchemer_data.py:19-24).
    // Spark-first: unionByName(allowMissingColumns) — no shuffle at all,
    // where the join formulation would shuffle both sides at 100 TB.
    "j1_union_by_common" -> ((s, d) => {
      val c = customer(s, d)
      val online = c.select(
        col("c_custkey"),
        col("c_custkey").cast("string").as("resp_id"),
        col("c_mktsegment"))
      val offline = c.filter(col("c_custkey") % 3 === 0).select(
        col("c_custkey"),
        concat(lit("Offline #"), col("c_custkey").cast("string")).as("resp_id"),
        col("c_acctbal"))
      online.unionByName(offline, allowMissingColumns = true)
        .orderBy("c_custkey", "resp_id")
    }),

    // J2 — full-outer two-key equi-join + key coalesce (ref merge_census.py:23,38-54).
    // Both sides are pre-aggregated (small); AQE picks the strategy. Full
    // outer cannot broadcast-hash both sides — fine, inputs are group counts.
    "j2_full_outer_two_key" -> ((s, d) => {
      val o = orders(s, d)
      val a = o.filter(col("o_orderstatus") =!= "P")
        .groupBy(col("o_orderstatus").as("sa"), col("o_orderpriority").as("pa"))
        .agg(count(lit(1)).as("cnt_a"))
      val b = o.filter(col("o_orderpriority") =!= "5-LOW")
        .groupBy(col("o_orderstatus").as("sb"), col("o_orderpriority").as("pb"))
        .agg(count(lit(1)).as("cnt_b"))
      a.join(b, a("sa") === b("sb") && a("pa") === b("pb"), "full_outer")
        .select(
          coalesce(col("sa"), col("sb")).as("status"),
          coalesce(col("pa"), col("pb")).as("priority"),
          col("cnt_a"), col("cnt_b"))
        .orderBy("status", "priority")
    }),

    // A3 — global max scalar stamped as a formatted literal row
    // (ref merge_census.py:129-137)
    "a3_max_stamp" -> ((s, d) =>
      orders(s, d).agg(max(col("o_orderdate")).as("max_dt"))
        .select(
          date_format(col("max_dt"), "MM/dd/yyyy").as("last_updated"),
          lit("Data Last Updated").as("label"))),

    // W1 — first(ignoreNulls) window fill; orderBy == partition key makes all
    // rows peers so the default RANGE frame spans the whole partition
    // (ref merge_census.py:29-35). The fill source is constant per partition
    // so "first" is deterministic regardless of row order.
    "w1_first_fill" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_custkey")
      orders(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        first(
          when(col("o_orderpriority") === "1-URGENT", col("o_custkey") * 1000),
          ignoreNulls = true).over(w).as("filled"))
        .orderBy("o_orderkey")
    }),

    // W2 — row_number with asc_nulls_last ordering + global re-sort
    // (ref merge_census.py:144-153)
    "w2_row_number" -> ((s, d) => {
      val base = orders(s, d).withColumn(
        "display_order",
        when(col("o_orderstatus") === "P", lit(null)).otherwise(col("o_totalprice")))
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("display_order").asc_nulls_last, col("o_orderkey").asc)
      base.select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"))
        .orderBy("o_custkey", "rn")
    }),

    // O2 — multi-key sort (ref merge_census.py:150)
    "o2_multi_key_sort" -> ((s, d) =>
      orders(s, d).orderBy("o_orderstatus", "o_orderkey")),

    // O3 — n-ary union of per-segment rollup frames built with identical
    // column order (ref rollup_alchemer_data.py:37). NB at scale the
    // single-scan groupBy(segment, key) form is preferred; this entry
    // exercises the reduce-union shape faithfully.
    "o3_union_nary" -> ((s, d) => {
      val c = customer(s, d)
      val frames = segments.map { seg =>
        c.filter(col("c_mktsegment") === seg)
          .groupBy("c_nationkey").agg(count(lit(1)).as("cnt"))
          .select(lit(seg).as("demographic"), col("c_nationkey"), col("cnt"))
      }
      frames.reduce(_ union _).orderBy("demographic", "c_nationkey")
    }),

    // P3 — filter equality (ref rollup_alchemer_data.py:17)
    "p03_filter_eq" -> ((s, d) =>
      orders(s, d).filter(col("o_orderstatus") === "F").orderBy("o_orderkey")),

    // A1 — group-by count per demographic (ref utils.py:204)
    "a1_group_count" -> ((s, d) =>
      customer(s, d).groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
        .orderBy("c_mktsegment")),

    // A2 — incl/excl scalar totals in ONE pass via conditional aggregates
    // (ref utils.py:207-211 does two collect()s per demographic; the
    // single-pass sum(when(...)) form is the scale-correct rewrite).
    "a2_cond_sum" -> ((s, d) =>
      lineitem(s, d).agg(
        round(sum(col("l_quantity")), 2).as("sum_qty_all"),
        round(sum(when(col("l_returnflag") =!= "N", col("l_quantity"))), 2)
          .as("sum_qty_excl_n"),
        count(lit(1)).as("n_rows"))),

    // O1 — sort desc (ref utils.py:221)
    "o1_sort_desc" -> ((s, d) => supplier(s, d).orderBy(col("s_name").desc)),

    // F17/F18 — round variants + abs arithmetic (ref transform_alchemer_data.py:56,69,75)
    "f17_round_arith" -> ((s, d) =>
      lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity") / 60, 2).as("qty_per_min"),
        round(round(col("l_quantity") / 10) * 10).as("qty_nearest_10"),
        abs(col("l_quantity") - 25).as("qty_dev"))
        .orderBy("l_orderkey", "l_linenumber"))
  )

  def oracleSql: Map[String, String] = Map(
    "s3_table_scan" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "s4_catalog_introspect" ->
      "SELECT * FROM (VALUES ('customer'), ('nation'), ('region')) t(table_name) ORDER BY table_name",
    "p1_schema_dispatch" ->
      "SELECT c_custkey, regexp_replace(c_name, '[^a-zA-Z0-9 #]', '', 'g') AS c_name, c_nationkey, c_acctbal, regexp_replace(c_mktsegment, '[^a-zA-Z0-9 #]', '', 'g') AS c_mktsegment FROM customer ORDER BY c_custkey",
    "p2_project_reorder" ->
      "SELECT l_linenumber, l_orderkey, l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "p4_filter_ne" ->
      "SELECT * FROM orders WHERE o_orderstatus <> 'O' ORDER BY o_orderkey",
    "p5_drop_cols" ->
      "SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders ORDER BY o_orderkey",
    "p6_rename_bulk" ->
      "SELECT n_nationkey AS nation_key, n_name AS nation_name, n_regionkey FROM nation ORDER BY nation_key",
    "p8_header_normalize" ->
      "SELECT * FROM customer ORDER BY c_custkey",
    "j1_union_by_common" ->
      "SELECT c_custkey, CAST(c_custkey AS VARCHAR) AS resp_id, c_mktsegment, NULL AS c_acctbal FROM customer UNION ALL SELECT c_custkey, 'Offline #' || CAST(c_custkey AS VARCHAR), NULL, c_acctbal FROM customer WHERE c_custkey % 3 = 0 ORDER BY c_custkey, resp_id",
    "j2_full_outer_two_key" ->
      "SELECT coalesce(a.sa, b.sb) AS status, coalesce(a.pa, b.pb) AS priority, cnt_a, cnt_b FROM (SELECT o_orderstatus AS sa, o_orderpriority AS pa, count(*) AS cnt_a FROM orders WHERE o_orderstatus <> 'P' GROUP BY 1, 2) a FULL OUTER JOIN (SELECT o_orderstatus AS sb, o_orderpriority AS pb, count(*) AS cnt_b FROM orders WHERE o_orderpriority <> '5-LOW' GROUP BY 1, 2) b ON a.sa = b.sb AND a.pa = b.pb ORDER BY status, priority",
    "a3_max_stamp" ->
      "SELECT strftime(max(o_orderdate), '%m/%d/%Y') AS last_updated, 'Data Last Updated' AS label FROM orders",
    "w1_first_fill" ->
      "SELECT o_orderkey, o_custkey, first_value(CASE WHEN o_orderpriority = '1-URGENT' THEN o_custkey * 1000 END IGNORE NULLS) OVER (PARTITION BY o_custkey ORDER BY o_custkey) AS filled FROM orders ORDER BY o_orderkey",
    "w2_row_number" ->
      "SELECT o_custkey, o_orderkey, row_number() OVER (PARTITION BY o_custkey ORDER BY (CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END) ASC NULLS LAST, o_orderkey ASC) AS rn FROM orders ORDER BY o_custkey, rn",
    "o2_multi_key_sort" ->
      "SELECT * FROM orders ORDER BY o_orderstatus, o_orderkey",
    "o3_union_nary" ->
      "SELECT c_mktsegment AS demographic, c_nationkey, count(*) AS cnt FROM customer WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'FURNITURE', 'HOUSEHOLD', 'MACHINERY') GROUP BY 1, 2 ORDER BY demographic, c_nationkey",
    "p03_filter_eq" ->
      "SELECT * FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey",
    "a1_group_count" ->
      "SELECT c_mktsegment, count(*) AS cnt FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment",
    "a2_cond_sum" ->
      "SELECT round(sum(l_quantity), 2) AS sum_qty_all, round(sum(CASE WHEN l_returnflag <> 'N' THEN l_quantity END), 2) AS sum_qty_excl_n, count(*) AS n_rows FROM lineitem",
    "o1_sort_desc" ->
      "SELECT * FROM supplier ORDER BY s_name DESC",
    "f17_round_arith" ->
      "SELECT l_orderkey, l_linenumber, round(l_quantity/60, 2) AS qty_per_min, round(round(l_quantity/10)*10) AS qty_nearest_10, abs(l_quantity-25) AS qty_dev FROM lineitem ORDER BY l_orderkey, l_linenumber"
  )
}
