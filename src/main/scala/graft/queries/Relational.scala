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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
