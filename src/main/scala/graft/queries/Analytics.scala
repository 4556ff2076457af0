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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
        "GROUP BY 1 ORDER BY brand")
  )
}
