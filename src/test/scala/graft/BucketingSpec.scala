package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.sources.Bucketing

class BucketingSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("co-bucketed tables join without a shuffle exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      Bucketing.writeBucketed(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "b_orders", "o_custkey", buckets = 4)
      Bucketing.writeBucketed(
        customer.select("c_custkey", "c_name"),
        "b_customer", "c_custkey", buckets = 4)

      val joined = Bucketing.colocatedJoin(
        spark, "b_orders", "b_customer", "o_custkey", "c_custkey")

      // correctness: bucketed join ≡ plain join
      val expected = orders.join(customer, $"o_custkey" === $"c_custkey").count()
      assert(joined.count() === expected)

      // scale property: both sides arrive pre-partitioned — zero shuffles
      val shuffles = collectWithSubqueries(
        joined.queryExecution.executedPlan) {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"expected shuffle-free co-located join, found: $shuffles")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
