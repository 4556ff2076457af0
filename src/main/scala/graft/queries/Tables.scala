package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet fixture-table access for the query battery.
  *
  * All `SparkEntry.queries` entries read the driver-generated tables
  * (TESTDATA.md) through these helpers so scans stay uniform: plain
  * `spark.read.parquet` — Catalyst handles column pruning and predicate
  * pushdown into the parquet reader (verify with
  * `df.explain("formatted")`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame    = t(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame    = t(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame  = t(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = t(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = t(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame    = t(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame  = t(spark, d, "lineitem")
  /** The events fixture stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects. Read nanos as long (legacy conf) and
    * convert with integral division — int64 nanos exceed double's 2^53
    * mantissa, so a floating-point divide would corrupt timestamps. */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, d, "events").withColumn(
      "ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, d: String): DataFrame = t(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = t(spark, d, "embeddings")
}
