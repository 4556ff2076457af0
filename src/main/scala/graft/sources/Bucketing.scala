package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed catalog tables for shuffle-free co-located joins.
  *
  * The 100 TB pattern: facts that join repeatedly on the same key
  * (orders ⋈ customer on custkey, lineitem ⋈ orders on orderkey) are
  * written ONCE bucketed+sorted by that key; every subsequent sort-merge
  * join between co-bucketed tables then reads both sides pre-partitioned
  * and pre-sorted — no Exchange, no Sort, straight to the merge. One
  * write-time shuffle amortizes across every downstream join of the
  * table pair. `BucketingSpec` asserts the no-shuffle plan property.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Equi-join two co-bucketed tables on their bucket key. When both
    * sides are bucketed into the same bucket count on the join key the
    * planner elides both exchanges (and both sorts, when sortBy matches).
    */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
