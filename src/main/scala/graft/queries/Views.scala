package graft.queries

import org.apache.spark.sql.SparkSession

/** SQL front door: the reference's habitual entry pattern is `%sql` /
  * `spark.sql("SELECT * FROM t")` over named tables (ref
  * transform_alchemer_data.py:8, rollup_alchemer_data.py:52-56). One call
  * registers every fixture table as a temp view so arbitrary SQL runs
  * end-to-end against the same parquet the DataFrame queries read —
  * `events` goes through [[Tables.events]] so its timestamp encoding is
  * normalized identically on both entry paths.
  */
object Views {
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(n => Tables.t(spark, sfDir, n).createOrReplaceTempView(n))
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
  }
}
