package graft.etl

import org.apache.spark.sql.SparkSession
import graft.sources.SingleFileSink

/** Volume export (ref write_to_volume.py:7-16): discover the city's gold
  * tables from the catalog and export each as single-file JSON and CSV.
  */
object Export {

  /** Discover catalog tables whose name contains the city (ref
    * write_to_volume.py:7-8). */
  def discoverGoldTables(spark: SparkSession, city: String): Seq[String] = {
    import spark.implicits._
    spark.catalog.listTables()
      .filter(t => t.name.contains(city))
      .map(_.name).collect().toSeq
  }

  /** Export each discovered table as <dir>/<name>.json and <name>.csv
    * (ref write_to_volume.py:12-16; CSV natively instead of toPandas). */
  def exportAll(spark: SparkSession, city: String, dir: String): Seq[String] = {
    val tables = discoverGoldTables(spark, city)
    tables.foreach { name =>
      val df = spark.table(name)
      SingleFileSink.json(df, s"$dir/$name.json")
      SingleFileSink.csv(df, s"$dir/$name.csv")
    }
    tables
  }
}
