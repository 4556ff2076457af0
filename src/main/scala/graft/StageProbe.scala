package graft
import org.apache.spark.sql.SparkSession
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.etl._
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[stage] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val orders = t("read orders") { spark.read.parquet(s"$sfDir/orders.parquet") }
      val fix = t("fromOrders") { SurveyFixture.fromOrders(orders) }
      val cfg = SurveyConfig.kingston
      val silver = t("Silver.transform") { Silver.transform(fix, cfg) }
      val (valid, _) = t("validSplit") { Gold.validSplit(silver) }
      val roll = t("rollup") { Gold.rollup(valid, cfg) }
      val census = t("censusFromFixtures") {
        SurveyFixture.censusFromFixtures(spark.read.parquet(s"$sfDir/nation.parquet")) }
      val merged = t("CensusMerge.merge") { CensusMerge.merge(census, roll, silver, cfg) }
      t("count") { merged.count() }
    }
    spark.stop()
  }
}
