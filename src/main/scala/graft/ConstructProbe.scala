package graft
import org.apache.spark.sql.SparkSession

/** Splits one query's wall into DataFrame CONSTRUCTION (driver-side plan
  * build + eager analysis) vs EXECUTION (count) — the triage probe for
  * driver-gap findings in ProfileOne. Usage: ConstructProbe <query> [n]. */
object ConstructProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm-up
    graft.operators.Dedup.releaseAllCaches(spark)
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      graft.operators.Dedup.releaseAllCaches(spark)
      println(f"[construct] $name run $i: construct ${(t1 - t0) / 1e9}%.3f s, execute ${(t2 - t1) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
