package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Ladder probe for `Analytics.basketPairs` at a REAL support threshold:
  * the gate query's `support = 2` makes the apriori prune vacuous on the
  * fixture (every part recurs), which left the query's 1.29 watch-list
  * exponent unprobed — output volume, not compute, drives that slope.
  * This main runs the same operator with a support that actually prunes
  * (and optionally a basket cap), printing per-sample seconds plus the
  * output cardinality so the exponent can be attributed: if time falls
  * with the output row count at fixed data, the slope is pair volume;
  * if not, a compute term survives the prune.
  *
  * usage: BasketProbe <support> [maxBasket] [samples]
  * env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_GC_EACH_QUERY
  */
object BasketProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BasketProbe <support> [maxBasket] [samples]")
    val support = args(0).toInt
    val maxBasket = args.lift(1).map(_.toInt).getOrElse(1024)
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run() = graft.queries.Analytics.basketPairs(
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey")),
      support = support, maxBasket = maxBasket).count()
    // basketPairs persists its pair table internally (deferred-width
    // materialization) — drop it between samples, Bench's own barrier
    val release = () => graft.operators.Dedup.releaseAllCaches(spark)
    val rows = run() // warm-up
    release()
    val times = (1 to n).map { _ =>
      val t0 = System.nanoTime()
      run()
      val dt = (System.nanoTime() - t0) / 1e9
      release()
      if (sys.env.get("SPARK_GRAFT_GC_EACH_QUERY").contains("1")) System.gc()
      dt
    }
    val s = times.sorted
    def fmt(v: Double) = f"$v%.3f"
    println(s"""{"probe":"basket_pairs","support":$support,""" +
      s""""max_basket":$maxBasket,"samples":[${times.map(fmt).mkString(",")}],""" +
      s""""min":${fmt(s.head)},"median":${fmt(s(n / 2))},"rows":$rows,""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
