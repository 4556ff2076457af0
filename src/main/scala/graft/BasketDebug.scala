package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway component profiler for the basketPairs width derivation
  * (r15 triage): times (a) the counts-only volume pre-pass, (b) the
  * plain pipeline at the session width, (c) the pipeline at the
  * derived width — separately, same session, so the regression's
  * components are attributable. usage: BasketDebug <support> [samples]
  */
object BasketDebug {
  def main(args: Array[String]): Unit = {
    val support = args(0).toInt
    val n = args.lift(1).map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Parallelism

    def timed(tag: String)(f: => Any): Unit = (1 to n).foreach { i =>
      val t0 = System.nanoTime(); val r = f
      println(f"[dbg] $tag s$i ${(System.nanoTime() - t0) / 1e9}%.2f res=$r")
      graft.operators.Dedup.releaseAllCaches(spark)
      System.gc()
    }

    val raw = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    def pipeline(): org.apache.spark.sql.DataFrame = {
      val freq = raw.groupBy("l_partkey")
        .agg(count(lit(1)).as("__pn")).filter(col("__pn") >= support)
        .select("l_partkey")
      raw.join(freq, Seq("l_partkey"), "left_semi")
        .groupBy("l_orderkey")
        .agg(collect_set(col("l_partkey")).as("__parts"))
        .filter(size(col("__parts")) <= 1024)
        .select(explode(col("__parts")).as("part_a"), col("__parts"))
        .select(col("part_a"), explode(col("__parts")).as("part_b"))
        .filter(col("part_a") < col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= support)
    }

    val nBuild = Parallelism.forPlanBytes(raw)
    timed("prepass")(Parallelism.withShufflePartitions(spark, nBuild) {
      val v = raw.groupBy("l_orderkey").agg(count(lit(1)).as("__m"))
        .agg(sum(expr("CAST(__m AS BIGINT) * (__m - 1)")).as("__v")).first()
      if (v.isNullAt(0)) 0L else v.getLong(0) / 2
    })
    val volRow = raw.groupBy("l_orderkey").agg(count(lit(1)).as("__m"))
      .agg(sum(expr("CAST(__m AS BIGINT) * (__m - 1)")).as("__v")).first()
    val vol = (if (volRow.isNullAt(0)) 0L else volRow.getLong(0)) / 2
    val nPairs = math.max(nBuild, Parallelism.forRows(spark, vol))
    println(s"[dbg] nBuild=$nBuild vol=$vol nPairs=$nPairs cores=${Parallelism.cores(spark)}")
    timed("pipeline@session")(pipeline().count())
    timed(s"pipeline@$nPairs")(Parallelism.withShufflePartitions(spark, nPairs) {
      pipeline().count()
    })
    // half-width variant: is the overshoot the cost, or the width itself?
    timed(s"pipeline@${nPairs / 8}")(Parallelism.withShufflePartitions(spark, nPairs / 8) {
      pipeline().count()
    })
    spark.stop()
  }
}
