package graft
import org.apache.spark.sql.SparkSession

/** Single-query timing harness for perf triage: runs ONE query from
  * `SparkEntry.queries` N times in a fresh session and prints every
  * sample (not just a median), which is what distinguishes a code
  * slowdown (all samples move) from shared-host noise (isolated spikes
  * on an otherwise flat series — the r11 finding: ~9% CPU steal on the
  * bench host turns multi-job iterative queries into 2-5x outliers in
  * single runs of the full battery).
  *
  * Usage: runMain graft.BenchOne <query> [samples] — honours the same
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS env the full bench uses.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchOne <query> [samples]")
    val name = args(0)
    val n = args.lift(1).map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // Same override Bench honours: at big scale factors a fixed
      // partitions=cores forces per-task state to grow linearly with the
      // data until spill — raising this is the triage probe that separates
      // "harness partition count" from "plan defect" on a ladder flag.
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Parity with Bench: shuffle files are reclaimed only when the
      // driver GCs the ShuffleDependency. Without this, 4 executions of
      // an iterative query at 300x (many shuffles per round, default
      // 30-min forced GC) piled up >70 GB and died on disk — while the
      // same query inside the full battery ran fine.
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query: $name (${SparkEntry.queries.size} registered)"))
    val rows = fn(spark, sfDir).count() // warm-up: JIT + codegen, unrecorded
    graft.operators.Dedup.releaseAllCaches(spark)
    val times = (1 to n).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.operators.Dedup.releaseAllCaches(spark)
      // Same opt-in as Bench: at 300x one execution of an iterative query
      // leaves ~20 GB of shuffle files; reclaim between samples.
      if (sys.env.get("SPARK_GRAFT_GC_EACH_QUERY").contains("1")) System.gc()
      dt
    }
    val s = times.sorted
    def fmt(v: Double) = f"$v%.3f"
    // rows: output cardinality — the first thing to read on a ladder
    // flag (an output-bound query's time slope IS its row-count slope)
    println(s"""{"query":"$name","samples":[${times.map(fmt).mkString(",")}],""" +
      s""""min":${fmt(s.head)},"median":${fmt(s(n / 2))},"max":${fmt(s.last)},""" +
      s""""rows":$rows,"sf":"$sfDir"}""")
    spark.stop()
  }
}
