package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
// Dev-only profiling harness — lives in the TEST source set so it never
// ships in the library jar (`sbt "Test/runMain graft.Profile" [names…]`).
// Note the reported numbers are WARM-cache: each query runs twice and the
// second run is the one timed, so persisted candidate frames from the
// first run are already resident — use Bench for steady-state numbers.
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      f
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "dd_minhash_neardup", "sim_topk_lsh", "dd_canonical_stats",
      "o5_except", "qa_constraints", "etl_rollup")
    names.foreach(n => time(n) { SparkEntry.queries(n)(spark, d).count() })
    val docs = spark.read.parquet(d + "/documents.parquet")
    time("kernel_pass") {
      graft.operators.Dedup.withShinglesAndSigs(docs, "doc_id", "text", 3, 8).count()
    }
    val sigs = graft.operators.Dedup.withShinglesAndSigs(docs, "doc_id", "text", 3, 8)
    val banded = sigs.select(col("doc_id"),
      posexplode(col("bandkeys")).as(Seq("band_idx", "band_hash")))
    val x = banded.select(col("band_idx"), col("band_hash"), col("doc_id").as("a"))
    val y = banded.select(col("band_idx"), col("band_hash"), col("doc_id").as("b"))
    time("cands_join") {
      x.hint("merge").join(y, Seq("band_idx", "band_hash"))
        .filter(col("a") < col("b")).select("a", "b").distinct().count()
    }
    spark.stop()
  }
}
