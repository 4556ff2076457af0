package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage decomposition of the minhash dedup pipeline — the §1
  * measurement step for the dd_* family: times each phase in isolation
  * (kernel pass, band explode+exchange, candidate join, Jaccard verify,
  * full operators) with scratch released between phases, so the family's
  * bench seconds can be attributed to a specific stage instead of
  * guessed from AQE job soup. Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 sbt "runMain graft.DedupProbe"
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Tables
    import graft.operators.Dedup

    def time(name: String)(mk: => DataFrame): Unit = {
      mk.count() // warm-up (JIT/codegen), unrecorded
      graft.operators.Dedup.releaseAllCaches(spark)
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = mk.count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.operators.Dedup.releaseAllCaches(spark)
        (dt, n)
      }
      val med = samples.map(_._1).sorted.apply(1)
      println(f"[probe] $name%-34s median=$med%7.3f s  rows=${samples.head._2}")
    }

    val docs = Tables.documents(spark, sfDir)
    time("scan")(docs.select("doc_id", "text"))
    time("kernel: withShinglesAndSigs")(
      Dedup.withShinglesAndSigs(docs, "doc_id", "text", 3, 8))
    time("banded explode")(
      Dedup.withShinglesAndSigs(docs, "doc_id", "text", 3, 8)
        .select(col("doc_id"),
          posexplode(col("bandkeys")).as(Seq("band_idx", "band_hash"))))
    time("cand pairs (join+distinct)") {
      val banded = Dedup.withShinglesAndSigs(docs, "doc_id", "text", 3, 8)
        .select(col("doc_id"),
          posexplode(col("bandkeys")).as(Seq("band_idx", "band_hash")))
      val x = banded.select(col("band_idx"), col("band_hash"), col("doc_id").as("a"))
      val y = banded.select(col("band_idx"), col("band_hash"), col("doc_id").as("b"))
      x.hint("merge").join(y, Seq("band_idx", "band_hash"))
        .filter(col("a") < col("b")).select("a", "b").distinct()
    }
    time("full minhashNearDupPairs")(
      Dedup.minhashNearDupPairs(docs, "doc_id", "text"))
    time("incremental (batch=1/5)")(
      Dedup.incrementalMinhashPairs(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0), "doc_id", "text"))
    spark.stop()
  }
}
