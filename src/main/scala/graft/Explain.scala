package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit diagnostic: prints `explain("formatted")` for the named
  * queries (or, with no args, a scale-relevant default set) at the given
  * scale directory. Usage:
  *   sbt "runMain graft.Explain [sfDir] [queryName ...]"
  * Read the output for: PushedFilters on every scan, ReadSchema pruned to
  * the referenced columns, BroadcastHashJoin on dimension joins, one
  * Exchange per key change (no back-to-back shuffles), and wide
  * WholeStageCodegen spans.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("an_revenue_by_region", "an_top_customers", "an_brand_stats",
        "etl_rollup", "etl_census_merge", "dd_minhash_neardup",
        "sim_topk_brute", "a1_group_count", "p03_filter_eq",
        "sim_topk_lsh", "sim_topk_ivf", "sim_topk_ivfpq", "ta_tfidf",
        "ta_seq_pack", "ta_hash_sample", "ta_decontaminate",
        // NOT ta_decontaminate_bloom: its construction runs the bloom
        // build (a real job) — this main prints plans, it doesn't run jobs
        "sim_topk_ivfpq_refined", "dd_incremental",
        "ta_boilerplate", "etl_scd2_upsert", "an_funnel",
        "an_cohort_retention", "etl_scd2_chain", "etl_cdc_diff",
        "ta_bm25", "ta_ngram_counts", "qa_drift_quantile")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          println(s"\n========== $n ==========")
          fn(spark, sfDir).explain("formatted")
        case None => println(s"\n========== $n: NO SUCH QUERY ==========")
      }
    }
    spark.stop()
  }
}
