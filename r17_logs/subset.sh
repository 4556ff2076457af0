#!/bin/bash
# r17: standing 38-query scale subset at sf30 then sf100, HEAD commit.
cd /root/repo
LOG=/root/repo/r17_logs
FILTER='^(an_basket_pairs|an_pagerank|an_revenue_by_region|an_sssp|an_triangles|dd_canonical_stats|dd_cluster|dd_edit_distance|dd_exact_hash|dd_incremental_indexed|dd_minhash_capped|dd_minhash_neardup|dd_ngram_jaccard|dd_phash|dd_phash_canonical|dd_semantic|dd_simhash_neardup|dd_span_dedup|etl_census_merge|etl_rollup|llm_pretrain_mix|mm_jpeg_dims|mm_phash|qa_drift_quantile|sim_knn_graph|sim_probed_assign|sim_recall_report|sim_topk_brute|sim_topk_ivfpq_trained|sim_topk_lsh|sim_twolevel_assign|st_join|st_sessions|ta_bpe_encode|ta_cms_freq|ta_decontaminate_bloom|ta_heavy_hitters|ta_tfidf)$'
note(){ echo "$(date +%H:%M:%S) $1" >> $LOG/campaign.status; }

note "subset: sf30 start"
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=/root/repo/data/sf30 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_BENCH_SAMPLES=1 \
  SPARK_GRAFT_BENCH_OUT=$LOG/BENCH_SF30_SUBSET_r17.json \
  sbt -batch "runMain graft.Bench $FILTER" > $LOG/bench_sf30_subset.log 2>&1
note "subset: sf30 done"
rm -rf /tmp/graft_sink_* /tmp/graft_stream_* 2>/dev/null

note "subset: sf100 start"
SPARK_DRIVER_MEM=80g SPARK_GRAFT_SF_DIR=/root/repo/data/sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_BENCH_SAMPLES=1 \
  SPARK_GRAFT_BENCH_OUT=$LOG/BENCH_SF100_SUBSET_r17.json \
  sbt -batch "runMain graft.Bench $FILTER" > $LOG/bench_sf100_subset.log 2>&1
note "subset: sf100 done"
rm -rf /tmp/graft_sink_* /tmp/graft_stream_* 2>/dev/null
note "subset: COMPLETE"
