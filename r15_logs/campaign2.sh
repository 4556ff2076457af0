#!/bin/bash
# r15 campaign v2 — remaining measurements at the basket-fix commit.
cd /root/repo
R=/root/repo/r15_logs
export SPARK_GRAFT_CPUS=32
SUBSET='^(an_basket_pairs|an_pagerank|an_revenue_by_region|an_sssp|an_triangles|dd_canonical_stats|dd_cluster|dd_edit_distance|dd_exact_hash|dd_incremental_indexed|dd_minhash_capped|dd_minhash_neardup|dd_ngram_jaccard|dd_phash|dd_phash_canonical|dd_semantic|dd_simhash_neardup|dd_span_dedup|etl_census_merge|etl_rollup|llm_pretrain_mix|mm_jpeg_dims|mm_phash|qa_drift_quantile|sim_knn_graph|sim_probed_assign|sim_recall_report|sim_topk_brute|sim_topk_ivfpq_trained|sim_topk_lsh|sim_twolevel_assign|st_join|st_sessions|ta_bpe_encode|ta_cms_freq|ta_decontaminate_bloom|ta_heavy_hitters|ta_tfidf)$'
clean_scratch() { find /tmp -maxdepth 1 -name 'graft_*' ! -name 'graft_assets_*' -exec rm -rf {} + 2>/dev/null; }
mark() { echo "== $1 == $(date -u +%H:%M:%S)" >> $R/campaign_progress.log; }

# 1. sf100 subset battery (the OOM'd point, at the lean-basket commit)
mark "v2 bench sf100 subset"
SPARK_DRIVER_MEM=80g SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_BENCH_SAMPLES=1 SPARK_GRAFT_SF_DIR=/root/repo/data/sf100 SPARK_GRAFT_BENCH_OUT=BENCH_SF100.json \
  sbt -batch "runMain graft.Bench $SUBSET" > $R/bench_sf100_v2.log 2>&1
clean_scratch

# 2. sf30 subset re-run at the same commit (puts 300x and 1000x on one version)
mark "v2 bench sf30 subset"
SPARK_DRIVER_MEM=64g SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_BENCH_SAMPLES=1 SPARK_GRAFT_SF_DIR=/root/repo/data/sf30 SPARK_GRAFT_BENCH_OUT=BENCH_SF30.json \
  sbt -batch "runMain graft.Bench $SUBSET" > $R/bench_sf30_v2.log 2>&1
clean_scratch

# 3. Isolated minima at sf100 (remaining two)
for spec in "an_basket_pairs 3" "etl_census_merge 3"; do
  mark "v2 benchone sf100 $spec"
  SPARK_DRIVER_MEM=80g SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_SF_DIR=/root/repo/data/sf100 \
    sbt -batch "runMain graft.BenchOne $spec" > "$R/b1_sf100_${spec%% *}_v2.log" 2>&1
  clean_scratch
done

# 4. Two-level crossover A/B at sf100
mark "v2 twolevel sf100"
SPARK_DRIVER_MEM=80g SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_SF_DIR=/root/repo/data/sf100 \
  sbt -batch "runMain graft.TwoLevelProbe 2" > $R/twolevel_sf100.log 2>&1
clean_scratch

# 5. Sweep remainder: sim_knn_graph forced-lazy at sf100 (lazy endpoint;
#    default already measured n=4), plus 2^15/2^19 spot-checks on dd_semantic
mark "v2 sweep knn lazy sf100"
GRAFT_EAGER_PAIR_BOUND=1 SPARK_DRIVER_MEM=80g SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_SF_DIR=/root/repo/data/sf100 \
  sbt -batch "runMain graft.BenchOne sim_knn_graph 3" > $R/sweep_knn_lazy.log 2>&1
clean_scratch
for b in 32768 524288; do
  mark "v2 sweep dd_semantic sf100 bound=$b"
  GRAFT_EAGER_PAIR_BOUND=$b SPARK_DRIVER_MEM=80g SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_SF_DIR=/root/repo/data/sf100 \
    sbt -batch "runMain graft.BenchOne dd_semantic 2" > $R/sweep_dd_${b}.log 2>&1
  clean_scratch
done

mark "v2 done"
touch $R/campaign2.done
