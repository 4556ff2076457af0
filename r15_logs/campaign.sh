#!/bin/bash
# r15 measurement campaign — serialized, one log per step.
cd /root/repo
R=/root/repo/r15_logs
export SPARK_GRAFT_CPUS=32
SUBSET='^(an_basket_pairs|an_pagerank|an_revenue_by_region|an_sssp|an_triangles|dd_canonical_stats|dd_cluster|dd_edit_distance|dd_exact_hash|dd_incremental_indexed|dd_minhash_capped|dd_minhash_neardup|dd_ngram_jaccard|dd_phash|dd_phash_canonical|dd_semantic|dd_simhash_neardup|dd_span_dedup|etl_census_merge|etl_rollup|llm_pretrain_mix|mm_jpeg_dims|mm_phash|qa_drift_quantile|sim_knn_graph|sim_probed_assign|sim_recall_report|sim_topk_brute|sim_topk_ivfpq_trained|sim_topk_lsh|sim_twolevel_assign|st_join|st_sessions|ta_bpe_encode|ta_cms_freq|ta_decontaminate_bloom|ta_heavy_hitters|ta_tfidf)$'
clean_scratch() { find /tmp -maxdepth 1 -name 'graft_*' ! -name 'graft_assets_*' -exec rm -rf {} + 2>/dev/null; }
mark() { echo "== $1 == $(date -u +%H:%M:%S)" >> $R/campaign_progress.log; }

# 1. sf0.1 full battery at HEAD (gate + baseline-creep check)
mark "bench sf0.1"
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=BENCH_LOCAL.json \
  sbt -batch "runMain graft.Bench" > $R/bench_sf01.log 2>&1
clean_scratch

# 2. Baseline-creep A/B triage at sf0.1: HEAD vs r12 worktree, adjacent runs
for q in ta_decontaminate dd_canonical_stats dd_incremental_indexed; do
  mark "ab HEAD $q"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.BenchOne $q 5" > $R/ab_head_$q.log 2>&1
  mark "ab r12 $q"
  (cd /root/repo/.claude/worktrees/ab-r12 && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.BenchOne $q 5" > $R/ab_r12_$q.log 2>&1)
done
clean_scratch

# 3. Ladder batteries at HEAD (full at 10x/30x/100x, subset at 300x/1000x)
mark "bench sf1"
SPARK_DRIVER_MEM=32g SPARK_GRAFT_SF_DIR=/root/repo/data/sf1 SPARK_GRAFT_BENCH_OUT=BENCH_SF1.json \
  sbt -batch "runMain graft.Bench" > $R/bench_sf1.log 2>&1
clean_scratch
mark "bench sf3"
SPARK_DRIVER_MEM=32g SPARK_GRAFT_SF_DIR=/root/repo/data/sf3 SPARK_GRAFT_BENCH_OUT=BENCH_SF3.json \
  sbt -batch "runMain graft.Bench" > $R/bench_sf3.log 2>&1
clean_scratch
mark "bench sf10"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_SF_DIR=/root/repo/data/sf10 SPARK_GRAFT_BENCH_OUT=BENCH_SF10.json \
  sbt -batch "runMain graft.Bench" > $R/bench_sf10.log 2>&1
clean_scratch
mark "bench sf30 subset"
SPARK_DRIVER_MEM=64g SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_BENCH_SAMPLES=1 SPARK_GRAFT_SF_DIR=/root/repo/data/sf30 SPARK_GRAFT_BENCH_OUT=BENCH_SF30.json \
  sbt -batch "runMain graft.Bench $SUBSET" > $R/bench_sf30.log 2>&1
clean_scratch
mark "bench sf100 subset"
SPARK_DRIVER_MEM=80g SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_BENCH_SAMPLES=1 SPARK_GRAFT_SF_DIR=/root/repo/data/sf100 SPARK_GRAFT_BENCH_OUT=BENCH_SF100.json \
  sbt -batch "runMain graft.Bench $SUBSET" > $R/bench_sf100.log 2>&1
clean_scratch

# 4. Isolated minima at 1000x at HEAD (verdict item 2 + basket adjudication)
for spec in "dd_semantic 4" "sim_knn_graph 4" "an_basket_pairs 3" "etl_census_merge 3"; do
  mark "benchone sf100 $spec"
  SPARK_DRIVER_MEM=80g SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_SF_DIR=/root/repo/data/sf100 \
    sbt -batch "runMain graft.BenchOne $spec" > "$R/b1_sf100_${spec%% *}.log" 2>&1
  clean_scratch
done

# 5. BasketProbe support=32 across the top of the ladder (verdict item 1 proof)
for sf in sf10 sf30 sf100; do
  mark "basketprobe $sf"
  SPARK_DRIVER_MEM=80g SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_SF_DIR=/root/repo/data/$sf \
    sbt -batch "runMain graft.BasketProbe 32 1024 3" > $R/basket_$sf.log 2>&1
  clean_scratch
done

# 6. Two-level crossover A/B at sf100 (verdict item 4)
mark "twolevel sf100"
SPARK_DRIVER_MEM=80g SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_SF_DIR=/root/repo/data/sf100 \
  sbt -batch "runMain graft.TwoLevelProbe 2" > $R/twolevel_sf100.log 2>&1
clean_scratch

# 7. EagerPairBound sensitivity sweep (verdict item 5): 2^15 and 2^19 vs the
#    default 2^17 already measured in step 4
for b in 32768 524288; do
  mark "sweep dd_semantic sf100 bound=$b"
  GRAFT_EAGER_PAIR_BOUND=$b SPARK_DRIVER_MEM=80g SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_SF_DIR=/root/repo/data/sf100 \
    sbt -batch "runMain graft.BenchOne dd_semantic 3" > $R/sweep_dd_${b}.log 2>&1
  clean_scratch
  mark "sweep sim_knn_graph sf10 bound=$b"
  GRAFT_EAGER_PAIR_BOUND=$b SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=/root/repo/data/sf10 \
    sbt -batch "runMain graft.BenchOne sim_knn_graph 3" > $R/sweep_knn_${b}.log 2>&1
  clean_scratch
done

mark "campaign done"
touch $R/campaign.done
