#!/bin/bash
# r16 campaign 2 — A/Bs, two-level sf100, subset batteries, clean sf0.1 battery.
cd /root/repo
R=/root/repo/r16_logs
export SPARK_GRAFT_CPUS=32
SUBSET='^(an_basket_pairs|an_pagerank|an_revenue_by_region|an_sssp|an_triangles|dd_canonical_stats|dd_cluster|dd_edit_distance|dd_exact_hash|dd_incremental_indexed|dd_minhash_capped|dd_minhash_neardup|dd_ngram_jaccard|dd_phash|dd_phash_canonical|dd_semantic|dd_simhash_neardup|dd_span_dedup|etl_census_merge|etl_rollup|llm_pretrain_mix|mm_jpeg_dims|mm_phash|qa_drift_quantile|sim_knn_graph|sim_probed_assign|sim_recall_report|sim_topk_brute|sim_topk_ivfpq_trained|sim_topk_lsh|sim_twolevel_assign|st_join|st_sessions|ta_bpe_encode|ta_cms_freq|ta_decontaminate_bloom|ta_heavy_hitters|ta_tfidf)$'
clean_scratch() { find /tmp -maxdepth 1 -name 'graft_*' ! -name 'graft_assets_*' -exec rm -rf {} + 2>/dev/null; }
mark() { echo "== $1 == $(date -u +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)" >> $R/progress.log; }

# 1. sf0.1 A/Bs vs the baseline-source code (worktree ab-r12 @ 7a3d2ab),
#    alternating HEAD/r12 so a contention window cannot land on one side.
#    etl_incr_agg: the r15 official run's surviving flag (0.847 vs 0.413).
#    dd_incremental_indexed: r15's deferred IO-variance adjudication.
for round in 1 2 3; do
  for q in etl_incr_agg dd_incremental_indexed; do
    mark "ab HEAD $q r$round"
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_DRIVER_MEM=16g \
      sbt -batch "runMain graft.BenchOne $q 2" >> $R/ab_head_$q.log 2>&1
    mark "ab r12 $q r$round"
    (cd /root/repo/.claude/worktrees/ab-r12 && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_DRIVER_MEM=16g \
      sbt -batch "runMain graft.BenchOne $q 2" >> $R/ab_r12_$q.log 2>&1)
    clean_scratch
  done
done

# 1a. graph pair at the basket-shape edge phase (new form), sf30 + sf100
for sf in sf30 sf100; do
  case $sf in sf30) M=64g;; sf100) M=80g;; esac
  for q in an_sssp an_pagerank; do
    mark "graph-new $sf $q"
    SPARK_DRIVER_MEM=$M SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_SF_DIR=/root/repo/data/$sf \
      sbt -batch "runMain graft.BenchOne $q 3" > $R/b1_${sf}_${q}_new.log 2>&1
    clean_scratch
  done
done

# 1b. dd_span_dedup final-form ladder (post width/fp fix)
for sf in sf10 sf30 sf100; do
  case $sf in sf10) M=48g;; sf30) M=64g;; sf100) M=80g;; esac
  mark "span final $sf"
  SPARK_DRIVER_MEM=$M SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_SF_DIR=/root/repo/data/$sf \
    sbt -batch "runMain graft.BenchOne dd_span_dedup 3" > $R/b1_${sf}_span_final.log 2>&1
  clean_scratch
done

# 2. two-level crossover with the array-packed assign + stratified recall
for sf in sf10 sf30 sf100; do
  case $sf in sf10) M=48g;; sf30) M=64g;; sf100) M=80g;; esac
  mark "twolevel $sf strata"
  SPARK_DRIVER_MEM=$M SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_SF_DIR=/root/repo/data/$sf \
    sbt -batch "runMain graft.TwoLevelProbe 2" > $R/twolevel_${sf}_strata.log 2>&1
  clean_scratch
done

# 3. subset batteries at final HEAD (300x and 1000x on one version)
mark "bench sf30 subset"
SPARK_DRIVER_MEM=64g SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_BENCH_SAMPLES=1 SPARK_GRAFT_SF_DIR=/root/repo/data/sf30 SPARK_GRAFT_BENCH_OUT=BENCH_SF30.json \
  sbt -batch "runMain graft.Bench $SUBSET" > $R/bench_sf30.log 2>&1
clean_scratch
mark "bench sf100 subset"
SPARK_DRIVER_MEM=80g SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_BENCH_SAMPLES=1 SPARK_GRAFT_SF_DIR=/root/repo/data/sf100 SPARK_GRAFT_BENCH_OUT=BENCH_SF100.json \
  sbt -batch "runMain graft.Bench $SUBSET" > $R/bench_sf100.log 2>&1
clean_scratch

# 4. mid-ladder full battery for the cross-round fit (sf10; sf1/sf3
#    skipped this round — the r16 changes only move at 100x+ and the
#    wall-clock budget goes to the named-fix probes instead)
mark "bench sf10"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_SF_DIR=/root/repo/data/sf10 SPARK_GRAFT_BENCH_OUT=BENCH_SF10.json \
  sbt -batch "runMain graft.Bench" > $R/bench_sf10.log 2>&1
clean_scratch

# 5. clean sf0.1 full battery — the round's official BENCH candidate.
#    Loop until the run itself says it was not contended (max 3 tries).
for try in 1 2 3; do
  mark "bench sf01 try$try"
  SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=$R/BENCH_SF01_try$try.json \
    sbt -batch "runMain graft.Bench" > $R/bench_sf01_try$try.log 2>&1
  clean_scratch
  if python3 -c "
import json,sys
d=json.load(open('$R/BENCH_SF01_try$try.json'))
sys.exit(0 if (not d.get('contended')) and d.get('regressions')==[] else 1)"; then
    cp $R/BENCH_SF01_try$try.json $R/BENCH_SF01_CLEAN.json
    break
  fi
done

mark "campaign2 done"
touch $R/campaign2.done
