#!/bin/bash
cd /root/repo
: > r17_logs/profile_top.log  # truncate: a rerun must not duplicate sections
for q in dd_canonical_stats dd_cluster dd_incremental dd_incremental_indexed sim_recall_report an_bfs_hops an_sssp an_pagerank dd_minhash_capped dd_minhash_neardup st_join dd_phash an_triangles an_basket_pairs llm_pretrain_mix etl_census_merge ta_cms_freq st_sessions etl_rollup dd_span_dedup; do
  echo "=== $q ===" >> r17_logs/profile_top.log
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ProfileOne $q" 2>/dev/null | sed -n '/^== /,/^== job wall/p' >> r17_logs/profile_top.log
done
echo PROFILE_DONE >> r17_logs/profile_top.log
