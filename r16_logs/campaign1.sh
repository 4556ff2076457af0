#!/bin/bash
# r16 campaign 1 — post-fix probes at HEAD (da599de).
cd /root/repo
R=/root/repo/r16_logs
export SPARK_GRAFT_CPUS=32
clean_scratch() { find /tmp -maxdepth 1 -name 'graft_*' ! -name 'graft_assets_*' -exec rm -rf {} + 2>/dev/null; }
mark() { echo "== $1 == $(date -u +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)" >> $R/progress.log; }

# 1. dd_span_dedup post-fix ladder (verdict item 1: done = sf100 min <= ~3x sf30 min)
for sf in sf10 sf30 sf100; do
  case $sf in sf10) M=48g;; sf30) M=64g;; sf100) M=80g;; esac
  mark "span $sf"
  SPARK_DRIVER_MEM=$M SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_SF_DIR=/root/repo/data/$sf \
    sbt -batch "runMain graft.BenchOne dd_span_dedup 3" > $R/b1_${sf}_dd_span_dedup.log 2>&1
  clean_scratch
done

# 2. st_sessions term separation (verdict item 4): width 8 vs derived, sf30 + sf100
for sf in sf30 sf100; do
  case $sf in sf30) M=64g;; sf100) M=80g;; esac
  for w in 8 derive; do
    mark "sessprobe $sf w=$w"
    SPARK_DRIVER_MEM=$M SPARK_GRAFT_SF_DIR=/root/repo/data/$sf \
      sbt -batch "runMain graft.SessionProbe $w 2" > $R/sess_${sf}_${w}.log 2>&1
    clean_scratch
  done
done

# 3. two-level recall + fast-assign premium (verdict item 3): sf10, sf30
for sf in sf10 sf30; do
  case $sf in sf10) M=48g;; sf30) M=64g;; esac
  mark "twolevel $sf"
  SPARK_DRIVER_MEM=$M SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_SF_DIR=/root/repo/data/$sf \
    sbt -batch "runMain graft.TwoLevelProbe 2" > $R/twolevel_$sf.log 2>&1
  clean_scratch
done

# 4. graph pair adjudication (verdict item 5): isolated n=3 at sf30 and sf100
for sf in sf30 sf100; do
  case $sf in sf30) M=64g;; sf100) M=80g;; esac
  for q in an_sssp an_pagerank; do
    mark "graph $sf $q"
    SPARK_DRIVER_MEM=$M SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_SF_DIR=/root/repo/data/$sf \
      sbt -batch "runMain graft.BenchOne $q 3" > $R/b1_${sf}_${q}.log 2>&1
    clean_scratch
  done
done

mark "campaign1 done"
touch $R/campaign1.done
