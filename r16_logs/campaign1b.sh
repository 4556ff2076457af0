#!/bin/bash
# r16 campaign 1b — dd_span_dedup width triage at 1000x (runs after campaign1).
cd /root/repo
R=/root/repo/r16_logs
export SPARK_GRAFT_CPUS=32
clean_scratch() { find /tmp -maxdepth 1 -name 'graft_*' ! -name 'graft_assets_*' -exec rm -rf {} + 2>/dev/null; }
mark() { echo "== $1 == $(date -u +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)" >> $R/progress.log; }
while [ ! -f $R/campaign1.done ]; do sleep 60; done
# the verify-skill triage: re-run the flagged ladder query at ~4x and ~8x
# the session width; linear -> fixed-partition term, worse -> map-side term
for w in 128 256; do
  mark "span sf100 width=$w"
  SPARK_GRAFT_SHUFFLE_PARTITIONS=$w SPARK_DRIVER_MEM=80g SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_SF_DIR=/root/repo/data/sf100 \
    sbt -batch "runMain graft.BenchOne dd_span_dedup 2" > $R/b1_sf100_span_w$w.log 2>&1
  clean_scratch
done
mark "span sf30 width=128"
SPARK_GRAFT_SHUFFLE_PARTITIONS=128 SPARK_DRIVER_MEM=64g SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_SF_DIR=/root/repo/data/sf30 \
  sbt -batch "runMain graft.BenchOne dd_span_dedup 2" > $R/b1_sf30_span_w128.log 2>&1
clean_scratch
mark "campaign1b done"
touch $R/campaign1b.done
