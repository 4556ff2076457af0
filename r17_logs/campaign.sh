#!/bin/bash
# r17 measurement campaign — strictly serial (never overlap timed runs).
# Phases:
#   0. compile HEAD + ab-r16 worktree
#   1. st_join A/B sf30: 3 alternating rounds x (HEAD n=2, r16 n=2)
#   2. st_join A/B sf100: 3 alternating rounds x (HEAD n=1, r16 n=1)
#   3. an_basket_pairs sf100: HEAD BenchOne n=3 (default support)
#   4. ladder batteries at HEAD: sf1, sf3, sf10
cd /root/repo
LOG=/root/repo/r17_logs
WT=/root/repo/.claude/worktrees/ab-r16
SF30=/root/repo/data/sf30
SF100=/root/repo/data/sf100
note(){ echo "$(date +%H:%M:%S) $1" >> $LOG/campaign.status; }
scrub(){ rm -rf /tmp/graft_sink_* /tmp/graft_stream_* 2>/dev/null; }

note "phase0: compile HEAD"
sbt -batch compile > $LOG/compile_head.log 2>&1 || { note "HEAD compile FAILED"; exit 1; }
note "phase0: compile ab-r16"
(cd $WT && sbt -batch compile > $LOG/compile_r16.log 2>&1) || { note "r16 compile FAILED"; exit 1; }

note "phase1: st_join sf30 A/B"
for r in 1 2 3; do
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=$SF30 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.BenchOne st_join 2" > $LOG/stjoin_sf30_head_$r.log 2>&1
  note "sf30 head round $r done"
  (cd $WT && SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=$SF30 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.BenchOne st_join 2" > $LOG/stjoin_sf30_r16_$r.log 2>&1)
  note "sf30 r16 round $r done"
done
scrub

note "phase2: st_join sf100 A/B"
for r in 1 2 3; do
  SPARK_DRIVER_MEM=80g SPARK_GRAFT_SF_DIR=$SF100 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.BenchOne st_join 1" > $LOG/stjoin_sf100_head_$r.log 2>&1
  note "sf100 head round $r done"
  (cd $WT && SPARK_DRIVER_MEM=80g SPARK_GRAFT_SF_DIR=$SF100 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.BenchOne st_join 1" > $LOG/stjoin_sf100_r16_$r.log 2>&1)
  note "sf100 r16 round $r done"
done
scrub

note "phase3: an_basket_pairs sf100 n=3"
SPARK_DRIVER_MEM=80g SPARK_GRAFT_SF_DIR=$SF100 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.BenchOne an_basket_pairs 3" > $LOG/basket_sf100.log 2>&1
note "basket done"
scrub

note "phase4: sf1 battery"
SPARK_DRIVER_MEM=32g SPARK_GRAFT_SF_DIR=/root/repo/data/sf1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=BENCH_SF1.json sbt -batch "runMain graft.Bench" > $LOG/bench_sf1.log 2>&1
note "sf1 done"
scrub
note "phase4: sf3 battery"
SPARK_DRIVER_MEM=32g SPARK_GRAFT_SF_DIR=/root/repo/data/sf3 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=BENCH_SF3.json sbt -batch "runMain graft.Bench" > $LOG/bench_sf3.log 2>&1
note "sf3 done"
scrub
note "phase4: sf10 battery"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=/root/repo/data/sf10 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_GC_EACH_QUERY=1 SPARK_GRAFT_BENCH_OUT=BENCH_SF10.json \
  sbt -batch "runMain graft.Bench" > $LOG/bench_sf10.log 2>&1
note "sf10 done"
scrub
note "campaign COMPLETE"
