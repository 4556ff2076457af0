#!/bin/bash
set -x
cd /root/repo
echo "$(date +%T) tests start" >> r17_logs/green.status
sbt -batch test > r17_logs/test_green.log 2>&1
echo "TEST_RC=$?" >> r17_logs/green.status
echo "$(date +%T) verify sf0.01 start" >> r17_logs/green.status
rm -rf /tmp/v17a
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v17a" > r17_logs/verify_green.log 2>&1
echo "VERIFY_RC=$?" >> r17_logs/green.status
python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/v17a > r17_logs/oracle_green.log 2>&1
echo "ORACLE_RC=$?" >> r17_logs/green.status
tail -2 r17_logs/oracle_green.log >> r17_logs/green.status
echo "$(date +%T) bench sf0.1 start" >> r17_logs/green.status
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_OUT=r17_logs/BENCH_BEFORE_r17.json sbt -batch "runMain graft.Bench" > r17_logs/bench_before.log 2>&1
echo "BENCH_RC=$?" >> r17_logs/green.status
echo "$(date +%T) all done" >> r17_logs/green.status
