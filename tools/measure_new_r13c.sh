#!/bin/bash
# Round-13 continuation-2: scale evidence for the six new entries
# (q_snapshot_diff, q_skyline, dq_outlier, st_topk, st_quantile,
# st_outlier) — sf10 sweep rows + bench at all three scales, spliced
# into the committed artifacts. Single-JVM discipline: run alone.
set -e
cd /root/repo
REG='^(q_snapshot_diff|q_skyline|dq_outlier|st_topk|st_quantile|st_outlier)$'
ONLY=q_snapshot_diff,q_skyline,dq_outlier,st_topk,st_quantile,st_outlier
SF1=${SF1TILE:-/tmp/sf1_r10}
SF10=${SF10TILE:-/tmp/sf10_r10}

# sf1 sweep rows for st_outlier (the other five already recorded)
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE=256 \
  sbt -batch "runMain graft.Verify $SF1 /tmp/vs1b \"^(st_outlier)$\""
python3 tools/verify_sweep.py $SF1 /tmp/vs1b CORRECTNESS_sf1.json 900 st_outlier

# sf10 sweep rows for all six
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE=256 \
  sbt -batch "runMain graft.Verify $SF10 /tmp/vs10 \"$REG\""
python3 tools/verify_sweep.py $SF10 /tmp/vs10 CORRECTNESS_sf10.json 1800 $ONLY

# bench: pooled minima at the three scales
for i in 1 2 3; do
  sbt -batch "runMain graft.BenchScale /root/testdata/sf0.1 2 /tmp/n01_$i.json \"$REG\""
done
for i in 1 2; do
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE=256 \
    sbt -batch "runMain graft.BenchScale $SF1 2 /tmp/n1_$i.json \"$REG\""
done
for i in 1 2 3; do
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE=256 \
    sbt -batch "runMain graft.BenchScale $SF10 2 /tmp/n10_$i.json \"$REG\""
done
python3 tools/pool_mins.py /tmp/n01_pooled.json /tmp/n01_{1,2,3}.json
python3 tools/pool_mins.py /tmp/n1_pooled.json /tmp/n1_{1,2}.json
python3 tools/pool_mins.py /tmp/n10_pooled.json /tmp/n10_{1,2,3}.json
python3 tools/splice_bench_all.py BENCH_ALL.json \
  sf0.1=/tmp/n01_pooled.json sf1=/tmp/n1_pooled.json sf10=/tmp/n10_pooled.json
echo MEASURE_NEW_DONE
