#!/bin/bash
# Finish the interrupted round-10 rebaseline: the session kill at ~20:42
# took down sf10 run 3's JVM mid-run (24 entries failed fast on a stopped
# SparkContext but the JSON still got written) — rerun it, pool the three
# clean sf10 runs, and fold the three committed BENCH artifacts.
# sf0.1 and sf1 pooled files are already complete at the same HEAD.
# Run with NO other sbt/spark process alive.
set -e
cd /root/repo

SF10=/tmp/sf10_r10
. "$(dirname "$0")/sf10_reg.sh"

echo "=== sf10 run 3 (replacing the kill-contaminated one) ==="
rm -f /tmp/bs10_3.json
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE=256 \
  sbt -batch "runMain graft.BenchScale $SF10 2 /tmp/bs10_3.json \"$REG\""

python3 tools/pool_mins.py /tmp/bs10_pooled.json /tmp/bs10_1.json /tmp/bs10_2.json /tmp/bs10_3.json

echo "=== fold artifacts ==="
python3 tools/mk_bench_sf1.py /tmp/bs01_pooled.json /tmp/bs1_pooled.json BENCH_sf1.json
python3 tools/mk_bench_sf10.py /tmp/bs01_pooled.json /tmp/bs10_pooled.json BENCH_sf10.json
python3 tools/mk_bench_all.py BENCH_ALL.json sf0.1=/tmp/bs01_pooled.json sf1=/tmp/bs1_pooled.json sf10=/tmp/bs10_pooled.json

echo "=== FOLD_DONE ==="
