#!/bin/bash
# Round-11 bench re-baseline at HEAD: regenerate sf1/sf10 tiles when stale
# (a reboot wipes /tmp; GenScale is deterministic given the base corpus),
# pooled BenchScale runs at three scales, fold into BENCH_sf1/BENCH_sf10/
# BENCH_ALL (now carrying {min, first} per entry), regenerate both plan
# audits, and finish with one clean driver-style Bench for
# bench_detail.json. Run with NO other sbt/spark process alive —
# concurrent JVMs contaminate every timing.
set -e
cd /root/repo

SF01=/root/testdata/sf0.1
SF1=/tmp/sf1_r10
SF10=/tmp/sf10_r11

echo "=== tile sf1 (10x) and sf10 (100x, ALL tables — r11 widened) ==="
# a tile older than the base corpus is from a previous driver regen, and a
# tile missing any expected table is a partial write from an interrupted
# GenScale — rebuild both (a partial tile would pass [ -d ] and silently
# fold wrong minima into BENCH_*.json)
expect_tables() { # $1 = tile dir, $2.. = table names
  local t=$1; shift
  for n in "$@"; do [ -e "$t/$n.parquet" ] || return 1; done
}
FULL="region nation customer supplier part orders lineitem events documents embeddings"
SUBSET="$FULL"
for spec in "$SF1:$FULL" "$SF10:$SUBSET"; do
  t=${spec%%:*}; tabs=${spec#*:}
  if [ -d $t ] && { [ $t/documents.parquet -ot $SF01/documents.parquet ] \
      || ! expect_tables $t $tabs; }; then
    echo "tile $t stale or partial — rebuilding"; rm -rf $t
  fi
done
[ -d $SF1 ] || sbt -batch "runMain graft.GenScale $SF01 $SF1 10"
[ -d $SF10 ] || sbt -batch "runMain graft.GenScale $SF01 $SF10 100"

echo "=== sf0.1 pooled (3 runs x 2 iters, full inventory) ==="
for i in 1 2 3; do
  sbt -batch "runMain graft.BenchScale $SF01 2 /tmp/bs01_$i.json"
done
python3 tools/pool_mins.py /tmp/bs01_pooled.json /tmp/bs01_1.json /tmp/bs01_2.json /tmp/bs01_3.json

echo "=== sf1 pooled (2 runs x 2 iters, full inventory) ==="
for i in 1 2; do
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE=256 \
    sbt -batch "runMain graft.BenchScale $SF1 2 /tmp/bs1_$i.json"
done
python3 tools/pool_mins.py /tmp/bs1_pooled.json /tmp/bs1_1.json /tmp/bs1_2.json

echo "=== sf10 pooled (3 runs x 2 iters, r11-widened ~130-entry set) ==="
. "$(dirname "$0")/sf10_reg.sh"
for i in 1 2 3; do
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE=256 \
    sbt -batch "runMain graft.BenchScale $SF10 2 /tmp/bs10_$i.json \"$REG\""
done
python3 tools/pool_mins.py /tmp/bs10_pooled.json /tmp/bs10_1.json /tmp/bs10_2.json /tmp/bs10_3.json

echo "=== fold artifacts ==="
python3 tools/mk_bench_sf1.py /tmp/bs01_pooled.json /tmp/bs1_pooled.json BENCH_sf1.json
python3 tools/mk_bench_sf10.py /tmp/bs01_pooled.json /tmp/bs10_pooled.json BENCH_sf10.json
python3 tools/mk_bench_all.py BENCH_ALL.json sf0.1=/tmp/bs01_pooled.json sf1=/tmp/bs1_pooled.json sf10=/tmp/bs10_pooled.json

echo "=== scale emptiness smoke (the silently-empty-at-scale class) ==="
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE=256 \
  sbt -batch "runMain graft.RowSmoke $SF1 SMOKE_sf1.json"
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE=256 \
  sbt -batch "runMain graft.RowSmoke $SF10 SMOKE_sf10.json"

echo "=== plan audits (small stats + real sf1 stats) ==="
sbt -batch "runMain graft.PlanAudit /root/testdata/sf0.001 PLANS_r11.md"
sbt -batch "runMain graft.PlanAudit $SF1 PLANS_r11_sf1.md"

echo "=== clean driver-style bench (bench_detail.json) ==="
SPARK_GRAFT_SF_DIR=$SF01 sbt -batch "runMain graft.Bench" | tail -2

echo "=== DONE ==="
