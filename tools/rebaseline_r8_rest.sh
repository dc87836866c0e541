#!/bin/bash
# Remainder of the round-8 re-baseline after the BenchScale partial-dir
# warmup guard: sf10 pooled runs, artifact folds, plan audits, final
# clean Bench. Assumes /tmp/bs01_pooled.json + /tmp/bs1_pooled.json and
# the /tmp/sf1_r8b + /tmp/sf10_r8b tiles already exist.
set -e
cd /root/repo

SF01=/root/testdata/sf0.1
SF1=/tmp/sf1_r8b
SF10=/tmp/sf10_r8b

echo "=== sf10 pooled (3 runs x 2 iters, scale-critical subset incl. round-8 ops) ==="
REG='^(ann_ivf|ann_ivf_pq|ann_lsh|ann_pq|dd_bloom_gate|dd_cluster|dd_exact|dd_incremental|dd_minhash_lsh|dd_pipeline_indexed|dd_semantic|dd_semantic_hier|mm_phash|mm_phash_cluster|q_agg_basic|q_sessionize|st_interval_join|ta_line_dedup|ta_tfidf|dd_containment|dd_soft|ann_kmeans_refine|emb_quantize|st_left_join|q_funnel|ta_winnow)$'
for i in 1 2 3; do
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE=256 \
    sbt -batch "runMain graft.BenchScale $SF10 2 /tmp/bs10_$i.json \"$REG\""
done
python3 tools/pool_mins.py /tmp/bs10_pooled.json /tmp/bs10_1.json /tmp/bs10_2.json /tmp/bs10_3.json

echo "=== fold artifacts ==="
python3 tools/mk_bench_sf1.py /tmp/bs01_pooled.json /tmp/bs1_pooled.json BENCH_sf1.json
python3 tools/mk_bench_sf10.py /tmp/bs01_pooled.json /tmp/bs10_pooled.json BENCH_sf10.json
python3 tools/mk_bench_all.py BENCH_ALL.json sf0.1=/tmp/bs01_pooled.json sf1=/tmp/bs1_pooled.json sf10=/tmp/bs10_pooled.json

echo "=== plan audits (small stats + real sf1 stats) ==="
sbt -batch "runMain graft.PlanAudit /root/testdata/sf0.001 PLANS_r08.md"
sbt -batch "runMain graft.PlanAudit $SF1 PLANS_r08_sf1.md"

echo "=== clean driver-style bench (bench_detail.json) ==="
SPARK_GRAFT_SF_DIR=$SF01 sbt -batch "runMain graft.Bench" | tail -2

echo "=== DONE ==="
