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
REG='^(ann_ivf|ann_ivf_pq|ann_lsh|ann_pq|dd_bloom_gate|dd_cluster|dd_exact|dd_incremental|dd_minhash_lsh|dd_pipeline_indexed|dd_semantic|dd_semantic_hier|mm_phash|mm_phash_cluster|q_agg_basic|q_sessionize|st_interval_join|ta_line_dedup|ta_tfidf|dd_containment|dd_soft|ann_kmeans_refine|emb_quantize|st_left_join|q_funnel|ta_winnow|ann_nndescent|ta_dsir|ta_bpe_learn|ta_bpe_apply|emb_pca_power|ta_pipeline_curate|dd_span_scrub|ta_gopher_rules|ta_quality_prune|ta_ngram_lm|emb_centroid_gate|q_retention|q_gaps_islands|ta_pipeline_scrub|dd_chunk_dedup|ta_pii_scrub)$'

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
