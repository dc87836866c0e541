#!/bin/bash
# The sf10 scale-critical entry set, shared by every script that runs the
# sf10 tile (rebaseline_r10.sh, finish_rebaseline_r10.sh). One definition:
# a drifted copy silently drops entries from the pooled artifacts because
# pool_mins.py intersects keys across runs.
REG='^(ann_ivf|ann_ivf_pq|ann_lsh|ann_pq|dd_bloom_gate|dd_cluster|dd_exact|dd_incremental|dd_minhash_lsh|dd_pipeline_indexed|dd_semantic|dd_semantic_hier|mm_phash|mm_phash_cluster|q_agg_basic|q_sessionize|st_interval_join|ta_line_dedup|ta_tfidf|dd_containment|dd_soft|ann_kmeans_refine|emb_quantize|st_left_join|q_funnel|ta_winnow|ann_nndescent|ta_dsir|ta_bpe_learn|ta_bpe_apply|emb_pca_power|ta_pipeline_curate|dd_span_scrub|ta_gopher_rules|ta_quality_prune|ta_ngram_lm|emb_centroid_gate|q_retention|q_gaps_islands|ta_pipeline_scrub|ta_pipeline_full|dd_chunk_dedup|ta_pii_scrub|mm_pipeline_curate|mm_pipeline_paired|dd_rep_rank|ta_sample_stratified|emb_recall_eval|emb_pq_recall_eval|st_pipeline_monitor|q_timeseries_fill|q_concurrency|dd_lsh_curve|dd_lsh_funnel)$'
