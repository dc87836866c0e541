package graft

import org.apache.spark.sql.functions._

/** Invariants of the curation family (operators/Curation.scala) that the
  * row/hash oracle can't express: cluster-level keep cardinality, split
  * stratification, ranking monotonicity, data-card conservation. Run at
  * sf0.001 (and sf0.01 for the split proportions, which need ~100 docs
  * per source to be meaningful). */
class CurationSpec extends SparkSpec {

  private def run(name: String, dir: String = sf) =
    SparkEntry.queries(name)(spark, dir)

  test("dd_canonical: exactly one keep per cluster, and it has max quality") {
    val out = run("dd_canonical").cache()
    try {
      val perCluster = out.groupBy("cluster_id").agg(
        sum(when(col("keep"), 1).otherwise(0)).as("n_keep"),
        max("quality").as("qmax"))
      assert(perCluster.filter(col("n_keep") =!= 1).count() == 0,
        "every cluster must keep exactly one member")
      // the kept member's quality equals the cluster max
      val bad = out.filter(col("keep"))
        .join(perCluster, "cluster_id")
        .filter(col("quality") =!= col("qmax"))
      assert(bad.count() == 0, "kept member must have the max quality")
      // cluster ids are member doc_ids (min-label): every cluster_id exists
      val orphan = out.select("cluster_id").distinct()
        .join(out.select(col("doc_id")), col("cluster_id") === col("doc_id"),
          "left_anti")
      assert(orphan.count() == 0, "cluster_id must be a member doc_id")
    } finally { out.unpersist(); () }
  }

  test("dd_canonical keeps fewer docs than the corpus when near-dups exist") {
    // sf0.001 documents contain planted near-dup groups (same generator as
    // dd_minhash_lsh's); canonicalization must actually drop something.
    val out = run("dd_canonical")
    val total = out.count()
    val kept = out.filter(col("keep")).count()
    assert(kept > 0 && kept < total,
      s"expected 0 < kept < $total, got $kept")
  }

  test("ta_split: deterministic, exhaustive, and stratified per source") {
    val a = run("ta_split", "/root/testdata/sf0.01").cache()
    try {
      // deterministic: a second run is identical
      val b = run("ta_split", "/root/testdata/sf0.01")
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
      // exhaustive partition of the corpus
      val n = Tables.t(spark, "/root/testdata/sf0.01", "documents").count()
      assert(a.count() == n)
      // stratification: corpus-wide train share within 3σ of 0.8
      // (n=500 Bernoulli(0.8): σ≈1.8pp), and no source drifts past its
      // own 3σ envelope (sf0.01 sources hold only 25 docs: σ=8pp)
      val corpus = a.agg(
        (sum(when(col("split") === "train", 1).otherwise(0))
          / count(lit(1))).as("frac")).head.getDouble(0)
      assert(corpus > 0.746 && corpus < 0.854,
        s"corpus train fraction $corpus far from 0.8")
      val off = a.groupBy("source").agg(
        (sum(when(col("split") === "train", 1).otherwise(0))
          / count(lit(1))).as("frac"))
        .filter(col("frac") < 0.56 || col("frac") > 1.0 - 1e-9)
      assert(off.count() == 0, "a source's train fraction fell outside 3σ")
    } finally { a.unpersist(); () }
  }

  test("ta_bm25: ranks 1..10, scores strictly ordered, all terms indexed") {
    val rows = run("ta_bm25", "/root/testdata/sf0.01")
      .orderBy("rk").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L),
      "ranks must be exactly 1..10")
    val scores = rows.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y },
      "scores must be non-increasing in rank")
    assert(scores.forall(s => s > 0 && !s.isNaN && !s.isInfinite))
  }

  test("dd_split_leak reports only cross-split pairs, and canonicalization " +
    "eliminates them") {
    val leak = run("dd_split_leak").cache()
    try {
      assert(leak.filter(col("split_a") === col("split_b")).count() == 0)
      // the pipeline claim: every verified near-dup pair is an edge inside
      // one connected component, and dd_canonical keeps exactly one member
      // per component — so restricting the corpus to kept docs must leave
      // ZERO leaking pairs (dedup-then-split is leak-free by construction)
      val kept = run("dd_canonical").filter(col("keep")).select("doc_id")
      val survivors = leak
        .join(kept.withColumnRenamed("doc_id", "ia"), "ia")
        .join(kept.withColumnRenamed("doc_id", "ib"), "ib")
      assert(survivors.count() == 0,
        "a near-dup pair survived canonicalization")
    } finally { leak.unpersist(); () }
  }

  test("ta_source_stats: per-source rows conserve corpus totals") {
    val docs = Tables.t(spark, sf, "documents")
    val out = run("ta_source_stats").cache()
    try {
      assert(out.count() ==
        docs.select("source").distinct().count())
      val sumDocs = out.agg(sum("n_docs")).head.getLong(0)
      assert(sumDocs == docs.count(), "n_docs must sum to the corpus size")
      val bad = out.filter(
        col("exact_dup_rate") < 0.0 || col("exact_dup_rate") > 1.0 ||
          col("uniq_token_ratio") <= 0.0 || col("uniq_token_ratio") > 1.0 ||
          col("min_chars") > col("max_chars"))
      assert(bad.count() == 0, "ratio/envelope invariants violated")
    } finally { out.unpersist(); () }
  }

  test("ta_ngram_lm: scores are probabilities, corpus-trained docs never OOV") {
    val out = run("ta_ngram_lm").cache()
    try {
      val n = out.count()
      // every doc with >= 2 chars scores; none null (model trained on corpus)
      val expected = Tables.t(spark, sf, "documents")
        .filter(length(col("text")) >= 2).count()
      assert(n == expected, s"scored $n of $expected eligible docs")
      assert(out.filter(col("lm_score").isNull).count() == 0)
      // mean of conditional probabilities: strictly inside (0, 1)
      val bad = out.filter(col("lm_score") <= 0.0 || col("lm_score") >= 1.0).count()
      assert(bad == 0, s"$bad docs outside (0,1)")
      // the score separates docs (a constant score = a broken model)
      assert(out.select("lm_score").distinct().count() > 1)
    } finally { out.unpersist(); () }
  }

  test("ta_mix_temperature: weights normalize, budget never exceeded, " +
      "temperature flattens the source distribution") {
    val out = run("ta_mix_temperature").cache()
    try {
      val srcs = Tables.t(spark, sf, "documents").select("source").distinct().count()
      assert(out.count() == srcs)
      val wsum = out.agg(sum("weight")).head.getDouble(0)
      assert(math.abs(wsum - 1.0) < 1e-9, s"weights sum to $wsum")
      // floor() of per-source shares can only under-spend the budget
      val spent = out.agg(sum("expect_docs")).head.getLong(0)
      assert(spent <= 10000L && spent > 10000L - srcs,
        s"expected budget-floor spend in (${10000L - srcs}, 10000], got $spent")
      // τ=2 flattening: every weight sits between its proportional share
      // and the uniform share (sqrt pulls toward uniform, never past it)
      val total = Tables.t(spark, sf, "documents").count().toDouble
      val off = out.filter(
        (col("n_docs") / total < col("weight") && col("weight") > lit(1.0 / srcs) + 1e-12) ||
        (col("n_docs") / total > col("weight") && col("weight") < lit(1.0 / srcs) - 1e-12))
        .count()
      assert(off == 0, s"$off sources outside the [share, uniform] envelope")
    } finally { out.unpersist(); () }
  }
}
