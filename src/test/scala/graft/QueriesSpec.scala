package graft

/** One spec per SURVEY §2 operator: every registered query must run and
  * produce a well-formed result at sf0.001. (Value-level correctness is
  * the driver's DuckDB oracle gate — replicated by tools/verify_local.py;
  * these specs guard plan-level regressions in `sbt test`.) */
class QueriesSpec extends SparkSpec {

  /** Queries that legitimately may return zero rows at sf0.001. */
  private val mayBeEmpty = Set("dd_minhash_lsh", "ann_lsh", "dd_ngram_jaccard",
    "dd_embed_cosine", "q_join_anti", "q_subquery_in", "q_agg_having", "q_except",
    "dd_edit_verify") // follows dd_minhash_lsh's candidate set

  SparkEntry.allDefs.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val df = q.run(spark, sf)
      assert(df.schema.fields.nonEmpty, "schema must be non-empty")
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("entry() flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("q_approx_topk exact-oracle precondition: per-source vocab ≤ capacity") {
    // the oracle hardcodes exact counts and err = 0, which only holds while
    // no Space-Saving eviction fires — i.e. distinct tokens per source stay
    // within the sketch capacity (256). Pin it so corpus growth can't
    // silently break the hash contract.
    import org.apache.spark.sql.functions._
    val vocab = Tables.widened(spark, sf, "documents")
      .select(col("source"),
        explode(expr("filter(split(text, ' '), t -> t <> '')")).as("token"))
      .groupBy("source").agg(countDistinct("token").as("nd"))
      .agg(max("nd")).head.getLong(0)
    assert(vocab <= 256,
      s"per-source vocab $vocab exceeds sketch capacity 256: q_approx_topk's " +
        "err=0 oracle is no longer exact — raise capacity or weaken the oracle")
  }
}
