package graft

/** One spec per SURVEY §2 operator: every registered query must run and
  * produce a well-formed result at sf0.001. (Value-level correctness is
  * the driver's DuckDB oracle gate — replicated by tools/verify_local.py;
  * these specs guard plan-level regressions in `sbt test`.) */
class QueriesSpec extends SparkSpec {

  /** Queries that legitimately may return zero rows at sf0.001. */
  private val mayBeEmpty = Set("dd_minhash_lsh", "ann_lsh", "dd_ngram_jaccard",
    "dd_embed_cosine", "q_join_anti", "q_subquery_in", "q_agg_having", "q_except")

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
}
