package graft

/** One spec per SURVEY §2 operator: every registered query must run and
  * produce a well-formed result at sf0.001. (Value-level correctness is
  * the driver's DuckDB oracle gate — replicated by tools/verify_local.py;
  * these specs guard plan-level regressions in `sbt test`.) */
class QueriesSpec extends SparkSpec {

  /** Queries that legitimately may return zero rows at sf0.001 — shared
    * with the scale-tile smoke (RowSmoke), MINUS dd_split_leak: on scale
    * tiles an empty leak report is a clean split, but the base corpus
    * plants leaking near-dup pairs, so emptiness HERE is a regression. */
  private val mayBeEmpty = RowSmoke.mayBeEmpty - "dd_split_leak"

  /** SURVEY §6 rule, made lintable: no DecimalType output columns. Decimal
    * physical encodings differ across engines (Spark fixed-len-byte-array vs
    * DuckDB decimal128) and break the driver's hash even when values match —
    * exactly what sank emb_pca_power in round 8. Exact DECIMAL accumulation
    * inside a plan is fine; the FINAL projection must be long/double/string. */
  private def decimalPaths(dt: org.apache.spark.sql.types.DataType, at: String): Seq[String] = {
    import org.apache.spark.sql.types._
    dt match {
      case _: DecimalType     => Seq(at)
      case s: StructType      => s.fields.toSeq.flatMap(f => decimalPaths(f.dataType, s"$at.${f.name}"))
      case a: ArrayType       => decimalPaths(a.elementType, s"$at[]")
      case m: MapType         => decimalPaths(m.keyType, s"$at<key>") ++ decimalPaths(m.valueType, s"$at<val>")
      case _                  => Nil
    }
  }

  SparkEntry.allDefs.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val df = q.run(spark, sf)
      assert(df.schema.fields.nonEmpty, "schema must be non-empty")
      val dec = df.schema.fields.toSeq.flatMap(f => decimalPaths(f.dataType, f.name))
      assert(dec.isEmpty,
        s"${q.name} outputs DecimalType columns $dec — SURVEY §6 forbids decimal " +
          "outputs (hash-unstable across engines); cast the final column to STRING or DOUBLE")
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
