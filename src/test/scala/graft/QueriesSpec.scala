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

  test("q_quantile_sketch: KMV sample is partitioning-invariant (mergeable by construction)") {
    // min-k of a union == min-k of the partials' mins — the property that
    // makes the sketch exact-reproducible at ANY parallelism. Same input,
    // adversarially different partitionings, identical sample sets.
    import org.apache.spark.sql.functions._
    val li = Tables.t(spark, sf, "lineitem").select(
        col("l_returnflag").as("grp"),
        (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as("id"))
      .withColumn("hk",
        conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
          .cast("long"))
    def sample(df: org.apache.spark.sql.DataFrame) =
      graft.plans.GraftOps.topKPerGroup(spark, df, Seq("grp"),
        Seq(("hk", true), ("id", true)), 256)
        .select("grp", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val one = sample(li.repartition(1))
    val many = sample(li.repartition(13, col("id") % 7))
    assert(one == many, "sample must be a deterministic function of the data")
  }

  test("q_quantile_sketch: exact in-regime (group ≤ capacity ⇒ est ≡ ex)") {
    // under the 256-row capacity the sample IS the group, so all three
    // estimates must equal the exact quantiles — the same in-regime
    // discipline as q_approx_topk. Crafted dir: ≤ 180 rows per flag.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val dir = specTempDir("qqsmall")
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_orderkey"),
      col("l_linenumber"))
    Tables.t(spark, sf, "lineitem")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 180)
      .drop("rn")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = SparkEntry.queries("q_quantile_sketch")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, m) = (r.getLong(1), r.getLong(2))
      assert(n <= 256 && m == n,
        s"crafted regime drifted: grp=${r.getString(0)} n=$n m=$m")
      assert(r.getLong(3) == r.getLong(4) && r.getLong(5) == r.getLong(6) &&
        r.getLong(7) == r.getLong(8),
        s"in-regime estimates must be exact: $r")
    }
  }
}
