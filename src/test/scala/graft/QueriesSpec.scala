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

  test("st_topk is q_approx_topk row-for-row (the single-sourced ranking tail cannot drift)") {
    // below capacity both sketches are exact regardless of merge order —
    // including the stream's micro-batch boundaries — so the live monitor
    // must reproduce the batch entry bit-for-bit at spec scale.
    val batch = SparkEntry.queries("q_approx_topk")(spark, sf)
      .collect().map(_.toSeq).toSet
    val stream = SparkEntry.queries("st_topk")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(stream == batch,
      s"streaming twin diverged: only-batch=${(batch -- stream).take(3)} " +
        s"only-stream=${(stream -- batch).take(3)}")
  }

  test("st_quantile is q_quantile_sketch's estimate side row-for-row (min-k merges exactly)") {
    // the bottom-k sample is a deterministic function of the data multiset
    // (min-k of a union = min-k of the merged min-k's), so the streaming
    // aggregate must land on the batch sketch's exact sample — and hence
    // identical estimates — at EVERY scale, not just below capacity.
    val batch = SparkEntry.queries("q_quantile_sketch")(spark, sf)
      .select("grp", "m", "est_p50", "est_p90", "est_p99")
      .collect().map(_.toSeq).toSet
    val stream = SparkEntry.queries("st_quantile")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(stream == batch,
      s"streaming twin diverged: only-batch=${(batch -- stream).take(3)} " +
        s"only-stream=${(stream -- batch).take(3)}")
  }

  test("q_snapshot_diff: each churn class lands in its class, unchanged rows stay silent") {
    import spark.implicits._
    val dir = specTempDir("snapdiff")
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // keys chosen to hit every class: 5 unchanged (silent), 13 price-only,
    // 26 price+status (26 % 13 = 0 too), 97 removed, 101 add (and its own
    // 'changed'? no — 101 % 13 != 0, % 26 != 0, % 97 != 0 so the original
    // row is unchanged-silent while the clone -102 appears as added),
    // 1261 = 97·13 removed (removal wins over change: the key is absent
    // from B entirely)
    Seq(5L, 13L, 26L, 97L, 101L, 1261L)
      .map(k => (k, 1L, "O", 100.0, ts, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q_snapshot_diff")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(out(13L) == (("changed", true, false)))
    assert(out(26L) == (("changed", true, true)))
    assert(out(97L) == (("removed", false, false)))
    assert(out(1261L) == (("removed", false, false)))
    assert(out(-102L) == (("added", false, false)))
    assert(out.size == 5, s"unchanged keys must not appear: $out")
  }

  test("q_skyline: exact dominance frontier, ties kept, same-date losers pruned") {
    import spark.implicits._
    val dir = specTempDir("skyline")
    def day(n: Int) = java.sql.Timestamp.valueOf(f"2024-01-$n%02d 00:00:00")
    // (key, date, price): 1 @(d1,200) frontier; 2 @(d1,150) dominated by 4
    // (later date, equal price); 3 @(d2,150) frontier; 4 duplicates 3's
    // point (equal date+price — both non-dominated, both emitted);
    // 5 @(d3,100) frontier (latest date); 6 @(d3,50) dominated same-date
    Seq((1L, day(1), 200.0), (2L, day(1), 150.0), (3L, day(2), 150.0),
      (4L, day(2), 150.0), (5L, day(3), 100.0), (6L, day(3), 50.0))
      .map { case (k, d, p) => (k, 1L, "O", p, d, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val keys = SparkEntry.queries("q_skyline")(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(keys == Set(1L, 3L, 4L, 5L), s"skyline set wrong: $keys")
  }
}
