package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the data-quality family (SURVEY §2.3 #197-199).
  * The driver's oracle gate proves Spark-vs-DuckDB agreement on the real
  * tables — where every rule happens to pass; these tests inject CRAFTED
  * violations into a temp snapshot and pin each rule's exact count, so a
  * rule that silently stopped firing cannot stay green. */
class DataQualitySpec extends SparkSpec {

  private def run(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir)

  /** A snapshot with one violation of each kind: a NULL custkey, a
    * duplicated orderkey, a rejected status, a non-positive price, and
    * two rows whose custkey has no customer (the NULL one and an orphan). */
  private lazy val craftedDir: String = {
    import spark.implicits._
    val dir = specTempDir("dqspec")
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    Seq(
      (1L, Option(10L), "O", 100.0, "1-URGENT"),
      (2L, Option(10L), "F", 200.0, "2-HIGH"),
      (2L, Option(10L), "F", 200.0, "2-HIGH"), // duplicate orderkey: 1 surplus
      (3L, Option.empty[Long], "O", 300.0, "3-MEDIUM"), // NULL custkey (+ ref miss)
      (4L, Option(10L), "X", 400.0, "4-NOT SPECIFIED"), // rejected status
      (5L, Option(99L), "P", -5.0, "5-LOW")) // orphan custkey + non-positive price
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
      .withColumn("o_orderdate", lit(ts).cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(Tuple1(10L)).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    dir
  }

  /** The crafted snapshot with zero rows (same schema): the family must
    * keep its output contract on an empty ingest, not vanish. */
  private lazy val emptyDir: String = {
    val dir = specTempDir("dqempty")
    Tables.t(spark, craftedDir, "orders").limit(0)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Tables.t(spark, craftedDir, "customer").limit(0)
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    dir
  }

  test("empty snapshot: checks still report all rules, profile keeps one row per column") {
    val checks = run("dq_checks", emptyDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(checks.size == 6)
    assert(checks("min_rows:orders") == 1L, "min_rows must fire on an empty snapshot")
    assert(checks.filterNot(_._1 == "min_rows:orders").values.forall(_ == 0L))
    val prof = run("dq_profile", emptyDir).collect()
    assert(prof.length == 6, "one profile row per column even with zero input rows")
    assert(prof.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L &&
      r.getLong(3) == 0L && r.isNullAt(4) && r.isNullAt(6)))
    // drift on an empty snapshot is an empty (bucketless) report in BOTH
    // engines — pinned here so the agreement is a contract, not luck
    assert(run("dq_drift", emptyDir).count() == 0L)
  }

  test("dq_drift: negative prices land in their true negative bucket, not a sentinel") {
    val rows = run("dq_drift", craftedDir).collect()
    val buckets = rows.map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet
    assert(buckets.contains(Some(-1L)),
      s"the crafted -5.0 price must bucket to -1 (floor(-5/60000)); got $buckets")
  }

  test("dq_checks: each crafted violation is counted exactly once") {
    val rows = run("dq_checks", craftedDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rows.size == 6, s"expected 6 rules, got ${rows.keySet}")
    assert(rows("not_null:o_custkey") == ((1L, false)))
    assert(rows("positive:o_totalprice") == ((1L, false)))
    assert(rows("accepted_values:o_orderstatus") == ((1L, false)))
    assert(rows("min_rows:orders") == ((0L, true)))
    assert(rows("unique:o_orderkey") == ((1L, false)))
    // the NULL custkey matches no customer AND the orphan key 99 -> 2
    assert(rows("ref:o_custkey->customer") == ((2L, false)))
  }

  test("dq_checks: all six rules pass on the real snapshot") {
    val rows = run("dq_checks", sf).collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getBoolean(2)),
      s"unexpected violations: ${rows.filterNot(_.getBoolean(2)).mkString(",")}")
  }

  test("dq_profile: profile stats agree with directly-computed column stats") {
    val o = Tables.t(spark, sf, "orders")
    val nRows = o.count()
    val prof = run("dq_profile", sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.size == 6)
    assert(prof.values.forall(_.getLong(1) == nRows), "n_rows must be COUNT(*)")
    val key = prof("o_orderkey")
    val exp = o.agg(
      countDistinct("o_orderkey"), min(col("o_orderkey").cast("double")),
      max(col("o_orderkey").cast("double"))).head()
    assert(key.getLong(2) == 0L, "orderkey has no nulls")
    assert(key.getLong(3) == exp.getLong(0))
    assert(key.getDouble(4) == exp.getDouble(1))
    assert(key.getDouble(5) == exp.getDouble(2))
    assert(key.isNullAt(6) && key.isNullAt(7), "numeric columns carry no min_s/max_s")
    val st = prof("o_orderstatus")
    assert(st.isNullAt(4) && st.isNullAt(5), "string columns carry no min_n/max_n")
    assert(st.getString(6) <= st.getString(7))
    // the formatted timestamp column profiles as a string, zero-padded so
    // lexicographic min/max == chronological min/max
    val dt = prof("o_orderdate")
    assert(dt.getString(6).matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}"""))
  }

  test("dq_drift: counts partition the snapshot and tvd is the exact TVD") {
    val o = Tables.t(spark, sf, "orders")
    val rows = run("dq_drift", sf).collect()
    val nb = rows.map(_.getLong(1)).sum
    val nc = rows.map(_.getLong(2)).sum
    assert(nb + nc == o.count(), "base + current must partition the snapshot")
    val tvds = rows.map(_.getDouble(4)).distinct
    assert(tvds.length == 1, "tvd is one score denormalized onto every row")
    val expected = rows.map(r =>
      math.abs(r.getLong(1) * nc - r.getLong(2) * nb)).sum.toDouble /
      (2.0 * nb * nc)
    assert(tvds.head == expected, "tvd must be the exact int64-numerator TVD")
    assert(tvds.head >= 0.0 && tvds.head <= 1.0)
    assert(rows.forall(r => r.getBoolean(5) == (r.getDouble(4) > 0.1)))
    // contrib_num is the exact per-bucket numerator
    rows.foreach { r =>
      assert(r.getLong(3) == math.abs(r.getLong(1) * nc - r.getLong(2) * nb))
    }
  }

  /** Events crafted so every spike decision sits on a known side of the
    * exact-integer rule `n·H > 2·T ∧ n ≥ 5`:
    *  - type a: ten 5-event hours + one 50-event hour  -> only the burst spikes
    *  - type b: nine 1-event hours + one 4-event hour  -> over 2× mean but
    *    UNDER min-support -> not a spike
    *  - type c: hours (2, 2, 8): 8·3 == 2·12 exactly   -> boundary is NOT
    *    a spike (strict >)
    * and freshness types with lags 0 / exactly 1 h / 2 h against the
    * global watermark (strict > 1 h SLA). */
  private lazy val eventsDir: String = {
    import spark.implicits._
    val dir = specTempDir("dqevents")
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")
    val a = (0 until 10).flatMap(h => (0 until 5).map(m => ("a", ts(h, m)))) ++
      (0 until 50).map(m => ("a", ts(10, m)))
    val b = (0 until 9).map(h => ("b", ts(h, 0))) ++
      (0 until 4).map(m => ("b", ts(9, m)))
    val c = Seq(("c", ts(0, 0)), ("c", ts(0, 1)), ("c", ts(1, 0)),
      ("c", ts(1, 1))) ++ (0 until 8).map(m => ("c", ts(2, m)))
    // freshness: global watermark is type a's 10:49; "edge" trails by
    // exactly 3600s, "stale" by 7200s
    val f = Seq(("edge", ts(9, 49)), ("stale", ts(8, 49)))
    (a ++ b ++ c ++ f).toDF("event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("dq_anomaly: spike rule fires exactly where the crafted data says") {
    val rows = run("dq_anomaly", eventsDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(rows(("a", "2024-03-01 10:00:00")) == ((50L, 100L, 11L, true)),
      "the 50-event burst against a 100/11 baseline must flag")
    assert((0 until 10).forall(h =>
      !rows(("a", f"2024-03-01 $h%02d:00:00"))._4), "baseline hours stay quiet")
    assert(rows(("b", "2024-03-01 09:00:00")) == ((4L, 13L, 10L, false)),
      "over 2x mean but under min-support must NOT flag")
    assert(rows(("c", "2024-03-01 02:00:00")) == ((8L, 12L, 3L, false)),
      "n*H == 2*T exactly is the boundary — strict > must NOT flag")
  }

  test("dq_freshness: lag is exact microseconds against the global watermark") {
    val rows = run("dq_freshness", eventsDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(rows("a")._3 == 0L && !rows("a")._4, "the watermark type has zero lag")
    assert(rows("a")._2 == "2024-03-01 10:49:00")
    assert(rows("edge") == ((1L, "2024-03-01 09:49:00", 3600000000L, false)),
      "exactly-1h lag is NOT stale under the strict > SLA")
    assert(rows("stale") == ((1L, "2024-03-01 08:49:00", 7200000000L, true)))
  }

  test("st_anomaly is dq_anomaly row-for-row (the single-sourced spike rule cannot drift)") {
    val batch = run("dq_anomaly", sf).collect().map(_.toSeq).toSet
    val stream = run("st_anomaly", sf).collect().map(_.toSeq).toSet
    assert(stream == batch,
      s"streaming twin diverged: only-batch=${(batch -- stream).take(3)} " +
        s"only-stream=${(stream -- batch).take(3)}")
  }

  test("dq_anomaly / dq_freshness: empty stream keeps the (empty) output contract") {
    val dir = specTempDir("dqevempty")
    Tables.t(spark, eventsDir, "events").limit(0)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(run("dq_anomaly", dir).count() == 0L)
    assert(run("dq_freshness", dir).count() == 0L)
  }

  /** A fact/dimension star crafted so every orphan class is exercised:
    * planted-modulus keys (1009/997/991 — present in the parents, but the
    * audit probes the negated key, modelling a corrupted feed), a NATURAL
    * orphan (orders key 5 absent), and clean rows. */
  private lazy val refDir: String = {
    import spark.implicits._
    val dir = specTempDir("dqref")
    Seq((1L, 1L, 1L), (2L, 1L, 1L), (1009L, 1L, 1L), (5L, 1L, 1L),
      (1L, 997L, 991L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq(1L, 2L, 1009L).toDF("o_orderkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(1L, 997L).toDF("p_partkey")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq(1L, 991L).toDF("s_suppkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    dir
  }

  test("dq_referential: planted + natural orphans counted exactly, ppm integer-exact") {
    val rows = run("dq_referential", refDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // orders: key 1009 planted-corrupt (probe -1010) + key 5 naturally
    // absent -> 2 of 5; part/supplier: one planted each
    assert(rows("lineitem.l_orderkey->orders") == ((5L, 2L, 400000L)))
    assert(rows("lineitem.l_partkey->part") == ((5L, 1L, 200000L)))
    assert(rows("lineitem.l_suppkey->supplier") == ((5L, 1L, 200000L)))
  }

  test("dq_referential: empty fact table keeps three zero rows (ppm division guarded)") {
    val dir = specTempDir("dqrefempty")
    Tables.t(spark, refDir, "lineitem").limit(0)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    for (t <- Seq("orders", "part", "supplier"))
      Tables.t(spark, refDir, t)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    val rows = run("dq_referential", dir).collect()
    assert(rows.length == 3 &&
      rows.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L &&
        r.getLong(3) == 0L))
  }

  test("st_freshness is dq_freshness row-for-row (the single-sourced SLA rule cannot drift)") {
    val batch = run("dq_freshness", sf).collect().map(_.toSeq).toSet
    val stream = run("st_freshness", sf).collect().map(_.toSeq).toSet
    assert(stream == batch,
      s"streaming twin diverged: only-batch=${(batch -- stream).take(3)} " +
        s"only-stream=${(stream -- batch).take(3)}")
  }

  test("st_drift is its batch analog row-for-row (the single-sourced TVD tail cannot drift)") {
    val w = operators.DataQuality.stDriftWidth
    val ev = Tables.t(spark, sf, "events")
    def hist(even: Boolean, as: String) = ev
      .filter(if (even) col("event_id") % 2 === 0 else col("event_id") % 2 =!= 0)
      .groupBy(floor(col("value") / w).as("bucket"))
      .agg(count(lit(1)).as(as))
    val base = hist(even = true, "n_base")
    val curr = hist(even = false, "n_curr")
    val cts = base.join(curr, base("bucket") <=> curr("bucket"), "full_outer")
      .select(coalesce(base("bucket"), curr("bucket")).as("bucket"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_curr"), lit(0L)).as("n_curr"))
    val batch = operators.DataQuality.driftTail(spark, cts)
      .collect().map(_.toSeq).toSet
    val stream = run("st_drift", sf).collect().map(_.toSeq).toSet
    assert(stream == batch,
      s"streaming twin diverged: only-batch=${(batch -- stream).take(3)} " +
        s"only-stream=${(stream -- batch).take(3)}")
  }

  test("dq_outlier: exact median/MAD on crafted values, 3·MAD boundary NOT flagged") {
    import spark.implicits._
    val dir = specTempDir("dqoutlier")
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // type a: sorted values 1,1,1,2,3,3,3,9,100,200 → n=10, index rule
    // (n−1)·50 div 100 + 1 = 5 → med = 3; deviations sorted
    // 0,0,0,1,2,2,2,6,97,197 → mad = 2; threshold 3·mad = 6 — the value 9
    // (dev exactly 6) sits ON the boundary and must NOT flag (strict >),
    // leaving the two planted corruptions (100, 200) as the outliers.
    // type b: constant 5s → med 5, mad 0, zero outliers (nothing exceeds
    // a zero threshold strictly... except any deviation — there is none).
    val a = Seq(1.0, 1.0, 1.0, 2.0, 3.0, 3.0, 3.0, 9.0, 100.0, 200.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, ts, "a", v) }
    val b = Seq(5.0, 5.0, 5.0)
      .zipWithIndex.map { case (v, i) => (100L + i, ts, "b", v) }
    (a ++ b).toDF("event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = run("dq_outlier", dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(out("a") == ((10L, 3.0, 2.0, 2L)), s"type a: ${out("a")}")
    assert(out("b") == ((3L, 5.0, 0.0, 0L)), s"type b: ${out("b")}")
    assert(out.size == 2)
  }

  test("st_outlier is dq_outlier row-for-row (the single-sourced median/MAD tail cannot drift)") {
    val batch = run("dq_outlier", sf).collect().map(_.toSeq).toSet
    val stream = run("st_outlier", sf).collect().map(_.toSeq).toSet
    assert(stream == batch,
      s"streaming twin diverged: only-batch=${(batch -- stream).take(3)} " +
        s"only-stream=${(stream -- batch).take(3)}")
  }

  test("st_drift: a bucket on ONE side only surfaces as drift mass (full-outer pin)") {
    import spark.implicits._
    val dir = specTempDir("stdrift1")
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-03-01 00:$m%02d:00")
    // base (even ids): 4 rows in bucket 0; curr (odd ids): 2 in bucket 0
    // and 2 in bucket 10 (value 500) — a bucket the baseline never saw.
    // nb=nc=4; contribs |4*4-2*4|=8 and |0*4-2*4|=8 -> tvd 16/32 = 0.5
    val rows = Seq(
      (2L, ts(0), 10.0), (4L, ts(1), 10.0), (6L, ts(2), 10.0), (8L, ts(3), 10.0),
      (1L, ts(4), 10.0), (3L, ts(5), 10.0), (5L, ts(6), 500.0), (7L, ts(7), 500.0))
    rows.toDF("event_id", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = run("st_drift", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5)))).toMap
    assert(out(0L) == ((4L, 2L, 8L, 0.5, true)))
    assert(out(10L) == ((0L, 2L, 8L, 0.5, true)),
      "the curr-only bucket must appear with n_base = 0")
    assert(out.size == 2)
  }
}
