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
    val dir = java.nio.file.Files.createTempDirectory("dqspec").toString
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
    val dir = java.nio.file.Files.createTempDirectory("dqempty").toString
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
}
