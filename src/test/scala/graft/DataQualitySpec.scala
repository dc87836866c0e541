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
