package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming semantics that the batch-parity oracles can't observe:
  * watermark discipline across multiple micro-batches. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("watermark drops events later than the threshold across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val agg = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(sum(col("v")).as("total"))
      .select(unix_micros(col("window.start")).as("ws"), col("total"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("wm_test").start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // batch 1: events at 10:05 and 10:31 → watermark advances to 10:21
    input.addData((ts(5), 1L), (ts(31), 10L))
    q.processAllAvailable()
    // batch 2: a late event for the (closed) 10:00 window → must be dropped
    input.addData((ts(6), 100L))
    q.processAllAvailable()
    // batch 3: 10:45 pushes the watermark past 10:31's window too
    input.addData((java.sql.Timestamp.valueOf("2024-01-01 10:59:00"), 0L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wm_test").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val w1000 = java.time.Instant.parse("2024-01-01T10:00:00Z").toEpochMilli * 1000L
    val w1030 = java.time.Instant.parse("2024-01-01T10:30:00Z").toEpochMilli * 1000L
    assert(rows.get(w1000).contains(1L), s"late event must NOT be counted: $rows")
    assert(rows.get(w1030).contains(10L), rows.toString)
  }

  test("dedup state survives a checkpointed restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = specTempDir("graft_ckpt")
    val out = specTempDir("graft_out")
    val input = MemoryStream[Long]
    def start() = input.toDF().toDF("k")
      .dropDuplicates("k")
      .writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt).format("parquet").start(out)
    val q1 = start()
    input.addData(1L, 2L, 3L)
    q1.processAllAvailable(); q1.stop()
    // restart from the checkpoint; re-send an old key + a new one
    val q2 = start()
    input.addData(2L, 4L)
    q2.processAllAvailable(); q2.stop()
    val keys = spark.read.parquet(out).collect().map(_.getLong(0)).toSeq
    assert(keys.sorted == Seq(1L, 2L, 3L, 4L),
      s"state must survive restart (2 must not duplicate): $keys")
  }

  test("AQE splits a skewed join partition (skew=true in final plan)") {
    import spark.implicits._
    val restore = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // one hot key (0) carries ~99% of the left side
      val left = spark.range(0, 200000)
        .select(org.apache.spark.sql.functions.when($"id" % 100 =!= 0, 0L)
          .otherwise($"id").as("k"), $"id".as("v"))
      val right = spark.range(0, 200000).select($"id".as("k"))
      val joined = left.join(right, "k")
      joined.queryExecution.toRdd.count() // run THIS QueryExecution to its final AQE plan
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), "AQE must split the hot partition:\n" + p)
    } finally restore.foreach { case (k, v) =>
      v match { case Some(x) => spark.conf.set(k, x); case None => spark.conf.unset(k) }
    }
  }

  test("streaming sessionize equals batch sessionize on the same data") {
    val streamed = SparkEntry.queries("st_sessionize")(spark, sf)
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("q_sessionize")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("sessionize state is O(users), not O(events)") {
    SparkEntry.queries("st_sessionize")(spark, sf).collect()
    val nUsers = Tables.t(spark, sf, "events")
      .select("user_id").distinct().count()
    val nEvents = Tables.t(spark, sf, "events").count()
    val stateRows = streaming.Streams.lastStateRows
    assert(stateRows >= 0, "state metrics must be captured")
    // only open sessions may remain in state: bounded by users (+ sentinel),
    // nowhere near event count
    assert(stateRows <= nUsers + 1,
      s"state rows $stateRows exceed user count $nUsers — state is not O(1)/user")
    assert(stateRows < nEvents / 2, s"state rows $stateRows scale with events $nEvents")
  }

  test("st_incremental: survivors join the index, dups never do") {
    // crafted corpus pinning the standing-index append semantics:
    //   index  A=1 (base text), 2/3 unique
    //   batch1 B=20 unique → SURVIVOR (appended), E=40 ≈ A → dup (NOT appended)
    //   batch2 C=30 ≈ B → must match the appended survivor
    //          F=50 ≡ E → matches A via the index, but NEVER oid=40
    val base = (0 until 40).map(i => s"w${i % 7}x$i").mkString(" ")
    val uniq1 = (0 until 40).map(i => s"q${i % 5}z$i").mkString(" ")
    val uniq2 = (0 until 40).map(i => s"m${i % 3}k$i").mkString(" ")
    val bText = (0 until 40).map(i => s"b${i % 6}y$i").mkString(" ")
    val eText = base + " extra tail edit"
    val rows = Seq(
      (1L, base), (2L, uniq1), (3L, uniq2),            // standing index
      (20L, bText), (40L, eText),                      // delta batch 1
      (30L, bText + " later crawl copy"), (50L, eText) // delta batch 2
    )
    val dir = specTempDir("si_spec")
    import spark.implicits._
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("st_incremental")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((40L, 1L)), s"batch-1 dup vs index missing: $out")
    assert(out.contains((30L, 20L)),
      s"batch-2 doc must match the APPENDED batch-1 survivor: $out")
    assert(out.contains((50L, 1L)),
      s"batch-2 copy of the dup still matches the original index doc: $out")
    assert(!out.exists(_._2 == 40L),
      s"a batch-1 DUP must never be appended to the index: $out")
    assert(out.map(_._1) == Set(30L, 40L, 50L), s"unexpected extra pairs: $out")
  }

  test("st_cdc: cross-batch last-writer-wins with tombstones, both conflict orders") {
    // batches split by EVENT-id parity (even → batch 1, odd → batch 2),
    // so every user below has changes in BOTH batches:
    //   u1: upsert(t1) in b1, delete(t2) in b2     → deleted
    //   u2: delete(t2) in b1, upsert(t1) in b2     → later-APPLIED but
    //       older-TS update must NOT resurrect      → deleted
    //   u3: delete(t1) in b1, upsert(t2) in b2     → resurrected, v=7
    //   u4: single upsert in b1                     → present, v=4
    //   u5: two upserts in b2 (in-batch LWW)        → present, v=2
    val dir = specTempDir("cdc_spec")
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val rows = Seq(
      (2L, t(1), 1L, "purchase", 1.0), (3L, t(2), 1L, "error", 0.0),
      (4L, t(2), 2L, "error", 0.0), (5L, t(1), 2L, "purchase", 5.0),
      (6L, t(1), 3L, "error", 0.0), (7L, t(2), 3L, "purchase", 7.0),
      (8L, t(1), 4L, "click", 4.0),
      (9L, t(1), 5L, "view", 1.0), (11L, t(2), 5L, "purchase", 2.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("st_cdc")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(3L -> 7.0, 4L -> 4.0, 5L -> 2.0),
      s"CDC final state wrong: $out")
  }
}
