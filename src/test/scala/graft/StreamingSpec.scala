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

  test("streaming sessionize equals batch sessionize on the same data") {
    val streamed = SparkEntry.queries("st_sessionize")(spark, sf)
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("q_sessionize")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }
}
