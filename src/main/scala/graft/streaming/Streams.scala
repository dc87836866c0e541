package graft.streaming

import graft.{GraftQuery, Exact}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.util.concurrent.atomic.AtomicLong

/** SURVEY §2.4 — Structured Streaming over the events table. Each entry
  * drives a real streaming query (readStream → transform → memory sink,
  * processAllAvailable) and returns the sink table, so the driver's batch
  * oracle can hash-check streaming semantics. */
object Streams {
  import Exact._

  private val runId = new AtomicLong(0)

  private def eventsStream(s: SparkSession, d: String): DataFrame = {
    val schema = s.read.parquet(s"$d/events.parquet").schema // ts = nanos bigint
    // glob (not a bare file path): FileStreamSource requires a directory or
    // pattern to poll, exactly like a landing bucket in production
    s.readStream.schema(schema).option("basePath", d).parquet(s"$d/events.*")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  private def runToTable(s: SparkSession, df: DataFrame, mode: OutputMode): DataFrame = {
    val name = s"graft_stream_${runId.incrementAndGet()}"
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    s.table(name)
  }

  final case class Ev(user_id: Long, event_id: Long, us: Long)
  final case class Sess(user_id: Long, session_id: Long, n_events: Long,
      start_us: Long, end_us: Long)

  val defs: Seq[GraftQuery] = Seq(

    // 53. watermarked tumbling-window aggregation. Window origin is
    // epoch-aligned in both engines (Spark window() and DuckDB time_bucket).
    GraftQuery("st_window_agg", (s, d) => {
      val agg = eventsStream(s, d)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "6 hours"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumd(d2(col("value"))).as("total"))
        .select(unix_micros(col("window.start")).as("ws"),
          col("event_type"), col("n"), col("total"))
      // complete mode: finite replay must emit every window, incl. the last
      runToTable(s, agg, OutputMode.Complete())
    },
      Some("""SELECT epoch_us(time_bucket(INTERVAL '6 hours', ts)) AS ws,
             |  event_type, COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // 54. stateful sessionization via flatMapGroupsWithState — the
    // streaming twin of q_sessionize (same 30-min gap rule, same oracle).
    // On this finite replay the still-open session is emitted too, so the
    // result equals the batch definition.
    GraftQuery("st_sessionize", (s, d) => {
      import s.implicits._
      val evs = eventsStream(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .as[Ev]
      val sessions = evs.groupByKey(_.user_id)
        .flatMapGroupsWithState[Array[Ev], Sess](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          (user: Long, it: Iterator[Ev], state: GroupState[Array[Ev]]) =>
            val all = (state.getOption.getOrElse(Array.empty[Ev]) ++ it)
              .sortBy(e => (e.us, e.event_id))
            state.update(all)
            var sid = 0L
            val out = scala.collection.mutable.ArrayBuffer[Sess]()
            var start = 0L; var last = 0L; var n = 0L
            all.foreach { e =>
              if (n == 0L || e.us - last > 1800000000L) {
                if (n > 0) out += Sess(user, sid, n, start, last)
                sid += 1; start = e.us; n = 0L
              }
              last = e.us; n += 1
            }
            if (n > 0) out += Sess(user, sid, n, start, last)
            out.iterator
        }
      runToTable(s, sessions.toDF(), OutputMode.Append())
    },
      Some("""WITH x AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS us,
             |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
             |         OR LAG(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS brk
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id, us,
             |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
             |  FROM x)
             |SELECT user_id, session_id, COUNT(*) AS n_events,
             |  MIN(us) AS start_us, MAX(us) AS end_us
             |FROM s GROUP BY user_id, session_id""".stripMargin)),

    // 55b. stream-static enrichment join: the streaming side shuffles
    // nothing — the static dimension is broadcast into every micro-batch
    // (the standard pattern for dimension enrichment at 100 TB/day rates).
    GraftQuery("st_static_join", (s, d) => {
      import org.apache.spark.sql.functions.broadcast
      val dim = graft.Tables.t(s, d, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      val joined = eventsStream(s, d)
        .join(broadcast(dim), Seq("user_id"))
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumd(d2(col("value"))).as("total"))
      runToTable(s, joined, OutputMode.Complete())
    },
      Some("""SELECT c_mktsegment, event_type, COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
             |FROM events JOIN customer ON user_id = c_custkey
             |GROUP BY 1, 2""".stripMargin)),

    // 55c. sliding windows (6h window, 3h slide): every event lands in
    // exactly two windows; the oracle unrolls the same two bucket starts.
    GraftQuery("st_sliding_window", (s, d) => {
      val agg = eventsStream(s, d)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "6 hours", "3 hours"))
        .agg(count(lit(1)).as("n"), sumd(d2(col("value"))).as("total"))
        .select(unix_micros(col("window.start")).as("ws"), col("n"), col("total"))
      runToTable(s, agg, OutputMode.Complete())
    },
      Some("""WITH w AS (
             |  SELECT unnest([epoch_us(time_bucket(INTERVAL '3 hours', ts)),
             |                 epoch_us(time_bucket(INTERVAL '3 hours', ts) - INTERVAL '3 hours')]) AS ws,
             |         value
             |  FROM events)
             |SELECT ws, COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
             |FROM w GROUP BY ws""".stripMargin)),

    // 55d. streaming dedup: state-backed dropDuplicates on the dedup key —
    // the streaming twin of exact dedup for continuous ingestion.
    GraftQuery("st_dedup", (s, d) => {
      val dedup = eventsStream(s, d)
        .select(col("event_type"), col("value"))
        .dropDuplicates("event_type", "value")
      runToTable(s, dedup, OutputMode.Append())
    },
      Some("SELECT DISTINCT event_type, value FROM events"))
  )
}
