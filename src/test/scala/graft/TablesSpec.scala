package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Load-boundary contract for events.ts (Tables.tsNormalized): the driver's
  * generator has shipped the column as TIMESTAMP(NANOS) parquet (read as a
  * nanos BIGINT under nanosAsLong=true) in rounds ≤6 and as timestamp[us]
  * with no zone (read as TIMESTAMP_NTZ) from round 7's regen — both layouts
  * must normalize to the SAME session-zone TimestampType values so a future
  * regen in either direction changes nothing downstream. */
class TablesSpec extends SparkSpec {

  // one reference instant list, micros since epoch (UTC)
  private val micros = Seq(1704067200000000L, 1704070800123456L, 4102444800000000L)

  test("tsNormalized: nanos-BIGINT layout → TimestampType, values micros-exact") {
    import spark.implicits._
    val df = micros.map(_ * 1000L).toDF("ts") // nanos as long, like nanosAsLong=true reads
    val out = Tables.tsNormalized(df)
    assert(out.schema("ts").dataType === TimestampType)
    val got = out.select(unix_micros(col("ts"))).as[Long].collect().toSeq
    assert(got === micros)
  }

  test("tsNormalized: TIMESTAMP_NTZ layout → TimestampType, values micros-exact") {
    import spark.implicits._
    val df = micros.toDF("us")
      .select(expr("cast(timestamp_micros(us) as timestamp_ntz)").as("ts"))
    assert(df.schema("ts").dataType === TimestampNTZType)
    val out = Tables.tsNormalized(df)
    assert(out.schema("ts").dataType === TimestampType)
    val got = out.select(unix_micros(col("ts"))).as[Long].collect().toSeq
    assert(got === micros)
  }

  test("tsNormalized: already-TimestampType and ts-less frames pass through") {
    import spark.implicits._
    val ltz = micros.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    assert(Tables.tsNormalized(ltz).schema("ts").dataType === TimestampType)
    val none = Seq(1L, 2L).toDF("x")
    assert(Tables.tsNormalized(none).schema === none.schema)
  }

  test("driver testdata events loads with a TimestampType ts either way") {
    val ev = Tables.t(spark, sf, "events")
    assert(ev.schema("ts").dataType === TimestampType)
    // unix_micros is what every downstream entry applies; it must analyze
    assert(ev.select(unix_micros(col("ts"))).limit(1).count() === 1L)
  }

  test("both layouts round-trip parquet to identical normalized values") {
    import spark.implicits._
    val dir = specTempDir("graft_tables_spec")
    val nanosPath = s"$dir/nanos.parquet"
    val ntzPath = s"$dir/ntz.parquet"
    micros.map(_ * 1000L).toDF("ts").write.mode("overwrite").parquet(nanosPath)
    micros.toDF("us")
      .select(expr("cast(timestamp_micros(us) as timestamp_ntz)").as("ts"))
      .write.mode("overwrite").parquet(ntzPath)
    val a = Tables.tsNormalized(spark.read.parquet(nanosPath))
      .select(unix_micros(col("ts"))).as[Long].collect().toSeq.sorted
    val b = Tables.tsNormalized(spark.read.parquet(ntzPath))
      .select(unix_micros(col("ts"))).as[Long].collect().toSeq.sorted
    assert(a === b)
    assert(a === micros.sorted)
  }

  test("generator corpus text is single-byte: the MULTIMODAL byte-unit oracle contract") {
    // The multimodal family derives its synthetic payload from text and
    // its DuckDB oracles mix units throughout: duckF's per-bucket features
    // and the frame/phash chains build byte lists as ord(substr(text, i))
    // over range(1, strlen(text)+1) — strlen counts BYTES while substr
    // indexes CODEPOINTS — and the re-encode '+1' perturbation never wraps
    // a multi-byte unit the way the Scala byte arithmetic would. Those
    // coincide only on single-byte text. The r9/r10 codepoint fixes
    // (winnow_stats, char_shingles, simpson_stats, cdc_chunks) removed
    // this precondition for the TEXT kernels; the multimodal oracles still
    // carry it, so a driver regen that introduces multi-byte text must
    // fail HERE with a named cause instead of as unexplained
    // mm_phash/mm_pipeline_curate cross-engine mismatches.
    val nonAscii = Tables.t(spark, sf, "documents")
      .filter(length(col("text")) =!= octet_length(col("text"))).count()
    assert(nonAscii == 0,
      s"$nonAscii docs have multi-byte text — the multimodal oracle's " +
        "byte-unit equivalence (strlen/ord-substr) no longer holds; " +
        "rewrite the mm oracles byte-level or re-derive payloads " +
        "codepoint-level before trusting dd/mm cross-engine hashes")
  }

}
