package graft.sources.api

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Second demo plugin: a time-series "API" requiring a series_id key
  * (like a metrics backend that can only be queried per series) with
  * range-pushdown on t. Proves the registry/catalog host multiple plugins
  * side by side (the reference builds one extension per plugin;
  * register.go). Values are integer polynomials so DuckDB oracles are
  * exact. */
object MetricsPlugin extends Plugin {
  override def name: String = "metrics"
  override def tables: Seq[ApiTable] = Seq(SeriesTable)
}

object SeriesTable extends ApiTable {
  override def name: String = "series"
  override def schema: StructType = StructType(Seq(
    StructField("series_id", LongType, nullable = false),
    StructField("t", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  override def keyColumns: Seq[KeyColumn] = Seq(
    KeyColumn("series_id", required = true, operators = Seq("=")),
    KeyColumn("t", required = false, operators = Seq("=", ">", ">=", "<", "<=")))

  final case class SeriesSplit(sid: Long, start: Long, end: Long) extends ApiSplit

  /** t ranges are exactly enforced by split narrowing; series_id only for
    * `=` — splits() ignores series_id ranges, so claiming them exact would
    * make Spark drop a residual re-check the plugin never performs. */
  override def exactlyHandled(q: Qual): Boolean = q.value.isInstanceOf[Long] && (
    (q.field == "t" && Seq("=", ">", ">=", "<", "<=").contains(q.op)) ||
      (q.field == "series_id" && q.op == "="))

  override def estimatedRows(qc: QueryContext, config: PluginConfig): Option[Long] =
    Some(splits(qc, config).map { case SeriesSplit(_, lo, hi) => hi - lo }.sum)

  override def splits(qc: QueryContext, config: PluginConfig): Seq[ApiSplit] = {
    val sid = qc.quals.collectFirst { case Qual("series_id", "=", v: Long) => v }
      .getOrElse(return Nil)
    var lo = 0L
    var hi = config.n
    qc.quals.filter(_.field == "t").foreach { q =>
      val v = q.value.asInstanceOf[Long]
      q.op match {
        case "=" => lo = math.max(lo, v); hi = math.min(hi, v + 1)
        case ">" => lo = math.max(lo, v + 1)
        case ">=" => lo = math.max(lo, v)
        case "<" => hi = math.min(hi, v)
        case "<=" => hi = math.min(hi, v + 1)
        case _ =>
      }
    }
    (lo until hi by config.pageSize)
      .map(s => SeriesSplit(sid, s, math.min(s + config.pageSize, hi)))
  }

  override def scan(split: ApiSplit, qc: QueryContext, config: PluginConfig): Iterator[Array[Any]] = {
    val SeriesSplit(sid, lo, hi) = split: @unchecked
    val limit = qc.limit.getOrElse(Long.MaxValue)
    Iterator.range(lo, hi).take(if (limit > Int.MaxValue) Int.MaxValue else limit.toInt)
      .map { t =>
        val full = Map[String, Any](
          "series_id" -> sid,
          "t" -> t,
          "value" -> ((t * t * 31 + sid * 17) % 1000) / 10.0,
          "tag" -> UTF8String.fromString(s"s$sid"))
        qc.columns.map(full).toArray
      }
  }
}
