package graft.sources.api

import org.apache.spark.sql.types._

/** Demo plugin with a CONFIG-DEPENDENT schema — the reference refetches a
  * dynamic plugin's schema and drops/recreates its vtables when connection
  * config changes (configure_fn.go:104-125, setupTables :165-180). Here
  * the `wide` table exposes `id` plus one BIGINT column per name in
  * config.extra("cols") (comma-separated; default "a"); the j-th extra
  * column (1-based) has value id * (j + 1), so DuckDB oracles are exact. */
object DynPlugin extends Plugin {
  override def name: String = "dyn"
  override def tables: Seq[ApiTable] = Seq(WideTable)
}

object WideTable extends ApiTable {
  override def name: String = "wide"

  private def cols(config: PluginConfig): Seq[String] =
    config.extra.getOrElse("cols", "a")
      .split(",").toSeq.map(_.trim).filter(_.nonEmpty)

  override def schema: StructType = schemaFor(PluginConfig())
  override def schemaFor(config: PluginConfig): StructType =
    StructType(StructField("id", LongType, nullable = false) +:
      cols(config).map(c => StructField(c, LongType, nullable = false)))

  override def keyColumns: Seq[KeyColumn] =
    Seq(KeyColumn("id", required = false, operators = Seq("=", ">", ">=", "<", "<=")))

  override def exactlyHandled(q: Qual): Boolean =
    q.field == "id" && Seq("=", ">", ">=", "<", "<=").contains(q.op) &&
      q.value.isInstanceOf[Long]

  override def estimatedRows(qc: QueryContext, config: PluginConfig): Option[Long] =
    Some(splits(qc, config).map { case RangeSplit(lo, hi, _) => hi - lo }.sum)

  override def splits(qc: QueryContext, config: PluginConfig): Seq[ApiSplit] = {
    var lo = 0L
    var hi = config.n
    qc.quals.filter(_.field == "id").foreach { q =>
      q.value match {
        case v: Long => q.op match {
          case "=" => lo = math.max(lo, v); hi = math.min(hi, v + 1)
          case ">" => lo = math.max(lo, v + 1)
          case ">=" => lo = math.max(lo, v)
          case "<" => hi = math.min(hi, v)
          case "<=" => hi = math.min(hi, v + 1)
          case _ =>
        }
        case _ =>
      }
    }
    (lo until hi by config.pageSize)
      .map(s => RangeSplit(s, math.min(s + config.pageSize, hi)))
  }

  override def scan(split: ApiSplit, qc: QueryContext, config: PluginConfig): Iterator[Array[Any]] = {
    val RangeSplit(lo, hi, _) = split: @unchecked
    val names = cols(config)
    Iterator.range(lo, hi).map { i =>
      qc.columns.map {
        case "id" => i
        case c => i * (names.indexOf(c) + 2L)
      }.toArray[Any]
    }
  }
}
