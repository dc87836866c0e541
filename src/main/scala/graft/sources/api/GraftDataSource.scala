package graft.sources.api

import java.util
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 provider — the Spark-idiomatic re-expression of the
  * reference's SQLite virtual-table module (module.go + table.go):
  *
  *   - SupportsPushDownFilters      ↔ xBestIndex qual pushdown (table.go:75)
  *   - SupportsPushDownRequiredColumns ↔ ColUsed bitmask (table.go:262)
  *   - SupportsPushDownLimit        ↔ SQLITE_INDEX_CONSTRAINT_LIMIT (table.go:56)
  *   - InputPartition (serialized QueryContext) ↔ IndexString JSON (table.go:224)
  *   - required-key validation at build() ↔ allRequiredKeyColsInConstraints
  *
  * Like the reference (ConstraintUsage.Omit=false keeps SQLite re-checking
  * every constraint), ALL filters are also returned as residual: the source
  * prunes, Spark re-verifies — belt and braces at zero extra shuffle cost.
  *
  * Usage: spark.read.format("graft").option("plugin","seq")
  *        .option("table","numbers").load()             — or —
  *        spark.sql("SELECT ... FROM graft.seq.numbers") via GraftCatalog. */
class GraftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  private def resolve(options: CaseInsensitiveStringMap): (Plugin, ApiTable) = {
    val plugin = PluginRegistry.plugin(
      Option(options.get("plugin")).getOrElse("seq"))
    val table = plugin.table(
      Option(options.get("table")).getOrElse(
        throw new IllegalArgumentException("option 'table' is required")))
    (plugin, table)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (plugin, table) = resolve(options)
    table.schemaFor(PluginRegistry.config(plugin.name))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val (plugin, table) = resolve(opts)
    // Config snapshot at load() time: one DataFrame = one connection view,
    // later GraftConfigure calls don't mutate plans already handed out.
    GraftTable(plugin.name, table, PluginRegistry.config(plugin.name))
  }

  override def supportsExternalMetadata(): Boolean = true
}

case class GraftTable(pluginAlias: String, table: ApiTable, config: PluginConfig)
    extends Table with SupportsRead {
  override def name(): String = s"$pluginAlias.${table.name}"
  // schema resolved against the SNAPSHOTTED config: a dynamic-schema plugin
  // (reference configure_fn.go:104-125) presents the post-configure schema
  // on the next load, while plans already handed out keep theirs
  override def schema(): StructType = table.schemaFor(config)
  override def capabilities(): util.Set[TableCapability] =
    if (table.latestKey(config).isDefined)
      util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
    else util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(pluginAlias, table, config)
}

class GraftScanBuilder(pluginAlias: String, table: ApiTable, config: PluginConfig)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit
    with SupportsPushDownTopN with SupportsPushDownOffset
    with SupportsPushDownAggregates {

  private var pushed: Array[Filter] = Array.empty
  private var requiredSchema: StructType = table.schemaFor(config)
  private var limit: Option[Long] = None
  private var topN: Option[(SortKey, Int)] = None
  private var pushedOffset: Int = 0
  private var pushedAggs: Option[Seq[AggSpec]] = None

  /** sources.Filter → Qual, for the operators the reference plugin
    * protocol understands (mapping.go:34-60) plus IN, which SQLite
    * decomposes into repeated `=` probes (table.go:127-151) — here one
    * Qual("in", values) the table may expand into one split per value. */
  private def toQual(f: Filter): Option[Qual] = f match {
    case sources.EqualTo(a, v) => norm(v).map(Qual(a, "=", _))
    case sources.GreaterThan(a, v) => norm(v).map(Qual(a, ">", _))
    case sources.GreaterThanOrEqual(a, v) => norm(v).map(Qual(a, ">=", _))
    case sources.LessThan(a, v) => norm(v).map(Qual(a, "<", _))
    case sources.LessThanOrEqual(a, v) => norm(v).map(Qual(a, "<=", _))
    case sources.In(a, vs) =>
      val normed = vs.toSeq.map(norm)
      if (normed.nonEmpty && normed.forall(_.isDefined))
        Some(Qual(a, "in", normed.flatten)) else None
    // LIKE 'prefix%' arrives as StringStartsWith; a plugin whose string
    // column embeds the key (s = 'row_<id>') inverts the prefix to exact
    // key ranges — the API "name begins with" filter answered at the source
    case sources.StringStartsWith(a, v) => Some(Qual(a, "starts_with", v))
    case _ => None
  }
  /** Typed qual values reach the plugin (reference mapping.go:108-158
    * parses TIMESTAMP/DATETIME the same way): timestamps → epoch micros,
    * dates → epoch days. Without this, an event-time range on an API table
    * degrades to a full pagination + residual filter. */
  private def norm(v: Any): Option[Any] = v match {
    case i: java.lang.Integer => Some(i.longValue())
    case l: java.lang.Long => Some(l)
    case s: java.lang.Short => Some(s.longValue())
    case d: java.lang.Double => Some(d)
    case f: java.lang.Float => Some(f.doubleValue())
    case s: String => Some(s)
    case b: java.lang.Boolean => Some(b)
    case t: java.sql.Timestamp =>
      Some(t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L)
    case i: java.time.Instant =>
      Some(Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L))
    case dt: java.time.LocalDateTime => // TimestampNTZ quals arrive as LocalDateTime
      Some(Math.addExact(Math.multiplyExact(
        dt.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L), dt.getNano / 1000L))
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case _ => None // unknown types: leave to Spark's residual filter
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => toQual(f).isDefined)
    // Exactly-handled quals are accepted (no residual) so Limit can reach
    // the scan; everything else stays residual (reference: Omit=false).
    filters.filterNot(f => toQual(f).exists(table.exactlyHandled))
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(required: StructType): Unit = requiredSchema = required
  override def pushLimit(l: Int): Boolean = { limit = Some(l.toLong); true }
  // One method serves BOTH SupportsPushDownLimit and SupportsPushDownTopN:
  // plain LIMIT stays partial (Spark re-applies it — splits each cut at
  // `limit` but several splits may run); an accepted TopN is answered
  // FULLY (one ordered page split), so Spark removes its Sort+Limit.
  override def isPartiallyPushed: Boolean = topN.isEmpty

  /** DSv2 TopN pushdown: `ORDER BY <key> [DESC] LIMIT n` becomes one
    * sorted page fetch when the plugin's key space is ordered (the
    * `?sort=key&per_page=n` API shape) — no pagination, no cluster sort.
    * Only taken when the table promises the full contract
    * (supportsOrderedPage), since Spark deletes its own Sort on a full
    * push. */
  override def pushTopN(orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      l: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.SortDirection
    if (orders.length != 1) return false
    val o = orders.head
    val key = o.expression() match {
      case n: org.apache.spark.sql.connector.expressions.NamedReference
          if n.fieldNames.length == 1 =>
        Some(SortKey(n.fieldNames.head, o.direction() == SortDirection.DESCENDING))
      case _ => None
    }
    key match {
      case Some(k) =>
        val quals = pushed.flatMap(toQual).toSeq
        val probe = QueryContext(requiredSchema.fieldNames.toSeq, quals,
          Some(l.toLong), Seq(k), 0L)
        if (quals.forall(table.exactlyHandled) &&
            table.supportsOrderedPage(probe, config)) {
          topN = Some((k, l)); true
        } else false
      case None => false
    }
  }

  /** OFFSET rides the accepted TopN (Spark pushes `LIMIT n OFFSET m` as
    * TopN(n+m) then offset m): the page starts m rows into the ordered
    * stream — `?page=` pagination answered at the source. */
  override def pushOffset(o: Int): Boolean = topN match {
    case Some(_) => pushedOffset = o; true
    case None => false
  }

  /** DSv2 aggregate pushdown (PARTIAL mode): a plugin that can answer
    * COUNT/MIN/MAX in closed form (the API count endpoint) returns one
    * partial row per split and Spark runs the final merge — no pagination
    * at all. Only taken when every pushed qual is exactly enforced: with a
    * residual re-check pending, a pushed aggregate would count rows Spark
    * might still drop. */
  override def pushAggregation(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case f: NamedReference if f.fieldNames.length == 1 => Some(f.fieldNames.head)
        case _ => None
      }
    if (agg.groupByExpressions.nonEmpty) return false
    val quals = pushed.flatMap(toQual).toSeq
    if (!quals.forall(table.exactlyHandled)) return false
    val specs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(AggSpec("count_star", None))
      case m: Min => fieldOf(m.column).map(f => AggSpec("min", Some(f)))
      case m: Max => fieldOf(m.column).map(f => AggSpec("max", Some(f)))
      case _ => None
    }
    if (specs.exists(_.isEmpty)) return false
    val flat = specs.flatten
    // probe the table once: can it answer this agg set in closed form?
    val qc = QueryContext(requiredSchema.fieldNames.toSeq, quals, None)
    val answerable = table.splits(qc, config).headOption
      .forall(s => table.aggregateSplit(s, qc, config, flat).isDefined)
    if (!answerable) return false
    pushedAggs = Some(flat)
    // readSchema must align positionally with the aggregate expressions
    requiredSchema = StructType(flat.map {
      case AggSpec("count_star", _) =>
        org.apache.spark.sql.types.StructField("count_star",
          org.apache.spark.sql.types.LongType, nullable = false)
      case AggSpec(fn, Some(f)) =>
        val src = table.schemaFor(config)(f)
        org.apache.spark.sql.types.StructField(s"$fn($f)", src.dataType, src.nullable)
      case other => throw new IllegalStateException(s"unreachable: $other")
    })
    true
  }

  override def build(): Scan = {
    val quals = pushed.flatMap(toQual).toSeq
    // Only push LIMIT to the source when it cannot change results: with
    // residual quals the source's early cut could starve Spark's re-check.
    // (Spark only calls pushLimit in that shape anyway; this is defensive.)
    val qc = topN match {
      case Some((key, l)) =>
        // Spark pushed TopN(limit+offset) then offset: the page to emit is
        // positions [offset, limit) of the ordered stream → limit field
        // carries the page SIZE, offset the page start.
        QueryContext(requiredSchema.fieldNames.toSeq, quals,
          Some(math.max(0L, l.toLong - pushedOffset)), Seq(key), pushedOffset.toLong)
      case None => QueryContext(requiredSchema.fieldNames.toSeq, quals,
        limit.filter(_ => quals.forall(table.exactlyHandled)))
    }
    // Required-key enforcement (reference table.go:180-215; it responds
    // with a max-cost plan so the plugin errors richly — we fail fast).
    val missing = table.keyColumns.filter(_.required)
      .filterNot(k => quals.exists(q => q.field == k.name && k.operators.contains(q.op)))
    if (missing.nonEmpty) throw new IllegalArgumentException(
      s"table '${table.name}' of plugin '$pluginAlias' requires quals on key column(s) " +
        s"${missing.map(_.name).mkString(", ")} (e.g. WHERE ${missing.head.name} = ...)")
    val spark = SparkSession.active
    // env controls mirror the reference's STEAMPIPE_CACHE /
    // STEAMPIPE_CACHE_MAX_TTL (constants.go:7-8, cache.go:11-33); the
    // Spark confs refine them per session
    val envEnabled = sys.env.get("GRAFT_CACHE").forall(_.toBoolean)
    val cacheEnabled = envEnabled &&
      spark.conf.get("spark.graft.cache.enabled", "true").toBoolean
    val envMaxTtl = sys.env.get("GRAFT_CACHE_MAX_TTL").map(_.toLong)
    val cacheTtl = math.min(
      spark.conf.get("spark.graft.cache.ttl", "300").toLong,
      envMaxTtl.getOrElse(Long.MaxValue))
    pushedAggs.foreach(a => ScanLedger.lastPushedAggs = a)
    GraftScan(pluginAlias, table, config, qc, requiredSchema, cacheEnabled, cacheTtl,
      pushedAggs)
  }
}

case class GraftScan(pluginAlias: String, table: ApiTable, config: PluginConfig,
    qc: QueryContext, prunedSchema: StructType, cacheEnabled: Boolean, cacheTtl: Long,
    pushedAggs: Option[Seq[AggSpec]] = None)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeV2Filtering {

  override def readSchema(): StructType = prunedSchema

  /** DSv2 runtime filtering — the v2 analog of dynamic partition pruning:
    * when this table is the probe side of a broadcast join on a key column,
    * Spark materializes the build side FIRST and hands its join-key values
    * here as an IN predicate, which the plugin turns into per-value probe
    * splits (the same path as vt_in_pushdown). A cloud-API table joined to
    * a 25-row dim then fetches 25 keys instead of paginating the account —
    * pruning decided at RUNTIME from data, not at plan time. */
  @transient private var runtimeQuals: Seq[Qual] = Seq.empty

  override def filterAttributes(): Array[NamedReference] =
    // only key columns that survived column pruning: Spark resolves these
    // against the scan OUTPUT, and a pruned-away key can't be filtered on
    table.keyColumns.map(_.name).filter(prunedSchema.fieldNames.contains)
      .map(Expressions.column).toArray

  override def filter(predicates: Array[Predicate]): Unit = {
    runtimeQuals = predicates.toSeq.flatMap(predicateToQual)
    ScanLedger.lastRuntimeQuals = runtimeQuals
  }

  private def predicateToQual(p: Predicate): Option[Qual] = {
    def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        // NamedReference/Literal are the public DSv2 faces (FieldReference/
        // LiteralValue are private[sql])
        case f: NamedReference if f.fieldNames.length == 1 => Some(f.fieldNames.head)
        case _ => None
      }
    def valueOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[Any] =
      e match {
        case l: Literal[_] => normLiteral(l)
        case _ => None
      }
    val ch = p.children()
    p.name() match {
      case "IN" if ch.length >= 2 =>
        val vs = ch.tail.toSeq.map(valueOf)
        for (f <- fieldOf(ch.head); if vs.forall(_.isDefined))
          yield Qual(f, "in", vs.flatten)
      case "=" if ch.length == 2 =>
        for (f <- fieldOf(ch(0)); v <- valueOf(ch(1))) yield Qual(f, "=", v)
      case _ => None
    }
  }

  /** LiteralValue carries Catalyst-internal values; normalize to the same
    * external forms as GraftScanBuilder.norm. */
  private def normLiteral(l: Literal[_]): Option[Any] = {
    import org.apache.spark.sql.types._
    l.dataType match {
      case LongType => Some(l.value.asInstanceOf[Long])
      case IntegerType => Some(l.value.asInstanceOf[Int].toLong)
      case ShortType => Some(l.value.asInstanceOf[Short].toLong)
      case StringType => Some(l.value.toString)
      case BooleanType => Some(l.value.asInstanceOf[Boolean])
      case DoubleType => Some(l.value.asInstanceOf[Double])
      case FloatType => Some(l.value.asInstanceOf[Float].toDouble)
      case TimestampType | TimestampNTZType => Some(l.value.asInstanceOf[Long])
      case DateType => Some(l.value.asInstanceOf[Int].toLong)
      case _ => None
    }
  }

  /** Compile-time context + runtime quals. The source-side limit is kept
    * only if the runtime quals are exactly enforced too (same safety rule
    * as build()). */
  private def effectiveQc: QueryContext =
    if (runtimeQuals.isEmpty) qc
    else QueryContext(qc.columns, qc.quals ++ runtimeQuals,
      qc.limit.filter(_ => runtimeQuals.forall(table.exactlyHandled)))
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftScan($pluginAlias.${table.name}, quals=[${qc.quals.mkString(", ")}], " +
      s"limit=${qc.limit.getOrElse(-1L)}, columns=[${qc.columns.mkString(",")}]" +
      (if (qc.orderBy.nonEmpty)
        s", orderBy=[${qc.orderBy.mkString(",")}], offset=${qc.offset}" else "") +
      pushedAggs.fold("")(a => s", aggs=[${a.mkString(",")}]") + ")"

  /** Qual-narrowed size estimate → Catalyst join planning: a key-narrowed
    * API page is broadcast-able instead of forcing a sort-merge join. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = table.estimatedRows(qc, config)
      .map(r => qc.limit.fold(r)(l => math.min(r, l)))
    override def numRows(): java.util.OptionalLong =
      rows.fold(java.util.OptionalLong.empty())(java.util.OptionalLong.of)
    override def sizeInBytes(): java.util.OptionalLong =
      rows.fold(java.util.OptionalLong.empty())(r =>
        java.util.OptionalLong.of(r * (24L * prunedSchema.size + 16L)))
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val eqc = effectiveQc
    val ss = table.splits(eqc, config)
    ScanLedger.lastSplitCount = ss.length
    ss.map(s => GraftInputPartition(s, eqc): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    GraftReaderFactory(pluginAlias, table, config, cacheEnabled, cacheTtl, pushedAggs)

  /** Streaming read of an ordered-key plugin table — the API-polling shape
    * as a first-class Structured Streaming source (beyond the batch-only
    * reference): the offset is a key-space position; each micro-batch scans
    * the [start, end) range that appeared since the last trigger, through
    * the same split/pushdown machinery as the batch path. */
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftMicroBatchStream(this)
}

/** Key-space offset (json = the exclusive upper key already ingested). */
case class GraftKeyOffset(key: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = key.toString
}

class GraftMicroBatchStream(scan: GraftScan)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  override def initialOffset(): Offset = GraftKeyOffset(0L)
  override def latestOffset(): Offset =
    GraftKeyOffset(scan.table.latestKey(scan.config).getOrElse(0L))
  override def deserializeOffset(json: String): Offset = GraftKeyOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[GraftKeyOffset].key
    val hi = end.asInstanceOf[GraftKeyOffset].key
    // the batch's key window rides in as ordinary range quals on the
    // table's (first) key column, so the plugin's own narrowing + paging
    // logic plans the micro-batch
    val keyCol = scan.table.keyColumns.headOption.map(_.name).getOrElse("id")
    val qc = QueryContext(scan.qc.columns,
      scan.qc.quals ++ Seq(Qual(keyCol, ">=", lo), Qual(keyCol, "<", hi)), None)
    scan.table.splits(qc, scan.config)
      .map(s => GraftInputPartition(s, qc): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    GraftReaderFactory(scan.pluginAlias, scan.table, scan.config,
      cacheEnabled = false, scan.cacheTtl)
}

case class GraftInputPartition(split: ApiSplit, qc: QueryContext) extends InputPartition

case class GraftReaderFactory(pluginAlias: String, table: ApiTable,
    config: PluginConfig, cacheEnabled: Boolean, cacheTtl: Long,
    pushedAggs: Option[Seq[AggSpec]] = None)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    new PartitionReader[InternalRow] {
      private val it: Iterator[Array[Any]] = {
        // pushed aggregate: one closed-form partial row per split, no
        // pagination, no cache involvement (nothing heavy to cache)
        // Transient API failures retry at split granularity (the reference
        // SDK's RetryConfig analog): a rate-limited page re-fetches without
        // failing the whole Spark task. Attempt count from connection
        // config; backoff is skipped for determinism in local runs (a
        // production plugin sleeps inside its own scan()).
        def withRetry(f: => Iterator[Array[Any]]): Iterator[Array[Any]] = {
          val attempts = config.extra.get("retry_attempts").map(_.toInt).getOrElse(3)
          var last: Throwable = null
          var i = 0
          while (i < attempts) {
            try return f
            catch { case e: TransientApiError =>
              last = e; ScanLedger.retries.incrementAndGet()
            }
            i += 1
          }
          throw last
        }
        def fetch = pushedAggs match {
          case Some(aggs) =>
            Iterator.single(table.aggregateSplit(p.split, p.qc, config, aggs).getOrElse(
              throw new IllegalStateException(
                s"plugin accepted aggregate pushdown but returned no row for $aggs")))
          case None =>
            ScanLedger.record(p.qc); withRetry(table.scan(p.split, p.qc, config))
        }
        if (cacheEnabled && pushedAggs.isEmpty)
          // config is part of the key: two connections with identical splits
          // but different connection config must not share entries. The key
          // is content-hashed from serialized forms (a user-land non-case-
          // class split would make toString an identity hash — cache misses
          // at best, hash-collision row mixups at worst).
          QueryCache.getOrFetch(
            s"$pluginAlias/${table.name}/" +
              QueryCache.stableKey(config, p.split, p.qc), cacheTtl)(fetch)
        else fetch
      }
      private var current: Array[Any] = _
      override def next(): Boolean = { if (it.hasNext) { current = it.next(); true } else false }
      override def get(): InternalRow = new GenericInternalRow(current.asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}

/** TableCatalog exposing every registered plugin as a namespace:
  * `SELECT ... FROM graft.<plugin>.<table>` — the Spark analog of the
  * reference's dynamic-schema table registration (configure_fn.go:150+,
  * setupTables). Register once per session:
  * spark.conf spark.sql.catalog.graft = graft.sources.api.GraftCatalog */
class GraftCatalog extends TableCatalog {
  private var catalogName = "graft"
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val plugin = PluginRegistry.plugin(namespace.head)
    (plugin.tables.map(t => Identifier.of(namespace, t.name)) :+
      Identifier.of(namespace, "config")).toArray
  }
  override def loadTable(ident: Identifier): Table = {
    val plugin = PluginRegistry.plugin(ident.namespace().head)
    if (ident.name == "config") ConfigTable(plugin.name)
    else GraftTable(plugin.name, plugin.table(ident.name), PluginRegistry.config(plugin.name))
  }
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("graft tables are plugin-defined (read-only)")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft tables are read-only")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft tables are read-only")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft tables are read-only")
}
