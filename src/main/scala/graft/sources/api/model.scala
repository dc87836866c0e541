package graft.sources.api

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.types.StructType

/** The connector-side model, re-expressing the reference's virtual-table
  * contract Spark-first:
  *
  *   reference                          graft
  *   ---------------------------------  -----------------------------------
  *   QueryContext{columns,quals,limit}  QueryContext (table.go:28-33)
  *   Qual{field,operator,value}         Qual         (table.go:40-46)
  *   plugin.TableSchema key columns     KeyColumn    (table.go:180-215)
  *   xBestIndex range costing           ApiTable.splits qual narrowing
  *   LocalPluginStream row cursor       ApiTable.scan iterator (cursor.go)
  *   STEAMPIPE_CACHE / _CACHE_TTL       spark.graft.cache.enabled/.ttl (cache.go)
  *   steampipe_configure_<plugin>()     GraftConfigure.configure (configure_fn.go)
  */

/** One pushed-down constraint. Operators mirror mapping.go:34-60:
  * "=", ">", ">=", "<", "<=", plus "in" (value: Seq of normalized values —
  * the analog of SQLite decomposing IN into repeated `=` probes that each
  * hit xBestIndex, reference table.go:127-151). Values are
  * Catalyst-external (Long, Double, String, Boolean, epoch-micros Long for
  * timestamps, epoch-days Long for dates — reference mapping.go:108-158
  * parses TIMESTAMP/DATETIME qual strings the same way). */
final case class Qual(field: String, op: String, value: Any) extends Serializable

/** One pushed ORDER BY key (DSv2 TopN pushdown — beyond the reference,
  * whose vtables always enumerate in rowid order). */
final case class SortKey(field: String, descending: Boolean) extends Serializable

/** The scan contract handed to a plugin table (reference table.go:28-33).
  * `orderBy`/`offset` are set only when the plugin accepted a TopN/OFFSET
  * pushdown (supportsOrderedPage): splits() must then cover exactly the
  * rows at positions [offset, offset+limit) of the ordered stream, in
  * order — the API pagination shape `?sort=key&page=..&per_page=..`. */
final case class QueryContext(
    columns: Seq[String],
    quals: Seq[Qual],
    limit: Option[Long],
    orderBy: Seq[SortKey] = Nil,
    offset: Long = 0L) extends Serializable

/** Key-column declaration (reference: plugin.KeyColumn — required key
  * columns MUST appear as quals or the scan is rejected, table.go:180-215). */
final case class KeyColumn(
    name: String,
    required: Boolean,
    operators: Seq[String] = Seq("=")) extends Serializable

/** A unit of scan parallelism — the Spark analog of one plugin pagination
  * stream. A 1000-executor cluster fans out one split per API page range. */
trait ApiSplit extends Serializable

/** A plugin-backed table. Implementations must be Serializable (they are
  * shipped inside InputPartitions to executors) and deterministic. */
trait ApiTable extends Serializable {
  def name: String
  def schema: StructType
  /** Connection-config-dependent schema (reference configure_fn.go:104-125:
    * a reconfigure refetches the schema and drops/recreates the vtables).
    * Tables with static schemas just inherit `schema`. */
  def schemaFor(config: PluginConfig): StructType = schema
  def keyColumns: Seq[KeyColumn] = Nil

  /** Plan the scan: split the (qual-narrowed) key space. Called on the
    * driver; the reference's xBestIndex + pagination planning analog. */
  def splits(qc: QueryContext, config: PluginConfig): Seq[ApiSplit]

  /** Execute one split on an executor, yielding rows as Catalyst-internal
    * values (UTF8String for strings, micros Long for timestamps) in
    * qc.columns order — the cursor.Column() mapping of the reference. */
  def scan(split: ApiSplit, qc: QueryContext, config: PluginConfig): Iterator[Array[Any]]

  /** Estimated row count AFTER qual narrowing, if the plugin can tell
    * (e.g. a key range inverts to a count). Surfaced to Catalyst via
    * SupportsReportStatistics so a narrowed API scan becomes
    * broadcast-able — without it Spark assumes a connector table is huge
    * and sort-merge-joins a 50-row API page against a 100 TB fact table. */
  def estimatedRows(qc: QueryContext, config: PluginConfig): Option[Long] = None

  /** True if the plugin enforces this qual EXACTLY (e.g. key-range
    * narrowing), letting Spark drop its residual re-check — which in turn
    * unblocks LIMIT pushdown (a residual Filter node between Limit and the
    * scan stops Spark from pushing the limit). All other quals stay
    * belt-and-braces like the reference's Omit=false (table.go:127). */
  def exactlyHandled(q: Qual): Boolean = false

  /** True iff this table can answer `qc` — including its orderBy, offset
    * and limit — in closed form as ONE ordered split (the sorted-pagination
    * API shape). Spark then removes its own Sort/Limit/Offset entirely: a
    * `ORDER BY key LIMIT k OFFSET o` over a cloud API becomes one page
    * fetch instead of a full pagination + cluster-wide sort. Tables that
    * return true must make splits()/scan() honor the contract exactly. */
  def supportsOrderedPage(qc: QueryContext, config: PluginConfig): Boolean = false

  /** Upper bound (exclusive) of the key space currently available, if the
    * table supports ordered-key streaming (the API-polling shape: each
    * micro-batch reads the key range that appeared since the last one).
    * None ⇒ the table is batch-only. */
  def latestKey(config: PluginConfig): Option[Long] = None

  /** Closed-form PARTIAL aggregate for one split, if the plugin can answer
    * without enumerating rows (the API-count-endpoint shape). Called only
    * when every pushed qual is exactlyHandled (no residual re-check to
    * starve). Return one row with the partial values in `aggs` order;
    * Spark runs the final merge (SUM of counts, MIN of mins, MAX of maxs)
    * across splits. None ⇒ this agg set isn't answerable → Spark falls
    * back to the row scan. */
  def aggregateSplit(split: ApiSplit, qc: QueryContext, config: PluginConfig,
      aggs: Seq[AggSpec]): Option[Array[Any]] = None
}

/** One pushed-down aggregate: fn ∈ {"count_star", "min", "max"} with the
  * target field for min/max — the DSv2 SupportsPushDownAggregates surface
  * reduced to what a paginated API can realistically answer. */
final case class AggSpec(fn: String, field: Option[String]) extends Serializable

/** A connector plugin: a named family of tables (reference: one compiled
  * steampipe plugin per extension, register.go). */
trait Plugin extends Serializable {
  def name: String
  def tables: Seq[ApiTable]
  def table(t: String): ApiTable = tables.find(_.name == t)
    .getOrElse(throw new IllegalArgumentException(
      s"plugin '$name' has no table '$t' (has: ${tables.map(_.name).mkString(", ")})"))
}

/** Per-connection config (reference: connection config JSON/HCL,
  * configure_fn.go). Extend as plugins need. */
final case class PluginConfig(
    n: Long = 10000L,
    pageSize: Long = 2500L,
    extra: Map[String, String] = Map.empty) extends Serializable

/** Global connection registry (reference: pluginServer + pluginAlias
  * globals in module.go/register.go). Session-independent, like the
  * loadable extension's process-global state. */
object PluginRegistry {
  private val plugins = new ConcurrentHashMap[String, Plugin]()
  private val configs = new ConcurrentHashMap[String, PluginConfig]()

  register(SeqPlugin) // built-in demo plugins
  register(MetricsPlugin)
  register(DynPlugin)
  // declared from config only — no table code (reference generator parity).
  // A broken bundled descriptor must degrade to "no 'rest' plugin", not
  // poison every registry lookup with ExceptionInInitializerError.
  try register(DeclaredPlugin.fromResource("/graft/plugins/rest_demo.json"))
  catch {
    case e: Exception =>
      System.err.println(s"[graft] skipping declared plugin rest_demo.json: ${e.getMessage}")
  }

  def register(p: Plugin): Unit = plugins.put(p.name, p)
  def plugin(name: String): Plugin = Option(plugins.get(name))
    .getOrElse(throw new IllegalArgumentException(
      s"no plugin '$name' registered (has: ${names.mkString(", ")})"))
  def names: Seq[String] = {
    import scala.jdk.CollectionConverters._
    plugins.keySet().asScala.toSeq.sorted
  }
  def config(name: String): PluginConfig =
    Option(configs.get(name)).getOrElse(PluginConfig())
  def setConfig(name: String, c: PluginConfig): Unit = configs.put(name, c)
}

/** TTL result cache, per (table, split, query-context) — the reference's
  * query cache (cache.go; STEAMPIPE_CACHE / STEAMPIPE_CACHE_MAX_TTL env
  * controls ↔ GRAFT_CACHE / GRAFT_CACHE_MAX_TTL, constants.go:7-8).
  * JVM-local: on a cluster each executor caches its own splits, which is
  * exactly the locality you want.
  *
  * Bounded: LRU over a row-count weight budget, plus an expired-entry
  * sweep on every insert — a long-lived executor serving many distinct
  * (split, qual, config) keys stays within `maxWeight` rows instead of
  * pinning every split it ever read. */
object QueryCache {
  private case class Entry(deadlineMs: Long, rows: Vector[Array[Any]])
  /** Row-count budget across all entries (~tens of MB at typical widths). */
  @volatile var maxWeight: Long =
    sys.env.getOrElse("GRAFT_CACHE_MAX_ROWS", "1000000").toLong
  private val cache = new java.util.LinkedHashMap[String, Entry](64, 0.75f, true)
  private var weight = 0L
  val hits = new AtomicLong(0)
  val misses = new AtomicLong(0)

  def getOrFetch(key: String, ttlSeconds: Long)(fetch: => Iterator[Array[Any]]): Iterator[Array[Any]] = {
    val now = System.currentTimeMillis()
    cache.synchronized {
      val e = cache.get(key) // LRU touch
      if (e != null && e.deadlineMs > now) { hits.incrementAndGet(); return e.rows.iterator }
    }
    misses.incrementAndGet()
    val rows = fetch.toVector // fetch outside the lock: slow plugin calls must not serialize
    cache.synchronized {
      val prev = cache.put(key, Entry(now + ttlSeconds * 1000, rows))
      weight += rows.length - (if (prev != null) prev.rows.length else 0)
      // sweep expired first, then evict least-recently-used over budget
      val it = cache.entrySet().iterator()
      while (it.hasNext) {
        val en = it.next()
        if (en.getValue.deadlineMs <= now && en.getKey != key) {
          weight -= en.getValue.rows.length; it.remove()
        }
      }
      val lru = cache.entrySet().iterator()
      while (weight > maxWeight && lru.hasNext) {
        val en = lru.next()
        if (en.getKey != key) { weight -= en.getValue.rows.length; lru.remove() }
      }
    }
    rows.iterator
  }

  /** Content-stable key from the serialized forms of config/split/context —
    * not toString, which for non-case-class user splits degrades to
    * identity hashes (cache misses at best, cross-split collisions at
    * worst). */
  def stableKey(parts: Any*): String = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    parts.foreach(oos.writeObject)
    oos.close()
    val d = java.security.MessageDigest.getInstance("SHA-256").digest(bos.toByteArray)
    d.map(b => f"$b%02x").mkString
  }

  def size: Int = cache.synchronized(cache.size)
  def currentWeight: Long = cache.synchronized(weight)
  def clear(): Unit = cache.synchronized {
    cache.clear(); weight = 0; hits.set(0); misses.set(0)
  }
}

/** A transient plugin failure (rate limit, 5xx, connection reset): the
  * scan layer retries the split instead of failing the Spark task — the
  * reference SDK's RetryConfig/backoff analog, applied at the natural
  * retry unit (one split = one API page stream). Anything else propagates
  * and fails the task (which Spark then retries at task granularity). */
class TransientApiError(msg: String) extends RuntimeException(msg)

/** Test/observability ledger: records what actually reached the plugin
  * (the spec-level proof that pushdown works, not just that results match). */
object ScanLedger {
  val scans = new AtomicLong(0)
  val retries = new AtomicLong(0)
  @volatile var lastQc: Option[QueryContext] = None
  @volatile var lastSplitCount: Int = -1
  @volatile var lastRuntimeQuals: Seq[Qual] = Nil
  @volatile var lastPushedAggs: Seq[AggSpec] = Nil
  def record(qc: QueryContext): Unit = { scans.incrementAndGet(); lastQc = Some(qc) }
  def reset(): Unit = {
    scans.set(0); retries.set(0); lastQc = None; lastSplitCount = -1
    lastRuntimeQuals = Nil; lastPushedAggs = Nil
    FlakyTable.resetAttempts()
  }
}
