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
  * "=", ">", ">=", "<", "<=". Values are Catalyst-external (Long, Double,
  * String, Boolean, epoch-micros Long for timestamps). */
final case class Qual(field: String, op: String, value: Any) extends Serializable

/** The scan contract handed to a plugin table (reference table.go:28-33). */
final case class QueryContext(
    columns: Seq[String],
    quals: Seq[Qual],
    limit: Option[Long]) extends Serializable

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
  def keyColumns: Seq[KeyColumn] = Nil

  /** Plan the scan: split the (qual-narrowed) key space. Called on the
    * driver; the reference's xBestIndex + pagination planning analog. */
  def splits(qc: QueryContext, config: PluginConfig): Seq[ApiSplit]

  /** Execute one split on an executor, yielding rows as Catalyst-internal
    * values (UTF8String for strings, micros Long for timestamps) in
    * qc.columns order — the cursor.Column() mapping of the reference. */
  def scan(split: ApiSplit, qc: QueryContext, config: PluginConfig): Iterator[Array[Any]]

  /** True if the plugin enforces this qual EXACTLY (e.g. key-range
    * narrowing), letting Spark drop its residual re-check — which in turn
    * unblocks LIMIT pushdown (a residual Filter node between Limit and the
    * scan stops Spark from pushing the limit). All other quals stay
    * belt-and-braces like the reference's Omit=false (table.go:127). */
  def exactlyHandled(q: Qual): Boolean = false
}

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
  * query cache (cache.go). JVM-local: on a cluster each executor caches
  * its own splits, which is exactly the locality you want. */
object QueryCache {
  private case class Entry(deadlineMs: Long, rows: Vector[Array[Any]])
  private val cache = new ConcurrentHashMap[String, Entry]()
  val hits = new AtomicLong(0)
  val misses = new AtomicLong(0)

  def getOrFetch(key: String, ttlSeconds: Long)(fetch: => Iterator[Array[Any]]): Iterator[Array[Any]] = {
    val now = System.currentTimeMillis()
    val e = cache.get(key)
    if (e != null && e.deadlineMs > now) { hits.incrementAndGet(); e.rows.iterator }
    else {
      misses.incrementAndGet()
      val rows = fetch.toVector
      cache.put(key, Entry(now + ttlSeconds * 1000, rows))
      rows.iterator
    }
  }
  def clear(): Unit = { cache.clear(); hits.set(0); misses.set(0) }
}

/** Test/observability ledger: records what actually reached the plugin
  * (the spec-level proof that pushdown works, not just that results match). */
object ScanLedger {
  val scans = new AtomicLong(0)
  @volatile var lastQc: Option[QueryContext] = None
  @volatile var lastSplitCount: Int = -1
  def record(qc: QueryContext): Unit = { scans.incrementAndGet(); lastQc = Some(qc) }
  def reset(): Unit = { scans.set(0); lastQc = None; lastSplitCount = -1 }
}
