package graft.sources.api

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession

/** The reference's `steampipe_configure_<plugin>(config)` scalar function
  * (configure_fn.go): sets the connection config for a plugin, after which
  * new reads see the new schema/data. Spark-first shape: a programmatic
  * API plus catalog registration, instead of a SQLite scalar UDF.
  *
  * Accepts the JSON config form the reference accepts
  * (test.sql: '{"profile":"...", "regions":["*"]}'); unknown keys land in
  * `extra` exactly like plugin-specific connection options. */
object GraftConfigure {
  private val mapper = new ObjectMapper()

  def configure(spark: SparkSession, pluginAlias: String, configJson: String): PluginConfig = {
    val next = applyConfig(pluginAlias, configJson)
    // Re-expose the catalog so `graft.<plugin>.<table>` resolves against the
    // new config (the reference drops + recreates vtables, configure_fn.go:127+).
    ensureCatalog(spark)
    next
  }

  /** Session-free config application (used by the writable config table's
    * driver-side commit, ConfigTable.scala). */
  def applyConfig(pluginAlias: String, configJson: String): PluginConfig = {
    val node = mapper.readTree(configJson)
    val prev = PluginRegistry.config(pluginAlias)
    var next = prev
    val it = node.fields()
    val extra = scala.collection.mutable.Map[String, String](prev.extra.toSeq: _*)
    while (it.hasNext) {
      val e = it.next()
      e.getKey match {
        case "n" => next = next.copy(n = e.getValue.asLong())
        case "page_size" | "pageSize" => next = next.copy(pageSize = e.getValue.asLong())
        case k => extra(k) = e.getValue.asText()
      }
    }
    next = next.copy(extra = extra.toMap)
    PluginRegistry.setConfig(pluginAlias, next)
    next
  }

  /** Idempotent session wiring for `SELECT ... FROM graft.plugin.table`. */
  def ensureCatalog(spark: SparkSession): Unit =
    if (!spark.conf.getOption("spark.sql.catalog.graft").contains(classOf[GraftCatalog].getName))
      spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
}
