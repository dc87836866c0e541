package graft.sources.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.SparkSession

/** The reference's `steampipe_configure_<plugin>(config)` scalar function
  * (configure_fn.go): sets the connection config for a plugin, after which
  * new reads see the new schema/data. Spark-first shape: a programmatic
  * API plus catalog registration, instead of a SQLite scalar UDF.
  *
  * Accepts BOTH config forms the reference accepts (configure_fn.go:57-75
  * branches on the leading '{'): JSON ('{"profile": "...", "regions":
  * ["*"]}') and the HCL attribute form steampipe connection blocks use
  * (test.sql:6-8 inserts `profile = "silverwater"`). Unknown keys land in
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
    * driver-side commit, ConfigTable.scala). JSON when the text leads with
    * '{' (the reference's own dispatch rule), HCL attributes otherwise. */
  def applyConfig(pluginAlias: String, config: String): PluginConfig = {
    val fields: Seq[(String, JsonNode)] =
      if (config.trim.startsWith("{")) {
        val node = mapper.readTree(config)
        val b = Seq.newBuilder[(String, JsonNode)]
        val it = node.fields()
        while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
        b.result()
      } else parseHclAttributes(config)
    val prev = PluginRegistry.config(pluginAlias)
    var next = prev
    val extra = scala.collection.mutable.Map[String, String](prev.extra.toSeq: _*)
    fields.foreach { case (key, value) =>
      key match {
        case "n" => next = next.copy(n = value.asLong())
        case "page_size" | "pageSize" => next = next.copy(pageSize = value.asLong())
        // scalars keep their text form; arrays/objects keep compact JSON
        // (asText() on a container is "", which would drop the value)
        case k => extra(k) = if (value.isValueNode) value.asText() else value.toString
      }
    }
    next = next.copy(extra = extra.toMap)
    PluginRegistry.setConfig(pluginAlias, next)
    next
  }

  /** Minimal HCL attribute parser for connection configs: `key = value`
    * lines where value is a quoted string, number, bool, or a flat array
    * of those — the subset steampipe connection blocks actually use
    * (reference test.sql:6-8; configure_fn.go:57-75 hands non-JSON to the
    * HCL decoder). `#` / `//` comments and blank lines are skipped;
    * comment markers inside quoted strings are preserved. HCL scalar and
    * array literals in this subset are valid JSON, so each value parses
    * through the same Jackson path as JSON configs — one downstream
    * application semantics for both forms. */
  private[api] def parseHclAttributes(text: String): Seq[(String, JsonNode)] = {
    def stripComment(line: String): String = {
      val sb = new StringBuilder
      var inStr = false
      var esc = false
      var i = 0
      while (i < line.length) {
        val c = line.charAt(i)
        if (esc) { sb.append(c); esc = false }
        else if (inStr && c == '\\') { sb.append(c); esc = true }
        else if (c == '"') { sb.append(c); inStr = !inStr }
        else if (!inStr && (c == '#' || (c == '/' && i + 1 < line.length && line.charAt(i + 1) == '/')))
          return sb.toString
        else sb.append(c)
        i += 1
      }
      sb.toString
    }
    val attr = """^\s*([A-Za-z_][A-Za-z0-9_-]*)\s*=\s*(.+?)\s*$""".r
    text.linesIterator.map(stripComment).filter(_.trim.nonEmpty).map {
      case attr(key, value) =>
        val node =
          try mapper.readTree(value)
          catch {
            case e: Exception => throw new IllegalArgumentException(
              s"HCL config: unparseable value for '$key': $value", e)
          }
        key -> node
      case line => throw new IllegalArgumentException(
        s"HCL config: expected 'key = value', got: ${line.trim}")
    }.toSeq
  }

  /** Idempotent session wiring for `SELECT ... FROM graft.plugin.table`. */
  def ensureCatalog(spark: SparkSession): Unit =
    if (!spark.conf.getOption("spark.sql.catalog.graft").contains(classOf[GraftCatalog].getName))
      spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
}
