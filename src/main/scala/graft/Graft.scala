package graft

import org.apache.spark.sql.SparkSession

/** One-call session wiring for the whole library — the analog of loading
  * the reference's SQLite extension (`.load steampipe_sqlite_<plugin>`):
  * after init, the SQL surface has graft's functions, the planner has its
  * strategies and rewrite rules, and `graft.<plugin>.<table>` resolves. */
object Graft {
  def init(spark: SparkSession): SparkSession = {
    functions.F.register(spark)       // scalar + aggregate expressions
    plans.GraftOps.register(spark)    // TopK strategy + rewrite rule
    sources.api.GraftConfigure.ensureCatalog(spark) // graft.* catalog
    // env-controlled log level (reference logging.go: STEAMPIPE_LOG_LEVEL)
    sys.env.get("GRAFT_LOG_LEVEL").foreach(spark.sparkContext.setLogLevel)
    spark
  }

  /** Register an additional connector plugin (reference: one compiled
    * extension per plugin; here plugins co-exist in one registry). */
  def registerPlugin(p: sources.api.Plugin): Unit =
    sources.api.PluginRegistry.register(p)
}
