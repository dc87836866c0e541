package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of selected queries
  * (all, if no names given) so scan pushdown (PushedFilters/ReadSchema),
  * join strategies, and WholeStageCodegen spans can be inspected.
  * Usage: runMain graft.Explain [sfDir] [name ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val builder = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // extra confs (same contract as TimeQ): SPARK_GRAFT_CONF="k=v;k2=v2" —
    // e.g. dumping an eager AQE-off entry's plan under its execution conf
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n================ $n ================")
      try {
        // eager-by-design entries (stage counts at construction) would run
        // the full corpus and print a LocalRelation — show the lazy
        // substitute from the shared PlanContracts map instead
        val df = PlanContracts.eagerEntryAlternatives.get(n) match {
          case Some(alt) =>
            println("(entry is eager-by-design; showing its lazy chain — " +
              "see PlanContracts.eagerEntryAlternatives)")
            alt(spark, sfDir)
          case None => SparkEntry.queries(n)(spark, sfDir)
        }
        df.explain("formatted")
      }
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
