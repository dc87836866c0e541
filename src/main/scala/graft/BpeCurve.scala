package graft

import org.apache.spark.sql.SparkSession

/** Depth-cost curve for the batched BPE learner (SURVEY §5's vocabulary
  * axis): times `Curation2.bpeChainWith` end-to-end at a ladder of
  * iteration counts on SPARK_GRAFT_SF_DIR, printing one JSON line
  * {"iters": sec, ...}. The word count (the only corpus pass) is memoized
  * and warmed before timing, so each point measures the iteration chain —
  * the per-round snapshot cost whose linearity the lineage cut bought.
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.BpeCurve [iters...]" */
object BpeCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val ladder = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(5, 8, 16, 32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the memoized word count + JVM/codegen so point 1 isn't charged
    // the corpus pass the other points skip — at the CONFIGURED batch, so
    // an overridden-batch run warms the same code path it times
    operators.Curation2.bpeChainWith(spark, sfDir, 1, operators.Curation2.bpeBatch)._1
      .write.format("noop").mode("overwrite").save()
    val pts = ladder.map { it =>
      val t0 = System.nanoTime()
      val (merges, _) = operators.Curation2.bpeChainWith(spark, sfDir, it,
        operators.Curation2.bpeBatch)
      merges.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val n = merges.count()
      (it, sec, n)
    }
    val line = pts.map { case (it, sec, n) =>
      f""""$it":{"sec":$sec%.2f,"merges":$n}""" }.mkString("{", ",", "}")
    // single RESULT-prefixed line: consumers grep the marker, so Spark
    // shutdown noise interleaved into captured stdout can't corrupt it
    // (and no duplicate line for an all-JSON-lines parser to double-count)
    println("RESULT " + line)
    System.out.flush()
    operators.OpCache.release(spark)
    spark.stop()
  }
}
