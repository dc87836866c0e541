package graft

import org.apache.spark.sql.SparkSession

/** Multi-iteration scaling bench: runs a fixed heavy-query subset N times
  * at a given sf dir and reports per-query MEDIANS — the sf0.1 local bench
  * has 3-4× run-to-run variance on single runs (page cache/JIT), so
  * scaling conclusions need medians over iterations at both scales.
  *
  * Usage: runMain graft.BenchScale <sfDir> [iters=3] [outFile] */
object BenchScale {
  /** Heaviest entries per BENCH_r04 + the quantizer/decontamination stack
    * whose 10× behavior this round changed. */
  val subset: Seq[String] = Seq(
    "dd_pipeline", "dd_ngram_jaccard", "dd_cluster", "mm_phash_cluster",
    "ann_pq", "ann_ivf", "ann_ivf_pq", "ann_lsh", "dd_semantic",
    "dd_bloom_gate", "dd_exact", "ta_tfidf", "ta_line_dedup",
    "q_agg_basic", "q_join_inner", "q_sessionize")

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val outFile = args.lift(2).getOrElse("bench_scale.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    // At sf ≥ 1 the sf0.1 default (one shuffle partition per core) makes
    // partitions outgrow executor memory and spill; raising the INITIAL
    // partition count and letting AQE coalesce small stages back down is
    // the scale-ready shape (SPARK_GRAFT_SHUFFLE=256 for the sf1 run).
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // same warmup as Bench: hot page cache + built shared indexes, so the
    // timed region measures the operators, not one-time index builds
    Tables.all.foreach(t => Tables.t(spark, sfDir, t).write.format("noop")
      .mode("overwrite").save())
    SparkEntry.queries("q_agg_basic")(spark, sfDir).write.format("noop")
      .mode("overwrite").save()
    operators.Similarity.warmSharedIndex(spark, sfDir)
    operators.TextOps.warmGram3(spark, sfDir)
    operators.Multimodal.warmPhashIndex(spark, sfDir)

    val results = subset.map { name =>
      val fn = SparkEntry.queries(name)
      val times = (0 until iters).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      System.err.println(f"[bench-scale] $name: ${times.mkString("s, ")}s")
      name -> times(times.length / 2)
    }
    val total = results.map(_._2).sum
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val line =
      f"""{"metric":"median_total","value":$total%.3f,"unit":"sec","iters":$iters,"queries":$qs,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"))
    println(line)
    spark.stop()
  }
}
