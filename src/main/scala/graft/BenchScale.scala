package graft

import org.apache.spark.sql.SparkSession

/** Multi-iteration scaling bench: runs queries N times at a given sf dir
  * and reports per-query MIN and MEDIAN. The sf0.1 local bench has 3-4×
  * run-to-run variance on single runs (page cache/JIT), and BENCH_sf1's
  * own host-noise finding showed a byte-identical re-run moving a median
  * 9.1 s → 24.5 s while per-iteration minima stayed stable — so scaling
  * RATIOS read the minima (least-noise estimate of intrinsic cost);
  * medians are kept for dispersion context.
  *
  * Runs the FULL SparkEntry inventory by default; pass a regex to narrow
  * for quick iteration.
  *
  * Usage: runMain graft.BenchScale <sfDir> [iters=3] [outFile] [nameRegex] */
object BenchScale {
  /** Heaviest/scale-critical entries (round-4/5 subset) — kept as the
    * quick-iteration filter `subset`. */
  val subset: Seq[String] = Seq(
    "dd_pipeline", "dd_ngram_jaccard", "dd_cluster", "mm_phash_cluster",
    "mm_phash", "ann_pq", "ann_ivf", "ann_ivf_pq", "ann_lsh",
    "dd_semantic", "dd_semantic_hier",
    "dd_bloom_gate", "dd_exact", "ta_tfidf", "ta_line_dedup",
    "dd_canonical", "ta_bm25",
    "q_agg_basic", "q_join_inner", "q_sessionize")

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val outFile = args.lift(2).getOrElse("bench_scale.json")
    val nameFilter = args.lift(3).map(_.r)
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
    Graft.init(spark) // the standard session: functions + TopK strategy/rewrite + catalog

    // same warmup as Bench: hot page cache + built shared indexes +
    // bucketed tables + streaming staging, so the timed region measures
    // the operators, not one-time index builds. A GenScale table-subset
    // dir (the sf10 scale point) only carries the tables its entries
    // read — warm what exists, like verify_local's partial-dir guard.
    def has(t: String) = new java.io.File(s"$sfDir/$t.parquet").exists()
    Tables.all.filter(has).foreach(t => Tables.t(spark, sfDir, t)
      .write.format("noop").mode("overwrite").save())
    if (has("lineitem"))
      SparkEntry.queries("q_agg_basic")(spark, sfDir).write.format("noop")
        .mode("overwrite").save()
    if (has("lineitem") && has("orders"))
      SparkEntry.queries("q_bucketed_join")(spark, sfDir).write.format("noop")
        .mode("overwrite").save()
    operators.Similarity.warmSharedIndex(spark, sfDir)
    operators.Similarity.warmVecs(spark, sfDir)
    operators.TextOps.warmGram3(spark, sfDir)
    operators.Multimodal.warmPhashIndex(spark, sfDir)
    operators.Curation2.warmBpe(spark, sfDir)
    streaming.Streams.useTmpfsCheckpoints(spark) // replay ckpts are scratch
    streaming.Streams.warmStaging(spark, sfDir)

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => nameFilter.forall(_.findFirstIn(n).isDefined))
    // A failed iteration must NOT contribute its (near-zero) wall time as
    // a bogus minimum, and the failure must survive into the JSON — a
    // silently-corrupted min_total invalidates every scaling conclusion
    // downstream (tools/pool_mins.py refuses failed entries). NonFatal
    // only: an OOM should kill the run, not be recorded as a data point.
    // FIRST iteration kept alongside min: OpCache memos and entry-local
    // persists make later iterations reflect the warmest run, so the min
    // is the AMORTIZED cost and the first successful iteration is the
    // cold cost — both are real, and BENCH_ALL carries both.
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val times = (0 until iters).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench-scale] $name FAILED: ${e.getMessage}")
          None
        }
      }
      System.err.println(f"[bench-scale] $name: ${times.mkString("s, ")}s")
      // entry-scoped cache hygiene BETWEEN entries; within an entry the
      // iterations deliberately keep their persists (warm-min semantics)
      operators.OpCache.releaseScoped(spark)
      val sorted = times.sorted
      if (sorted.isEmpty) (name, None, None, None)
      else (name, Some(sorted.head), Some(sorted(sorted.length / 2)),
        Some(times.head))
    }
    def jnum(v: Option[Double]): String = v.fold("null")(x => f"$x%.3f")
    def jmap(f: ((String, Option[Double], Option[Double], Option[Double])) => Option[Double]): String =
      results.map { r => "\"" + r._1 + "\":" + jnum(f(r)) }.mkString("{", ",", "}")
    val failed = results.filter(_._2.isEmpty).map(_._1)
    val minTotal = results.flatMap(_._2).sum
    val medTotal = results.flatMap(_._3).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      f"""{"metric":"min_total","value":$minTotal%.3f,"median_total":$medTotal%.3f,"unit":"sec","iters":$iters,"n_queries":${results.size},"failed":$failedJson,"queries_min":${jmap(_._2)},"queries_median":${jmap(_._3)},"queries_first":${jmap(_._4)},"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"))
    println(line)
    operators.OpCache.release(spark)
    spark.stop()
  }
}
