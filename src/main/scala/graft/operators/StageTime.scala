package graft.operators

import graft.Tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timer for dd_pipeline (dev tool): times each pipeline
  * stage in isolation at a given sf dir to locate scaling hot spots. */
object StageTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.F.register(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val base = Tables.widened(spark, sfDir, "documents")
    time("warm gram3")(TextOps.warmGram3(spark, sfDir))
    val keepIds = base.groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id").persist()
    time("1 exact-dedup keepIds")(keepIds.count())
    val (shAll, sigsAll) = TextOps.gram3(spark, sfDir)
    val sigs = sigsAll.join(keepIds, "doc_id")
    val cand = time("2 band candidates")(
      Similarity.bandCandidates(sigs, "doc_id", 8, 8).persist())
    println(s"  candidates: ${time("2b count")(cand.count())}")
    val pre = time("3 sig prefilter")(
      cand.join(sigs.select(col("doc_id").as("ia"), col("sig").as("siga")), "ia")
        .join(sigs.select(col("doc_id").as("ib"), col("sig").as("sigb")), "ib")
        .withColumn("est", expr(
          "sig_agree(siga, sigb) / CAST(64 AS DOUBLE)"))
        .filter(col("est") >= 0.65).select("ia", "ib").persist())
    println(s"  prefiltered: ${time("3b count")(pre.count())}")
    val sh = shAll.join(keepIds, "doc_id")
    val dup = time("4 jaccard verify")(
      pre.join(sh.select(col("doc_id").as("ia"), col("sh").as("sha")), "ia")
        .join(sh.select(col("doc_id").as("ib"), col("sh").as("shb")), "ib")
        .filter(expr("jaccard_sim(sha, shb)") >= 0.8)
        .select(col("ib").as("doc_id")).distinct().persist())
    println(s"  dups: ${time("4b count")(dup.count())}")
    time("5 gates + full pipeline end-to-end")(
      graft.SparkEntry.queries("dd_pipeline")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
