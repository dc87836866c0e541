package graft.operators

import graft.{GraftQuery, Tables, Exact}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet: write → read-back → verify
  * through the DuckDB oracle over the ORIGINAL table, so the round trip
  * must be lossless. (The reference is read-only over APIs; an engine
  * that replaces it still needs materialization formats.) */
object Sinks {
  import Exact._

  /** FIXED sink dir per (dataset, format), reused via Overwrite: a fresh
    * temp dir per call leaks one full dump per bench iteration — at the
    * sf10 tile that filled the disk mid-run (17 entries died on "No space
    * left" before this). Overwrite keeps the footprint at exactly one
    * dump per (dataset, format) no matter how often the entry runs. */
  private def sinkDir(d: String, kind: String): String = {
    val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_sink_${kind}_${java.lang.Integer.toHexString(d.hashCode)}")
    java.nio.file.Files.createDirectories(dir)
    dir.toString
  }

  private def roundTrip(s: SparkSession, d: String, format: String) = {
    val dir = sinkDir(d, format)
    val src = Tables.t(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    src.coalesce(4).write.mode(SaveMode.Overwrite)
      .option("header", "true").format(format).save(dir)
    val back = format match {
      case "csv" => s.read.schema(src.schema).option("header", "true").csv(dir)
      case _ => s.read.schema(src.schema).format(format).load(dir)
    }
    back.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sumd(d2(col("o_totalprice"))).as("total"),
        sum(col("o_custkey")).as("cust_sum"))
  }

  private val oracle =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
      |  CAST(SUM(o_custkey) AS BIGINT) AS cust_sum
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** One-time bucketed "index" build per data dir (the amortized write a
    * production pipeline does once); returns the two table names. */
  private val bucketed = new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()
  private def bucketedTables(s: SparkSession, d: String): (String, String) =
    bucketed.computeIfAbsent(d, _ => {
      val buckets = 8
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val lt = s"g_lineitem_b_$tag"
      val ot = s"g_orders_b_$tag"
      // the in-memory catalog forgets tables across sessions but their
      // warehouse directories persist; clear both before (re)writing
      Seq(lt, ot).foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS $t")
        val p = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir") + s"/$t")
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
      }
      Tables.t(s, d, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
        .write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(lt)
      Tables.t(s, d, "orders").select("o_orderkey", "o_orderpriority")
        .write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ot)
      (lt, ot)
    })

  val defs: Seq[GraftQuery] = Seq(
    GraftQuery("q_sink_csv", (s, d) => roundTrip(s, d, "csv"), Some(oracle)),
    GraftQuery("q_sink_json", (s, d) => roundTrip(s, d, "json"), Some(oracle)),
    // columnar alternative to parquet (predicate pushdown + striping —
    // the interchange format half the Hive-era lakehouse still speaks)
    GraftQuery("q_sink_orc", (s, d) => roundTrip(s, d, "orc"), Some(oracle)),

    // partitioned layout: write partitioned by a low-cardinality key, read
    // one partition back — the plan's PartitionFilters prove directory
    // pruning (only that partition's files are listed/scanned).
    GraftQuery("q_partitioned_scan", (s, d) => {
      val dir = sinkDir(d, "part")
      Tables.t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .write.mode(SaveMode.Overwrite)
        .partitionBy("o_orderpriority").parquet(dir)
      s.read.parquet(dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sumd(d2(col("o_totalprice"))).as("total"))
    },
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
             |FROM orders WHERE o_orderpriority = '1-URGENT'
             |GROUP BY o_orderpriority""".stripMargin)),

    // bucketing: persist both fact tables bucketed + sorted on the join
    // key, then join WITHOUT a shuffle (plan-spec-verified: no Exchange
    // above the bucketed scans). At 100 TB this is how repeated fact⋈fact
    // joins amortize their shuffle once at write time — so like any index,
    // the build runs ONCE per dataset (memoized below) and queries reuse
    // it; timing the build into every query would measure the wrong thing.
    GraftQuery("q_bucketed_join", (s, d) => {
      s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      val (lt, ot) = bucketedTables(s, d)
      s.table(lt)
        .join(s.table(ot), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sumd(d2(col("l_extendedprice")) * oneMinus(col("l_discount"))).as("revenue"))
    },
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
             |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority""".stripMargin))
  )
}
