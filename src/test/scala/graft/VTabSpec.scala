package graft

import graft.sources.api._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connector-layer semantics that results alone can't prove: what actually
  * reached the plugin (pushdown), required-key enforcement, TTL caching.
  * Reference behaviors: table.go (BestIndex), cache.go, configure_fn.go. */
class VTabSpec extends SparkSpec {

  private def numbers: DataFrame =
    spark.read.format("graft").option("plugin", "seq").option("table", "numbers").load()

  private def noCache[T](f: => T): T = {
    spark.conf.set("spark.graft.cache.enabled", "false")
    try f finally spark.conf.set("spark.graft.cache.enabled", "true")
  }

  test("qual pushdown narrows the key range to one split") {
    noCache {
      ScanLedger.reset()
      val n = numbers.filter(col("id") >= 2000L && col("id") < 2100L).count()
      assert(n == 100)
      assert(ScanLedger.lastSplitCount == 1, "id-range quals must prune splits")
      val qc = ScanLedger.lastQc.get
      assert(qc.quals.exists(q => q.field == "id" && q.op == ">="))
      assert(qc.quals.exists(q => q.field == "id" && q.op == "<"))
    }
  }

  test("column pruning reaches the plugin") {
    noCache {
      ScanLedger.reset()
      numbers.select("id", "j").filter(col("id") < 10L).collect()
      assert(ScanLedger.lastQc.get.columns.toSet == Set("id", "j"))
    }
  }

  test("non-key quals are pushed AND re-checked by Spark") {
    noCache {
      ScanLedger.reset()
      val n = numbers.filter(col("flag") === true && col("id") < 100L).count()
      assert(n == 50)
      assert(ScanLedger.lastQc.get.quals.exists(_.field == "flag"))
    }
  }

  test("pushed limit caps plugin work on key-only scans") {
    noCache {
      ScanLedger.reset()
      val rows = numbers.filter(col("id") >= 100L).select("id").limit(50).collect()
      assert(rows.length == 50)
      assert(ScanLedger.lastQc.get.limit.contains(50L))
    }
  }

  test("required key column enforced (reference table.go:180-215)") {
    val kv = spark.read.format("graft").option("plugin", "seq").option("table", "kv").load()
    val e = intercept[Exception] { kv.count() }
    assert(e.getMessage.contains("requires quals on key column"))
    // and with the key present it works like an API GET:
    val row = kv.filter(col("k") === 42L).collect().head
    assert(row.getAs[String]("val") == "v42" && row.getAs[Long]("k2") == 1764L)
  }

  test("TTL cache serves repeat scans without re-fetching (cache.go)") {
    QueryCache.clear()
    ScanLedger.reset()
    val q = numbers.filter(col("id") >= 5000L && col("id") < 5050L)
    q.count()
    val fetchesAfterFirst = ScanLedger.scans.get()
    assert(fetchesAfterFirst > 0)
    q.count() // identical QueryContext → served from cache
    assert(ScanLedger.scans.get() == fetchesAfterFirst, "second scan must hit cache")
    assert(QueryCache.hits.get() > 0)
  }

  test("cache TTL expiry forces a re-fetch") {
    QueryCache.clear()
    ScanLedger.reset()
    spark.conf.set("spark.graft.cache.ttl", "0") // immediate expiry
    try {
      val q = numbers.filter(col("id") >= 7000L && col("id") < 7010L)
      q.count()
      val first = ScanLedger.scans.get()
      Thread.sleep(5)
      q.count()
      assert(ScanLedger.scans.get() > first, "expired entry must re-fetch")
    } finally spark.conf.set("spark.graft.cache.ttl", "300")
  }

  test("configure changes connection config for subsequent loads (configure_fn.go)") {
    try {
      GraftConfigure.configure(spark, "seq", """{"n": 123}""")
      assert(numbers.count() == 123)
    } finally GraftConfigure.configure(spark, "seq", """{"n": 10000}""")
    assert(numbers.count() == 10000)
  }

  test("catalog SQL path resolves graft.<plugin>.<table>") {
    GraftConfigure.ensureCatalog(spark)
    val n = spark.sql("SELECT * FROM graft.seq.numbers WHERE id < 5").count()
    assert(n == 5)
    val tables = spark.sql("SHOW TABLES IN graft.seq").collect().map(_.getString(1)).toSet
    assert(tables == Set("numbers", "kv", "config"))
  }

  test("explain shows pushed filters and pruned schema") {
    val df = numbers.select("id", "x").filter(col("id") >= 9000L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftScan"), plan)
  }
}
