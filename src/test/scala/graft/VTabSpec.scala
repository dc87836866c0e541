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
      val n = numbers.filter(col("id") >= 2000L && col("id") < 2100L).collect().length
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
      val n = numbers.filter(col("flag") === true && col("id") < 100L).collect().length
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

  test("TopN+OFFSET fully pushed: one ordered page split, Sort/Limit removed") {
    noCache {
      ScanLedger.reset()
      val df = numbers.filter(col("id") < 5000L).select("id")
        .orderBy(col("id").desc).offset(1200).limit(7)
      val ids = df.collect().map(_.getLong(0)).toSeq
      assert(ids == (3793L to 3799L).reverse, s"got $ids")
      assert(ScanLedger.lastSplitCount == 1, "ordered page must be ONE split")
      val qc = ScanLedger.lastQc.get
      assert(qc.orderBy == Seq(SortKey("id", descending = true)))
      assert(qc.offset == 1200L && qc.limit.contains(7L))
      val plan = df.queryExecution.executedPlan.toString
      // physical sort operators print as "Sort [" / "TakeOrderedAndProject"
      // (bare "Sort" would also match SortKey in the scan description)
      assert(!plan.contains("Sort [") && !plan.contains("TakeOrdered"),
        "source answers the TopN fully; Spark must not re-sort\n" + plan)
    }
  }

  test("TopN on a non-key column is NOT pushed; Spark sorts") {
    noCache {
      ScanLedger.reset()
      val df = numbers.filter(col("id") < 100L).select("id", "x")
        .orderBy(col("x").asc, col("id").asc).limit(5)
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows.map(_._2) == rows.map(_._2).sorted)
      assert(ScanLedger.lastQc.get.orderBy.isEmpty, "x is not an ordered key")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrdered") || plan.contains("Sort"),
        "Spark must keep its own sort\n" + plan)
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
    q.collect() // row scan (an aggregate would push down and skip the cursor)
    val fetchesAfterFirst = ScanLedger.scans.get()
    assert(fetchesAfterFirst > 0)
    q.collect() // identical QueryContext → served from cache
    assert(ScanLedger.scans.get() == fetchesAfterFirst, "second scan must hit cache")
    assert(QueryCache.hits.get() > 0)
  }

  test("cache TTL expiry forces a re-fetch") {
    QueryCache.clear()
    ScanLedger.reset()
    spark.conf.set("spark.graft.cache.ttl", "0") // immediate expiry
    try {
      val q = numbers.filter(col("id") >= 7000L && col("id") < 7010L)
      q.collect()
      val first = ScanLedger.scans.get()
      Thread.sleep(5)
      q.collect()
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
    assert(tables == Set("numbers", "kv", "flaky", "config"))
  }

  test("explain shows pushed filters and pruned schema") {
    val df = numbers.select("id", "x").filter(col("id") >= 9000L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftScan"), plan)
  }

  test("IN-list pushdown probes one split per value (table.go:127-151)") {
    noCache {
      ScanLedger.reset()
      val n = numbers.filter(col("id").isin(5L, 777L, 8888L)).collect().length
      assert(n == 3)
      assert(ScanLedger.lastSplitCount == 3,
        s"IN must expand to per-value probe splits, got ${ScanLedger.lastSplitCount}")
      val q = ScanLedger.lastQc.get.quals.find(_.op == "in").get
      assert(q.field == "id" && q.value.asInstanceOf[Seq[Any]].toSet == Set(5L, 777L, 8888L))
    }
  }

  test("runtime filtering: broadcast build side narrows splits at RUNTIME " +
      "(SupportsRuntimeV2Filtering, the DSv2 DPP analog)") {
    noCache {
      ScanLedger.reset()
      val dim = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
        .filter(col("n_regionkey") === 1L).select(col("n_nationkey"))
      val n = numbers.join(dim, col("id") === col("n_nationkey"))
        .select("id", "x").count()
      assert(n == 5)
      assert(ScanLedger.lastRuntimeQuals.exists(q => q.field == "id" && q.op == "in"),
        s"runtime IN qual must reach the scan, got ${ScanLedger.lastRuntimeQuals}")
      assert(ScanLedger.lastSplitCount == 5,
        s"5 build-side keys must become 5 probe splits, got ${ScanLedger.lastSplitCount}")
    }
  }

  test("aggregate pushdown answers COUNT/MIN/MAX without any pagination " +
      "(SupportsPushDownAggregates partial mode)") {
    noCache {
      ScanLedger.reset()
      val r = numbers.filter(col("id") >= 1000L && col("id") < 9000L)
        .agg(count(lit(1)), min(col("id")), max(col("id"))).head()
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((8000L, 1000L, 8999L)))
      assert(ScanLedger.lastPushedAggs.map(_.fn) == Seq("count_star", "min", "max"),
        s"aggs must reach the builder, got ${ScanLedger.lastPushedAggs}")
      assert(ScanLedger.scans.get() == 0,
        "closed-form aggregates must not paginate the plugin")
    }
  }

  test("timestamp quals reach the plugin as epoch micros (mapping.go:108-158)") {
    noCache {
      ScanLedger.reset()
      val n = numbers.filter(
        col("ts") >= lit("2024-01-01 05:00:00").cast("timestamp_ntz") &&
          col("ts") < lit("2024-01-01 06:00:00").cast("timestamp_ntz")).collect().length
      assert(n == 60) // one row per minute
      assert(ScanLedger.lastSplitCount == 1, "ts range must narrow to one page")
      val quals = ScanLedger.lastQc.get.quals.filter(_.field == "ts")
      assert(quals.exists(q => q.op == ">=" &&
        q.value == 1704085200000000L)) // 2024-01-01T05:00Z micros
      assert(quals.exists(q => q.op == "<" && q.value == 1704088800000000L))
    }
  }

  test("dynamic schema refresh after configure (configure_fn.go:104-125)") {
    try {
      GraftConfigure.configure(spark, "dyn", """{"cols": "x,y"}""")
      val df1 = spark.sql("SELECT * FROM graft.dyn.wide WHERE id < 3")
      assert(df1.columns.toSeq == Seq("id", "x", "y"))
      GraftConfigure.configure(spark, "dyn", """{"cols": "z"}""")
      val df2 = spark.sql("SELECT * FROM graft.dyn.wide WHERE id < 3")
      assert(df2.columns.toSeq == Seq("id", "z"), "new load must see the new schema")
      // the pre-configure DataFrame keeps its snapshot (no mid-plan flip)
      assert(df1.columns.toSeq == Seq("id", "x", "y"))
      assert(df2.collect().map(_.getLong(1)).toSeq == Seq(0L, 2L, 4L)) // z = id * 2
    } finally GraftConfigure.configure(spark, "dyn", """{"cols": "a"}""")
  }

  test("query cache is size-bounded (LRU eviction, no unbounded growth)") {
    val oldMax = QueryCache.maxWeight
    QueryCache.clear()
    try {
      QueryCache.maxWeight = 100 // rows
      (0 until 50).foreach { i =>
        QueryCache.getOrFetch(s"key_$i", ttlSeconds = 300)(
          Iterator.fill(10)(Array[Any](i)))
      }
      assert(QueryCache.currentWeight <= 100,
        s"weight ${QueryCache.currentWeight} exceeds budget")
      assert(QueryCache.size <= 10, s"size ${QueryCache.size} not LRU-bounded")
      // most-recent entries survive
      var served = false
      QueryCache.getOrFetch("key_49", ttlSeconds = 300) {
        served = true; Iterator.empty
      }
      assert(!served, "most recent entry must still be cached")
    } finally { QueryCache.maxWeight = oldMax; QueryCache.clear() }
  }

  test("narrowed connector scan reports stats and broadcasts into a parquet join") {
    // without SupportsReportStatistics a connector table is assumed huge
    // and a 100-row API page would sort-merge-join a fact table
    val api = numbers.filter(col("id") >= 100L && col("id") < 200L)
      .select(col("id"), col("x"))
    val fact = Tables.t(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
    val joined = fact.join(api, col("l_orderkey") === col("id"))
    joined.queryExecution.toRdd.count()
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "narrowed API scan must broadcast:\n" + p)
  }

  test("LIKE-prefix qual inverts to exact key-range splits") {
    noCache {
      ScanLedger.reset()
      val rows = numbers.filter(col("s").startsWith("row_123"))
        .select("id").collect().map(_.getLong(0)).sorted
      assert(rows.toSeq == (123L +: (1230L to 1239L)).sorted,
        s"got ${rows.mkString(",")}")
      assert(ScanLedger.lastQc.get.quals.exists(q =>
        q.field == "s" && q.op == "starts_with"), "prefix qual must reach the plugin")
      assert(ScanLedger.lastSplitCount == 2,
        s"one split per magnitude range, got ${ScanLedger.lastSplitCount}")
    }
  }

  test("IN probes intersect pushed LIKE-prefix ranges (IN × starts_with)") {
    // regression pin for the exactlyHandled contract: both quals are
    // claimed exact, so Spark drops its residual LIKE — if the IN branch
    // of splits() ignored the prefix ranges, id=5 would leak back
    noCache {
      ScanLedger.reset()
      val rows = numbers
        .filter(col("id").isin(5L, 1230L) && col("s").startsWith("row_123"))
        .select("id").collect().map(_.getLong(0)).sorted
      assert(rows.toSeq == Seq(1230L), s"got ${rows.mkString(",")}")
      val quals = ScanLedger.lastQc.get.quals
      assert(quals.exists(q => q.field == "id" && q.op == "in"),
        s"IN qual must reach the plugin, got $quals")
      assert(quals.exists(q => q.field == "s" && q.op == "starts_with"),
        s"prefix qual must reach the plugin, got $quals")
      assert(ScanLedger.lastSplitCount == 1,
        s"only the prefix-surviving probe id=1230 may split, got ${ScanLedger.lastSplitCount}")
    }
  }

  test("metrics series_id RANGE quals stay residual (only '=' is exact)") {
    // SeriesTable.splits() ignores series_id ranges, so exactlyHandled must
    // NOT claim them — claiming exact would make Spark drop its residual
    // re-check and a range qual the plugin never enforces would leak the
    // whole enumerated sid page. (A plan-level `= AND >` probe folds to
    // false under ConstantPropagation before it reaches the scan, so the
    // contract is pinned at the API layer.)
    assert(SeriesTable.exactlyHandled(Qual("series_id", "=", 5L)),
      "series_id '=' is enforced by splits() and must be claimed exact")
    for (op <- Seq(">", ">=", "<", "<="))
      assert(!SeriesTable.exactlyHandled(Qual("series_id", op, 5L)),
        s"series_id '$op' is ignored by splits() and must stay residual")
    // and t ranges ARE enforced: claimed exact, splits narrowed accordingly
    noCache {
      ScanLedger.reset()
      val series = spark.read.format("graft")
        .option("plugin", "metrics").option("table", "series").load()
      val kept = series
        .filter(col("series_id") === 5L && col("t") >= 10L && col("t") < 110L)
        .collect()
      assert(kept.length == 100, s"expected the narrowed t page, got ${kept.length}")
      val qc = ScanLedger.lastQc.get
      assert(qc.quals.exists(q => q.field == "series_id" && q.op == "="),
        s"required key must reach the plugin, got ${qc.quals}")
      assert(qc.quals.count(_.field == "t") == 2,
        s"both t bounds must reach the plugin, got ${qc.quals}")
    }
  }

  test("declared-from-config plugin serves through the same pushdown path") {
    noCache {
      ScanLedger.reset()
      val users = spark.read.format("graft")
        .option("plugin", "rest").option("table", "users").load()
      val n = users.filter(col("id") >= 100L && col("id") < 350L).collect().length
      assert(n == 250)
      assert(ScanLedger.lastSplitCount == 1,
        s"id range must narrow to one 250-row page, got ${ScanLedger.lastSplitCount}")
      val quals = ScanLedger.lastQc.get.quals
      assert(quals.exists(q => q.field == "id" && q.op == ">="), s"got $quals")
      // IN probes through the generic interpreter too
      ScanLedger.reset()
      val probed = users.filter(col("id").isin(5L, 17L, 400L)).collect()
      assert(probed.length == 3)
      assert(ScanLedger.lastSplitCount == 3, "one probe split per IN value")
    }
  }

  test("DATE quals reach the declared table as epoch-days key ranges") {
    noCache {
      ScanLedger.reset()
      val days = spark.read.format("graft")
        .option("plugin", "rest").option("table", "days").load()
      val rows = days
        .filter(expr("day >= DATE'2024-02-01' AND day < DATE'2024-03-01'"))
        .collect()
      assert(rows.length == 29, s"Feb 2024 has 29 days, got ${rows.length}")
      val quals = ScanLedger.lastQc.get.quals
      val ge = quals.collectFirst { case Qual("day", ">=", v: Long) => v }
      val lt = quals.collectFirst { case Qual("day", "<", v: Long) => v }
      assert(ge.contains(java.time.LocalDate.parse("2024-02-01").toEpochDay),
        s"'>=' date qual must arrive as epoch days, got $quals")
      assert(lt.contains(java.time.LocalDate.parse("2024-03-01").toEpochDay),
        s"'<' date qual must arrive as epoch days, got $quals")
      assert(ScanLedger.lastSplitCount == 1,
        s"date range must narrow to one page split, got ${ScanLedger.lastSplitCount}")
    }
  }

  test("transient failures retry per split and the scan still completes") {
    import graft.sources.api.ScanLedger
    ScanLedger.reset()
    val df = spark.read.format("graft").option("plugin", "seq")
      .option("table", "flaky").load()
    assert(df.count() === 10000L)
    // 10000 / 2500 page size = 4 splits, each failed exactly once
    assert(ScanLedger.retries.get() === 4L,
      s"expected one retry per split, got ${ScanLedger.retries.get()}")
  }

  test("config table emits valid JSON even with quotes in values") {
    GraftConfigure.ensureCatalog(spark)
    try {
      GraftConfigure.configure(spark, "seq", """{"note": "say \"hi\" \\ bye"}""")
      val json = spark.sql("SELECT config FROM graft.seq.config").head.getString(0)
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
      assert(node.get("note").asText() == "say \"hi\" \\ bye")
      assert(node.get("n").asLong() == 10000L)
    } finally GraftConfigure.configure(spark, "seq", """{"note": ""}""")
  }
}
