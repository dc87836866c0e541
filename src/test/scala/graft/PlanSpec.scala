package graft

/** Plan-shape guards: the *performance* properties of headline queries
  * (pushdown reaching the scan, dimensions broadcast, pruned schemas).
  * Results alone can't catch a regression that merely makes a plan slow. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q_agg_basic pushes the shipdate filter into the parquet scan") {
    val p = plan("q_agg_basic")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q_scan_project reads exactly the three projected columns") {
    val p = plan("q_scan_project")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_extendedprice:double>"), p)
  }

  test("q_join_star broadcasts all five dimension joins") {
    val p = plan("q_join_star")
    assert("BroadcastHashJoin".r.findAllIn(p).length == 5, p)
    assert(p.contains("EqualTo(r_name,ASIA)"), "region filter must reach the scan\n" + p)
  }

  test("q_filter_pushdown pushes IN / LIKE-prefix / range filters") {
    val p = plan("q_filter_pushdown")
    assert(p.contains("In(p_size, [10,15,20,25])"), p)
    assert(p.contains("StringStartsWith(p_brand,Brand#1)"), p)
  }

  test("connector scan shows quals and pruned columns in the plan") {
    val p = plan("vt_pushdown_quals")
    assert(p.contains("GraftScan(seq.numbers"), p)
    assert(p.contains("Qual(id,>=,2000)") && p.contains("Qual(id,<,2100)"), p)
  }

  test("connector limit reaches the scan (vt_limit)") {
    val p = plan("vt_limit")
    assert(p.contains("limit=50"), p)
  }

  test("q_limit_order plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("q_limit_order")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("bucketed fact join runs without a shuffle before the join") {
    SparkEntry.queries("q_bucketed_join")(spark, sf) // writes bucketed tables
    val tag = java.lang.Integer.toHexString(sf.hashCode)
    // force a non-broadcast join so the bucketed scan is what avoids the
    // shuffle (at real scale neither fact side would broadcast anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = spark.table(s"g_lineitem_b_$tag")
        .join(spark.table(s"g_orders_b_$tag"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      assert(!p.contains("Exchange hashpartitioning"),
        "bucketed join must not reshuffle:\n" + p)
      assert(p.contains("Bucketed: true"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("mm_gated_decode pushes the metadata gate to the scan (prune-before-decode)") {
    val p = plan("mm_gated_decode")
    assert(p.contains("EqualTo(lang,en)"), "lang gate must reach the parquet scan\n" + p)
    assert(p.contains("GreaterThanOrEqual(n_chars,200)"),
      "size gate must reach the parquet scan\n" + p)
  }

  test("q_sample's hash filter is a pure per-row projection (no shuffle)") {
    val p = plan("q_sample")
    assert(!p.contains("Exchange"), "sampling must not shuffle\n" + p)
  }

  test("simpson_stats stays inside whole-stage codegen (no fallback)") {
    val df = SparkEntry.queries("ta_diversity")(spark, sf)
    df.queryExecution.toRdd.count()
    val p = df.queryExecution.executedPlan.toString
    val line = p.linesIterator.find(_.contains("simpson_stats")).getOrElse("")
    assert(line.contains("*("),
      s"simpson_stats must be in a codegen stage, got: $line\n$p")
  }

  test("dot_product stays inside whole-stage codegen (no fallback)") {
    val df = SparkEntry.queries("ann_topk")(spark, sf)
    df.queryExecution.toRdd.count() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    val line = p.linesIterator.find(_.contains("dot_product")).getOrElse("")
    assert(line.contains("*("),
      s"dot_product must be in a codegen stage, got: $line\n$p")
  }

  test("dd_embed_cosine shuffles on the blocking key, not a cross join") {
    val p = plan("dd_embed_cosine")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("minhash_sig and char_shingles stay inside whole-stage codegen") {
    val df = SparkEntry.queries("dd_minhash_lsh")(spark, sf)
    df.queryExecution.toRdd.count() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    for (fn <- Seq("minhash_sig", "char_shingles")) {
      val line = p.linesIterator.find(_.contains(fn)).getOrElse("")
      assert(line.contains("*("),
        s"$fn must be in a codegen stage (doGenCode), got: $line")
    }
  }

  test("ann_ivf assignment is map-only argmin_l2 — no N×K window shuffle") {
    val df = SparkEntry.queries("ann_ivf")(spark, sf)
    df.queryExecution.toRdd.count()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("windowspecdefinition(vec_id"),
      "cell assignment must not materialize an N×K window per vec_id:\n" + p)
    val line = p.linesIterator.find(_.contains("argmin_l2")).getOrElse("")
    assert(line.contains("*("), s"argmin_l2 must be codegen'd, got: $line")
  }

  test("ann_pq ADC search uses the native adc_dist inside codegen") {
    val df = SparkEntry.queries("ann_pq")(spark, sf)
    df.queryExecution.toRdd.count()
    val p = df.queryExecution.executedPlan.toString
    val line = p.linesIterator.find(_.contains("adc_dist")).getOrElse("")
    assert(line.contains("*("), s"adc_dist must be codegen'd, got: $line")
  }

  test("sig_agree prefilter stays inside whole-stage codegen") {
    val df = SparkEntry.queries("dd_source_overlap")(spark, sf)
    df.queryExecution.toRdd.count()
    val p = df.queryExecution.executedPlan.toString
    val line = p.linesIterator.find(_.contains("sig_agree")).getOrElse("")
    assert(line.contains("*("), s"sig_agree must be codegen'd, got: $line")
  }

  test("dd_semantic assignment is map-only argmin_l2 — no N×K window shuffle") {
    val df = SparkEntry.queries("dd_semantic")(spark, sf)
    df.queryExecution.toRdd.count()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("windowspecdefinition(vec_id"),
      "cluster assignment must not window per vec_id:\n" + p)
  }

  test("dd_bloom_gate probe side is one map pass over a broadcast filter") {
    val df = SparkEntry.queries("dd_bloom_gate")(spark, sf)
    df.queryExecution.toRdd.count()
    val p = df.queryExecution.executedPlan.toString
    // the only allowed shuffle is the tiny eval-set filter build (a
    // single-partition collect_set); the corpus side must not repartition
    assert(!p.contains("hashpartitioning"),
      "probe stream must not shuffle (was: posexplode + semi-join + 2 groupBys):\n" + p)
    val line = p.linesIterator.find(_.contains("bloom_flag_count")).getOrElse("")
    assert(line.contains("*("), s"bloom_flag_count must be codegen'd, got: $line")
  }

  test("ann probe→index joins keep the declared broadcast when stats say no") {
    // The `broadcast(probes)` bounds in ann_ivf / ann_ivf_pq encode
    // semantic knowledge the planner lacks: probes is queries × nprobe
    // rows, but its STATIC estimate is crossJoin-inflated, and at
    // sf1-scale stats the planner flips the join to SortMergeJoin and
    // shuffles the corpus-sized index by cell (the round-5 regression).
    // autoBroadcastJoinThreshold=-1 simulates "estimates too big to
    // auto-broadcast" — only the declared hint can keep the broadcast —
    // so this pins the hint against refactors at any stats.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for (name <- Seq("ann_ivf", "ann_ivf_pq")) {
        val p = plan(name)
        val pat = """BroadcastHashJoin \[cell#[^\]]*\], \[cell#[^\]]*\], Inner, BuildLeft""".r
        assert(pat.findFirstIn(p).isDefined,
          s"$name: probe→index cell join must stay BroadcastHashJoin/BuildLeft " +
            s"with auto-broadcast off:\n$p")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("sf1-scale plan audit: every PlanContracts contract holds under big stats") {
    // The generated PLANS_r*.md is a report of THIS table (PlanAudit
    // renders the same contracts) — the audit document and the enforced
    // assertions cannot drift. Big-stats simulation: auto-broadcast off,
    // so only DECLARED broadcasts survive, as at sf1+ parquet stats.
    PlanContracts.withBigStats(spark) {
      val bad = PlanContracts.audited.flatMap { case (name, _) =>
        val (plan, results) = PlanContracts.audit(spark, sf, name)
        results.collect { case (desc, false) =>
          s"$name: VIOLATED '$desc'\n${plan.take(4000)}"
        }
      }
      assert(bad.isEmpty, bad.mkString("\n\n"))
    }
  }

  test("top_bigram_stats stays inside whole-stage codegen; no explode in ta_repetition") {
    val df = SparkEntry.queries("ta_repetition")(spark, sf)
    df.queryExecution.toRdd.count()
    val p = df.queryExecution.executedPlan.toString
    val line = p.linesIterator.find(_.contains("top_bigram_stats")).getOrElse("")
    assert(line.contains("*("), s"top_bigram_stats must be codegen'd, got: $line")
    assert(!p.contains("Generate"), "ta_repetition must not explode:\n" + p)
    assert(!p.contains("Exchange"), "ta_repetition must not shuffle:\n" + p)
  }
}
