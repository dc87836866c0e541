package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.3 — data-quality validation (round 12): the pre-ingestion
  * gate a training pipeline runs BEFORE any curation operator touches a
  * new snapshot. Published shape: AWS Deequ's declarative constraint
  * checks / column profiles (Schelter et al., "Automating Large-Scale
  * Data Quality Verification", VLDB 2018) and Great Expectations'
  * expectation suites; the drift check is the two-sample histogram
  * comparison every feature-store monitor runs (population-stability
  * family), scored as total-variation distance so the arithmetic stays
  * exact-rational until one final division.
  *
  * Reference analog: the reference engine surfaces connector data as
  * queryable tables (table.go) and leaves validation to hand SQL; a
  * 100 TB ingest needs the rule table AS an operator with one defined
  * output schema per family.
  *
  * Scale posture (the design constraint for every entry here):
  *  - dq_checks: every non-referential rule folds into ONE scan — the
  *    row-level conditional counts aggregate per key inside the groupBy
  *    the uniqueness rule needs anyway (map-side combine keeps the
  *    shuffle distinct-key-proportional; never a multi-distinct Expand,
  *    which would multiply the corpus stream per distinct aggregate);
  *    referential integrity is one left-anti equi-join on the key — both
  *    sides shuffle-partitioned, nothing corpus-sized is broadcast.
  *  - dq_profile: one explode pass pivots the row long (col_name, value),
  *    then a TWO-LEVEL aggregation: level 1 groups by (col_name, value) so
  *    the map-side combine shrinks the shuffle to distinct-proportional;
  *    level 2 folds the value partials into per-column stats. Distinct
  *    counts, null counts, min/max all come from the same partials — the
  *    corpus is read exactly once and no row crosses the wire twice.
  *  - dq_drift: one groupBy over a FIXED bucket space (map-side combine
  *    reduces to ~11 rows per task), cached once; the totals and the
  *    TVD normalizer ride one-row declared broadcasts.
  *
  * Cross-engine float discipline: TVD's per-bucket term is
  * |n_i·M − m_i·N| — exact int64 (counts ≤ 1.5e7 at sf10, products
  * ≤ ~1e14 < 2^53) — and the single final division of two
  * exactly-representable doubles is correctly rounded identically in
  * Spark and DuckDB. No logarithms (PSI's ln is libm-dependent); no
  * double accumulation order anywhere.
  */
object DataQuality {

  private def ord(s: SparkSession, d: String)  = Tables.t(s, d, "orders")
  private def cust(s: SparkSession, d: String) = Tables.t(s, d, "customer")

  /** dq_drift's fixed-width price histogram: bucket i covers
    * [i·60000, (i+1)·60000). Width chosen so the TPC-H totalprice range
    * spans ~10 buckets at every sf. */
  private val bucketWidth = 60000.0

  /** dq_anomaly's decision tail over a materialized (event_type, hour_s,
    * n) bucket table — SHARED with streaming.Streams' st_anomaly so the
    * batch and streaming monitors flag by the SAME exact-int64 rule
    * (`n·H > 2·T ∧ n ≥ 5`); a threshold change cannot drift between the
    * two. The per-type totals are a WINDOW over the bucket table
    * (partitionBy event_type — never an unpartitioned window, never the
    * corpus: the buckets are distinct-bucket-proportional so the one
    * window shuffle moves |types|·|hours| rows). A window, not a
    * totals-join: the streaming twin hands this a materialized VIEW, and
    * a view joined with an aggregate of itself trips Spark's
    * conflicting-reference resolution — the window expresses the same
    * per-type fold with no self-join to disambiguate. */
  def anomalyFlag(hourly: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    hourly
      .withColumn("n_total", sum("n").over(w))
      .withColumn("n_hours", count(lit(1)).over(w))
      .withColumn("spike",
        col("n") * col("n_hours") > lit(2L) * col("n_total") &&
          col("n") >= lit(5L))
      .select("event_type", "hour_s", "n", "n_total", "n_hours", "spike")
  }

  /** dq_drift's decision tail over a materialized bucket-count table
    * `cts(bucket, n_base, n_curr)` — SHARED with streaming.Streams'
    * st_drift so the batch gate and the live monitor score distribution
    * shift by the SAME exact-int64 TVD rule (numerator Σ|n_i·M − m_i·N|,
    * ONE final double division; threshold 0.1). The bucket table is
    * cached once (≈|buckets| rows at any corpus size) because the tail
    * reads it three times: totals, contributions, normalizer — all
    * riding one-row declared broadcasts. */
  def driftTail(s: SparkSession, cts0: DataFrame): DataFrame = {
    val cts = OpCache.track(s, cts0.persist())
    val tot = cts.agg(sum("n_base").as("nb"), sum("n_curr").as("nc"))
    val contrib = cts.crossJoin(broadcast(tot))
      .withColumn("contrib_num",
        abs(col("n_base") * col("nc") - col("n_curr") * col("nb")))
    val norm = contrib.agg(sum("contrib_num").as("sc"),
      max("nb").as("nbt"), max("nc").as("nct"))
    contrib.select("bucket", "n_base", "n_curr", "contrib_num")
      .crossJoin(broadcast(norm))
      .withColumn("tvd", col("sc").cast("double") /
        (lit(2L) * col("nbt") * col("nct")).cast("double"))
      .withColumn("drift", col("tvd") > lit(0.1))
      .select("bucket", "n_base", "n_curr", "contrib_num", "tvd", "drift")
  }

  /** The tail's oracle SQL given CTEs ending at `c(bucket, n_base,
    * n_curr)` — one SQL source for dq_drift AND st_drift. */
  def driftTailSql(ctes: String): String =
    s"""WITH $ctes,
       |t AS (SELECT SUM(n_base) AS nb, SUM(n_curr) AS nc FROM c),
       |x AS (SELECT c.bucket, c.n_base, c.n_curr,
       |    ABS(c.n_base * t.nc - c.n_curr * t.nb) AS contrib_num
       |  FROM c, t),
       |n AS (SELECT SUM(contrib_num) AS sc FROM x)
       |SELECT x.bucket,
       |  CAST(x.n_base AS BIGINT) AS n_base,
       |  CAST(x.n_curr AS BIGINT) AS n_curr,
       |  CAST(x.contrib_num AS BIGINT) AS contrib_num,
       |  CAST(n.sc AS DOUBLE) / CAST(2 * t.nb * t.nc AS DOUBLE) AS tvd,
       |  (CAST(n.sc AS DOUBLE) / CAST(2 * t.nb * t.nc AS DOUBLE)) > 0.1
       |    AS drift
       |FROM x, t, n""".stripMargin

  /** st_drift's bucket width over events.value (range ≈ [0, 560] at every
    * sf — GenScale replicates the value domain): ~12 buckets. */
  val stDriftWidth = 50.0

  /** The full anomaly oracle — one SQL source for dq_anomaly AND
    * st_anomaly (the streaming complete-mode materialization of the same
    * hourly buckets is definitionally the batch bucket table). */
  val anomalySql: String =
    """WITH h AS (SELECT event_type,
      |    strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
      |      AS hour_s,
      |    COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT event_type, SUM(n) AS n_total, COUNT(*) AS n_hours
      |  FROM h GROUP BY 1)
      |SELECT h.event_type, h.hour_s, CAST(h.n AS BIGINT) AS n,
      |  CAST(t.n_total AS BIGINT) AS n_total,
      |  CAST(t.n_hours AS BIGINT) AS n_hours,
      |  (h.n * t.n_hours > 2 * t.n_total AND h.n >= 5) AS spike
      |FROM h JOIN t ON t.event_type = h.event_type""".stripMargin

  /** dq_freshness's decision tail over a materialized per-type watermark
    * table `perType(event_type, n, max_us)` — SHARED with
    * streaming.Streams' st_freshness so the batch gate and the live
    * monitor decide staleness by the SAME exact-microsecond rule (global
    * fold from the |types|-row partials, strict > 1 h SLA). */
  def freshnessTail(perType: DataFrame): DataFrame = {
    val global = perType.agg(max("max_us").as("g_us"))
    perType.crossJoin(broadcast(global))
      .withColumn("lag_us", col("g_us") - col("max_us"))
      .withColumn("stale", col("lag_us") > lit(3600000000L))
      .withColumn("max_ts_s", date_format(
        timestamp_micros(col("max_us")), "yyyy-MM-dd HH:mm:ss"))
      .select("event_type", "n", "max_ts_s", "lag_us", "stale")
  }

  /** The full freshness oracle — one SQL source for dq_freshness AND
    * st_freshness (the streaming complete-mode per-type watermark table
    * is definitionally the batch per-type aggregate). */
  val freshnessSql: String =
    """WITH p AS (SELECT event_type, COUNT(*) AS n,
      |    MAX(epoch_us(ts)) AS max_us
      |  FROM events GROUP BY 1),
      |g AS (SELECT MAX(max_us) AS g_us FROM p)
      |SELECT p.event_type, CAST(p.n AS BIGINT) AS n,
      |  strftime(make_timestamp(p.max_us), '%Y-%m-%d %H:%M:%S')
      |    AS max_ts_s,
      |  CAST(g.g_us - p.max_us AS BIGINT) AS lag_us,
      |  (g.g_us - p.max_us) > 3600000000 AS stale
      |FROM p, g""".stripMargin

  /** dq_outlier's decision tail over a materialized per-(type, value)
    * count table `perV0(event_type, v, c)` — SHARED with
    * streaming.Streams' st_outlier so the batch audit and the live
    * monitor decide every median, MAD and flag by the SAME exact
    * index-rule arithmetic (a threshold change cannot drift between
    * gate and monitor). The table is cached once (distinct-value-
    * proportional — bounded by the value domain at any corpus size);
    * medians ride declared broadcasts; the deviation table caches once
    * for its two consumers (MAD fold + outlier fold). */
  def outlierTail(s: SparkSession, perV0: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val wT = Window.partitionBy("event_type")
      def medianOf(df: DataFrame, valCol: String, as: String): DataFrame = {
        val cum = df
          .withColumn("hi", sum("c").over(wT.orderBy(col(valCol).asc)))
          .withColumn("n", sum("c").over(wT))
        cum.groupBy("event_type").agg(max("n").as(s"n_$as"),
          max(when(expr("hi - c < (n - 1) * 50 div 100 + 1 AND " +
            "(n - 1) * 50 div 100 + 1 <= hi"), col(valCol))).as(as))
      }
      val perV = OpCache.track(s, perV0.persist())
      // every derived-aggregate join key is RE-ALIASED (fresh exprId)
      // before joining back: the streaming twin hands this a memory-sink
      // VIEW, and a view joined with an aggregate of itself under a
      // same-name USING key trips Spark's conflicting-reference
      // resolution (the anomalyFlag note) — the alias disambiguates with
      // no plan change
      val med = medianOf(perV, "v", "med")
        .select(col("event_type").as("et_med"), col("n_med"), col("med"))
      val dev = OpCache.track(s, perV
        .join(broadcast(med.select("et_med", "med")),
          col("event_type") === col("et_med"))
        .groupBy(col("event_type"), abs(col("v") - col("med")).as("dv"))
        .agg(sum("c").as("c"))
        .persist())
      val mad = medianOf(dev, "dv", "mad").drop("n_mad")
        .select(col("event_type").as("et_mad"), col("mad"))
      val fl = dev.join(broadcast(mad), col("event_type") === col("et_mad"))
        .groupBy("event_type")
        .agg(sum(when(col("dv") > lit(3.0) * col("mad"), col("c"))
          .otherwise(lit(0L))).as("n_outliers"))
        .select(col("event_type").as("et_fl"), col("n_outliers"))
      med.join(broadcast(mad), col("et_med") === col("et_mad"))
        .join(broadcast(fl), col("et_med") === col("et_fl"))
        .select(col("et_med").as("event_type"), col("n_med").as("n"),
          col("med"), col("mad"), col("n_outliers"))
  }

  /** The tail's oracle — ONE SQL source for dq_outlier AND st_outlier
    * (both twins fold the same per-(type, value) counts of the same
    * corpus, so the whole statement is shared verbatim). */
  val outlierSql: String =
    """WITH perv AS (SELECT event_type, value AS v, COUNT(*) AS c
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |mc AS (SELECT event_type, v, c,
      |    SUM(c) OVER (PARTITION BY event_type ORDER BY v) AS hi,
      |    SUM(c) OVER (PARTITION BY event_type) AS n FROM perv),
      |med AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
      |    MAX(CASE WHEN hi - c < (n - 1) * 50 // 100 + 1
      |      AND (n - 1) * 50 // 100 + 1 <= hi THEN v END) AS med
      |  FROM mc GROUP BY event_type),
      |dev AS (SELECT p.event_type, ABS(p.v - m.med) AS dv,
      |    CAST(SUM(p.c) AS BIGINT) AS c
      |  FROM perv p JOIN med m USING (event_type) GROUP BY 1, 2),
      |dc AS (SELECT event_type, dv, c,
      |    SUM(c) OVER (PARTITION BY event_type ORDER BY dv) AS hi,
      |    SUM(c) OVER (PARTITION BY event_type) AS n FROM dev),
      |mad AS (SELECT event_type,
      |    MAX(CASE WHEN hi - c < (n - 1) * 50 // 100 + 1
      |      AND (n - 1) * 50 // 100 + 1 <= hi THEN dv END) AS mad
      |  FROM dc GROUP BY event_type),
      |fl AS (SELECT d.event_type,
      |    CAST(SUM(CASE WHEN d.dv > 3 * a.mad THEN d.c ELSE 0 END)
      |      AS BIGINT) AS n_outliers
      |  FROM dev d JOIN mad a USING (event_type) GROUP BY 1)
      |SELECT m.event_type, m.n, m.med, a.mad, f.n_outliers
      |FROM med m JOIN mad a USING (event_type)
      |JOIN fl f USING (event_type)""".stripMargin

  val defs: Seq[GraftQuery] = Seq(

    // 197. declarative constraint checks (the Deequ/Great-Expectations
    // surface): a fixed rule table over the orders snapshot — not-null,
    // value-range, accepted-values, min-rows (one conditional-agg scan),
    // key uniqueness (per-key partial counts; violations = surplus
    // copies), referential integrity into customer (left-anti join).
    // Output: (rule, n_violations, pass) — the report a pipeline gates
    // ingestion on. All-pass on the driver's tables is the expected
    // result; DataQualitySpec injects crafted violations and pins each
    // rule's exact count.
    GraftQuery("dq_checks", (s, d) => {
      val o = ord(s, d)
      // ONE pass over orders for all non-referential rules: the row-level
      // conditional counts fold per key inside the groupBy the uniqueness
      // rule needs anyway, so the extra rules cost zero additional scans
      // and zero additional shuffle (the per-key partials ride the same
      // map-side combine).
      val perKey = o.groupBy("o_orderkey").agg(
        count(lit(1)).as("n"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("k_notnull"),
        sum(when(col("o_totalprice").isNull || col("o_totalprice") <= 0.0,
          1L).otherwise(0L)).as("k_pos"),
        sum(when(col("o_orderstatus").isNull ||
          !col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
          .as("k_vals"))
      val scan = perKey.agg(
        coalesce(sum("k_notnull"), lit(0L)).as("v_notnull"),
        coalesce(sum("k_pos"), lit(0L)).as("v_pos"),
        coalesce(sum("k_vals"), lit(0L)).as("v_vals"),
        coalesce(sum("n"), lit(0L)).as("n_rows"),
        coalesce(sum(when(col("n") > 1L, col("n") - lit(1L))), lit(0L))
          .as("v_uniq"))
      val rowRules = scan.select(explode(array(
          struct(lit("not_null:o_custkey").as("rule"),
            col("v_notnull").as("n_violations")),
          struct(lit("positive:o_totalprice").as("rule"),
            col("v_pos").as("n_violations")),
          struct(lit("accepted_values:o_orderstatus").as("rule"),
            col("v_vals").as("n_violations")),
          struct(lit("min_rows:orders").as("rule"),
            when(col("n_rows") >= 1L, lit(0L)).otherwise(lit(1L))
              .as("n_violations")),
          struct(lit("unique:o_orderkey").as("rule"),
            col("v_uniq").as("n_violations")))).as("x"))
        .select(col("x.rule").as("rule"), col("x.n_violations").as("n_violations"))
      val refv = o.select("o_custkey")
        .join(cust(s, d).select(col("c_custkey").as("o_custkey")),
          Seq("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("ref:o_custkey->customer").as("rule"), col("n_violations"))
      rowRules.union(refv)
        .withColumn("pass", col("n_violations") === lit(0L))
    },
      Some("""WITH r AS (SELECT
             |    SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v_notnull,
             |    SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
             |        THEN 1 ELSE 0 END) AS v_pos,
             |    SUM(CASE WHEN o_orderstatus IS NULL
             |        OR o_orderstatus NOT IN ('O','F','P')
             |        THEN 1 ELSE 0 END) AS v_vals,
             |    COUNT(*) AS n_rows
             |  FROM orders),
             |u AS (SELECT COALESCE(SUM(n - 1), 0) AS v
             |  FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey)
             |  WHERE n > 1),
             |f AS (SELECT COUNT(*) AS v FROM orders o
             |  LEFT JOIN customer c ON c.c_custkey = o.o_custkey
             |  WHERE c.c_custkey IS NULL),
             |rules AS (
             |  SELECT 'not_null:o_custkey' AS rule,
             |    CAST(v_notnull AS BIGINT) AS n_violations FROM r
             |  UNION ALL SELECT 'positive:o_totalprice',
             |    CAST(v_pos AS BIGINT) FROM r
             |  UNION ALL SELECT 'accepted_values:o_orderstatus',
             |    CAST(v_vals AS BIGINT) FROM r
             |  UNION ALL SELECT 'min_rows:orders',
             |    CASE WHEN n_rows >= 1 THEN CAST(0 AS BIGINT)
             |         ELSE CAST(1 AS BIGINT) END FROM r
             |  UNION ALL SELECT 'unique:o_orderkey', CAST(v AS BIGINT) FROM u
             |  UNION ALL SELECT 'ref:o_custkey->customer',
             |    CAST(v AS BIGINT) FROM f)
             |SELECT rule, n_violations, n_violations = 0 AS pass
             |FROM rules""".stripMargin)),

    // 207. multi-FK referential audit over the FACT table (the cross-table
    // leg next to dq_checks' single-rule gate): ONE scan of lineitem probes
    // all three dimension keys — orders, part, supplier — through chained
    // left joins on a slim 3-key projection, and the per-relationship
    // orphan counts fold in one aggregate. The design point is the scan
    // count: at 100 TB the fact table IS the corpus, and the naive
    // rule-per-relationship audit (dq_checks' shape, one anti-join per
    // rule) re-reads it once per FK — this entry pays the dominant scan
    // exactly once for any number of relationships, and each probe is a
    // key-partitioned equi-join (dimensions may themselves be corpus-sized;
    // nothing is declared broadcast). Violations are PLANTED
    // deterministically (distinct prime moduli per FK, key negated-minus-1
    // so the probe value provably misses the parent domain) — the audit
    // exercises real orphan paths instead of certifying an all-zero table.
    // Orphan rate is exact-integer ppm (n·1e6 div n_child), zero-guarded:
    // Spark's `div` returns NULL where DuckDB raises on /0, so the guard
    // is semantics, not style.
    GraftQuery("dq_referential", (s, d) => {
      val li = Tables.t(s, d, "lineitem").select(
        when(col("l_orderkey") % 1009 === 0, -col("l_orderkey") - 1)
          .otherwise(col("l_orderkey")).as("fk_o"),
        when(col("l_partkey") % 997 === 0, -col("l_partkey") - 1)
          .otherwise(col("l_partkey")).as("fk_p"),
        when(col("l_suppkey") % 991 === 0, -col("l_suppkey") - 1)
          .otherwise(col("l_suppkey")).as("fk_s"))
      // parent key sides are column-pruned PK scans; PK uniqueness (the
      // precondition for a LEFT-join probe not multiplying fact rows) is
      // dq_checks' unique rule — audited there, relied on here
      val o = Tables.t(s, d, "orders")
        .select(col("o_orderkey").as("fk_o"), lit(1).as("hit_o"))
      val p = Tables.t(s, d, "part")
        .select(col("p_partkey").as("fk_p"), lit(1).as("hit_p"))
      val su = Tables.t(s, d, "supplier")
        .select(col("s_suppkey").as("fk_s"), lit(1).as("hit_s"))
      val agg = li.join(o, Seq("fk_o"), "left")
        .join(p, Seq("fk_p"), "left")
        .join(su, Seq("fk_s"), "left")
        .agg(count(lit(1)).as("n_child"),
          coalesce(sum(when(col("hit_o").isNull, 1L).otherwise(0L)), lit(0L))
            .as("orph_o"),
          coalesce(sum(when(col("hit_p").isNull, 1L).otherwise(0L)), lit(0L))
            .as("orph_p"),
          coalesce(sum(when(col("hit_s").isNull, 1L).otherwise(0L)), lit(0L))
            .as("orph_s"))
      agg.select(explode(array(
          struct(lit("lineitem.l_orderkey->orders").as("rel"),
            col("n_child"), col("orph_o").as("n_orphans")),
          struct(lit("lineitem.l_partkey->part").as("rel"),
            col("n_child"), col("orph_p").as("n_orphans")),
          struct(lit("lineitem.l_suppkey->supplier").as("rel"),
            col("n_child"), col("orph_s").as("n_orphans")))).as("x"))
        .select(col("x.rel").as("rel"), col("x.n_child").as("n_child"),
          col("x.n_orphans").as("n_orphans"),
          when(col("x.n_child") === 0L, 0L)
            .otherwise(expr("x.n_orphans * 1000000 div x.n_child"))
            .as("orphan_ppm"))
    },
      Some("""WITH li AS (SELECT
             |    CASE WHEN l_orderkey % 1009 = 0 THEN -l_orderkey - 1
             |         ELSE l_orderkey END AS fk_o,
             |    CASE WHEN l_partkey % 997 = 0 THEN -l_partkey - 1
             |         ELSE l_partkey END AS fk_p,
             |    CASE WHEN l_suppkey % 991 = 0 THEN -l_suppkey - 1
             |         ELSE l_suppkey END AS fk_s
             |  FROM lineitem),
             |a AS (SELECT COUNT(*) AS n_child,
             |    COALESCE(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS orph_o,
             |    COALESCE(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END), 0) AS orph_p,
             |    COALESCE(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END), 0) AS orph_s
             |  FROM li
             |  LEFT JOIN orders o ON o.o_orderkey = li.fk_o
             |  LEFT JOIN part p ON p.p_partkey = li.fk_p
             |  LEFT JOIN supplier s ON s.s_suppkey = li.fk_s),
             |rels AS (
             |  SELECT 'lineitem.l_orderkey->orders' AS rel,
             |    CAST(n_child AS BIGINT) AS n_child,
             |    CAST(orph_o AS BIGINT) AS n_orphans FROM a
             |  UNION ALL SELECT 'lineitem.l_partkey->part',
             |    CAST(n_child AS BIGINT), CAST(orph_p AS BIGINT) FROM a
             |  UNION ALL SELECT 'lineitem.l_suppkey->supplier',
             |    CAST(n_child AS BIGINT), CAST(orph_s AS BIGINT) FROM a)
             |SELECT rel, n_child, n_orphans,
             |  CASE WHEN n_child = 0 THEN CAST(0 AS BIGINT)
             |       ELSE n_orphans * 1000000 // n_child END AS orphan_ppm
             |FROM rels""".stripMargin)),

    // 198. per-column profile (the Deequ profiler surface): row count,
    // null count, exact distinct count, min/max per column of the orders
    // snapshot — numerics surface as DOUBLE (min_n/max_n), strings and
    // the zero-pad-formatted timestamp as VARCHAR (min_s/max_s); double
    // values never pass through a string representation (Spark's
    // shortest-round-trip formatting disagrees with DuckDB's on exponent
    // forms). One explode pass + two-level aggregation — see the object
    // Scaladoc for why this shape (and not countDistinct's Expand) is
    // the 100 TB plan.
    GraftQuery("dq_profile", (s, d) => {
      val o = ord(s, d)
      def num(name: String) = struct(lit(name).as("col_name"),
        col(name).cast("double").as("v_n"), lit(null).cast("string").as("v_s"))
      def str(name: String) = struct(lit(name).as("col_name"),
        lit(null).cast("double").as("v_n"), col(name).as("v_s"))
      val dateCol = struct(lit("o_orderdate").as("col_name"),
        lit(null).cast("double").as("v_n"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("v_s"))
      val long = o.select(explode(array(
          num("o_orderkey"), num("o_custkey"), num("o_totalprice"),
          str("o_orderstatus"), str("o_orderpriority"), dateCol)).as("x"))
        .select(col("x.col_name").as("col_name"),
          col("x.v_n").as("v_n"), col("x.v_s").as("v_s"))
      val prof = long
        .groupBy("col_name", "v_n", "v_s").agg(count(lit(1)).as("cnt"))
        .groupBy("col_name").agg(
          sum("cnt").as("n_rows"),
          coalesce(sum(when(col("v_n").isNull && col("v_s").isNull,
            col("cnt"))), lit(0L)).as("n_nulls"),
          sum(when(col("v_n").isNotNull || col("v_s").isNotNull, 1L)
            .otherwise(0L)).as("n_distinct"),
          min("v_n").as("min_n"), max("v_n").as("max_n"),
          min("v_s").as("min_s"), max("v_s").as("max_s"))
      // anchor on the static column list: on an EMPTY snapshot the agg
      // yields no groups but the oracle's six global aggregates each
      // return one zero row — the anchor keeps both engines at one row
      // per column. prof's OUTPUT is ≤ |columns| rows at any corpus
      // size, so the declared broadcast is scale-safe.
      val anchor = s.createDataset(Seq("o_orderkey", "o_custkey",
        "o_totalprice", "o_orderstatus", "o_orderpriority", "o_orderdate"))(
        org.apache.spark.sql.Encoders.STRING).toDF("col_name")
      anchor.join(broadcast(prof), Seq("col_name"), "left")
        .select(col("col_name"),
          coalesce(col("n_rows"), lit(0L)).as("n_rows"),
          coalesce(col("n_nulls"), lit(0L)).as("n_nulls"),
          coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
          col("min_n"), col("max_n"), col("min_s"), col("max_s"))
    },
      Some {
        def num(c: String) =
          s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
             |  COUNT(*) - COUNT($c) AS n_nulls,
             |  COUNT(DISTINCT $c) AS n_distinct,
             |  CAST(MIN($c) AS DOUBLE) AS min_n, CAST(MAX($c) AS DOUBLE) AS max_n,
             |  CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s
             |FROM orders""".stripMargin
        def str(c: String, expr: String) =
          s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
             |  COUNT(*) - COUNT($expr) AS n_nulls,
             |  COUNT(DISTINCT $expr) AS n_distinct,
             |  CAST(NULL AS DOUBLE) AS min_n, CAST(NULL AS DOUBLE) AS max_n,
             |  MIN($expr) AS min_s, MAX($expr) AS max_s
             |FROM orders""".stripMargin
        Seq(num("o_orderkey"), num("o_custkey"), num("o_totalprice"),
          str("o_orderstatus", "o_orderstatus"),
          str("o_orderpriority", "o_orderpriority"),
          str("o_orderdate", "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')"))
          .mkString("\nUNION ALL\n")
      }),

    // 199. snapshot drift (the feature-store monitor): split the orders
    // snapshot into baseline (even o_orderkey) and current (odd), bucket
    // o_totalprice into the fixed-width histogram, and score the
    // distribution shift as total-variation distance
    // TVD = Σ|n_i/N − m_i/M| / 2, computed as the exact int64 numerator
    // Σ|n_i·M − m_i·N| with ONE final double division (identical IEEE
    // result in both engines — the reason TVD and not PSI: no ln).
    // Output: per-bucket counts + the exact contribution numerator, with
    // the tvd score and the drift flag (tvd > 0.1) denormalized onto
    // every row. The bucket table is cached once (11 rows) so orders is
    // scanned exactly once.
    GraftQuery("dq_drift", (s, d) => {
      // NULL prices propagate to the NULL bucket naturally (floor(NULL) =
      // NULL, and both engines group NULLs together); negatives land in
      // their true negative buckets — no sentinel that could conflate the
      // two classes.
      val o = ord(s, d).select(
        floor(col("o_totalprice") / lit(bucketWidth)).as("bucket"),
        (col("o_orderkey") % 2 === 0).as("is_base"))
      driftTail(s, o.groupBy("bucket").agg(
        sum(when(col("is_base"), 1L).otherwise(0L)).as("n_base"),
        sum(when(!col("is_base"), 1L).otherwise(0L)).as("n_curr")))
    },
      Some(driftTailSql(
        s"""b AS (SELECT
           |    CAST(FLOOR(o_totalprice / $bucketWidth) AS BIGINT) AS bucket,
           |    (o_orderkey % 2 = 0) AS is_base
           |  FROM orders),
           |c AS (SELECT bucket,
           |    SUM(CASE WHEN is_base THEN 1 ELSE 0 END) AS n_base,
           |    SUM(CASE WHEN NOT is_base THEN 1 ELSE 0 END) AS n_curr
           |  FROM b GROUP BY bucket)""".stripMargin))),

    // 202. volume-anomaly detection (the ingest-monitor surface next to
    // dq_drift's distribution monitor): per (event_type, hour) arrival
    // counts, flagged where the hour's count exceeds 2× the type's mean
    // over its ACTIVE hours with a min-support floor. The comparison is
    // the cross-multiplied int64 `n·H > 2·T` — no mean is ever
    // materialized as a double, so both engines decide every flag with
    // exact integer arithmetic (n ≤ 1e7 and H ≤ 1e4 at sf10: the product
    // stays far under 2^63). Scale posture: ONE corpus scan into the
    // (type, hour) groupBy — map-side combine shrinks the shuffle to
    // distinct-bucket-proportional — and the per-type totals fold from
    // those ~|types|·|hours| partials via anomalyFlag's per-type window,
    // never from a second scan.
    GraftQuery("dq_anomaly", (s, d) => {
      val ev = Tables.t(s, d, "events")
      // ONE corpus scan, no cache: anomalyFlag's decision tail is a
      // per-type WINDOW over the bucket table — a single consumer of a
      // single aggregate, so there is nothing to reuse and a persist
      // here would only add a materialization pass (the streaming twin
      // st_anomaly hands anomalyFlag its complete-mode view instead)
      val hourly = ev.select(col("event_type"),
          date_format(date_trunc("hour", col("ts")),
            "yyyy-MM-dd HH:mm:ss").as("hour_s"))
        .groupBy("event_type", "hour_s").agg(count(lit(1)).as("n"))
      anomalyFlag(hourly)
    },
      Some(anomalySql)),

    // 203. freshness SLA check (the third leg of the monitor family:
    // dq_drift watches the distribution, dq_anomaly the volume, this the
    // CLOCK): per event_type, row count and high-watermark timestamp,
    // with the lag behind the snapshot's global watermark in exact
    // microseconds (unix_micros/epoch_us — int64 in both engines, no
    // float time math) and the stale flag at a 1-hour SLA. Scale
    // posture: one scan into a |types|-row aggregate; the global
    // watermark folds from those partials (never a second scan) and
    // rides a one-row declared broadcast.
    GraftQuery("dq_freshness", (s, d) => {
      // ONE corpus scan: the per-type watermarks (|types| rows) are cached
      // so the global fold and the lag projection share one pass
      val perType = OpCache.track(s, Tables.t(s, d, "events")
        .groupBy("event_type").agg(
          count(lit(1)).as("n"), max(unix_micros(col("ts"))).as("max_us"))
        .persist())
      freshnessTail(perType)
    },
      Some(freshnessSql)),

    // 215. robust per-type outlier audit (the VALUE-INTEGRITY leg of the
    // monitor family): median + MAD (median absolute deviation — the
    // robust dispersion estimate Hampel's rule uses; Leys et al. 2013)
    // per event_type, and the count of values beyond 3·MAD. Unlike a
    // mean/stddev z-score, the median/MAD pair doesn't move when the
    // outliers themselves grow — the property a corruption detector
    // needs. Exactness: medians use the same pure-index rule as the
    // exact-quantile entries ((n−1)·50 div 100 + 1 under the value
    // order — a PICK of an existing double, no interpolation), |v−med|
    // and 3·mad are single IEEE ops on identical inputs, so every
    // number is bit-identical cross-engine — no float accumulation
    // anywhere. Scale posture: ONE corpus scan folds to (type, value)
    // counts (map-side combine, distinct-value-proportional shuffle);
    // both medians rank DISTINCT-value tables via cumulative-count
    // windows (the dq_profile/q_quantile_sketch two-level discipline —
    // window input is bounded by the value domain, never corpus rows);
    // the |types|-row median tables ride declared broadcasts; the
    // deviation table is cached once for its two consumers (MAD fold +
    // outlier fold). NULL values are excluded up front: the two engines
    // disagree on NULL placement in window orders, and a NULL is a
    // completeness defect (dq_checks' jurisdiction), not a value outlier.
    GraftQuery("dq_outlier", (s, d) =>
      outlierTail(s, Tables.t(s, d, "events")
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"), col("value").as("v"))
        .agg(count(lit(1)).as("c"))),
      Some(outlierSql)))

}
