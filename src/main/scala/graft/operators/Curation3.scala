package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.3 — corpus-curation batch 3 (round 10): graph-centrality
  * representative selection over the shared near-dup pair graph, and
  * exact-quota deterministic stratified sampling.
  *
  * Scale posture: dd_rep_rank's working set is the PAIR GRAPH
  * (duplication-proportional, bounded by LSH banding — never the corpus),
  * with a FIXED 3-round PageRank whose per-round cost is one edge join +
  * one integer-sum shuffle; ta_sample_stratified is one window shuffle on
  * source plus a broadcast of the per-source counts.
  *
  * Cross-engine float discipline: PageRank runs in SCALED INT64 (rank
  * mass × 1e12, damping 85/100 as integer multiply-then-floor-divide) so
  * every per-edge term is an exact int64 and the per-node sum is
  * order-independent — no float accumulation order to disagree on.
  * Reference analog for the sampling surface: steampipe's qual-pushdown
  * LIMIT sampling (table.go) gives per-call row caps; a training pipeline
  * needs the per-STRATUM version with a reproducible order.
  */
object Curation3 {

  private def docs(s: SparkSession, d: String) = Tables.t(s, d, "documents")

  /** PageRank mass scale: rank values are int64 fractions of 1e12. */
  private val prScale = 1000000000000L
  private val prRounds = 3

  /** One oracle PageRank round: r{i}d(id, deg, r) -> r{i+1}d(id, deg, r).
    * Every node in the pair graph has deg >= 1 and (undirected edges) at
    * least one in-neighbor, so the contribution join covers all nodes —
    * no dangling-mass term. */
  private def prRoundSql(i: Int): String = {
    val in = if (i == 0) "r0" else s"r${i}d"
    s"""r${i + 1} AS (SELECT ed.dst AS id,
       |    CAST(${15 * prScale} AS BIGINT) // (100 * (SELECT n_nodes FROM nn))
       |    + CAST(SUM(($in.r * 85) // (100 * $in.deg)) AS BIGINT) AS r
       |  FROM ed JOIN $in ON $in.id = ed.src GROUP BY ed.dst),
       |r${i + 1}d AS (SELECT r${i + 1}.id, deg.deg, r${i + 1}.r
       |  FROM r${i + 1} JOIN deg ON deg.src = r${i + 1}.id)""".stripMargin
  }

  val defs: Seq[GraftQuery] = Seq(

    // 185. centrality-ranked cluster representatives: integer-scaled
    // PageRank (3 rounds, damping 0.85) over the shared verified near-dup
    // pair graph, then per-cluster representative = highest-centrality
    // member (ties -> lowest doc_id). Published analog: centrality-based
    // canonical selection for web corpora (Common Crawl ranks hosts by
    // centrality before curation; SemDeDup keeps the most central cluster
    // member) — dd_canonical picks by quality score, this picks by graph
    // position. The working set never exceeds the pair graph: edges are
    // duplication-proportional, each round is one (src) equi-join + one
    // (id) integer-sum shuffle, the round count is FIXED, and the
    // component labels reuse the same min-label propagation dd_cluster
    // runs. All rank arithmetic is int64 (mass x 1e12): each edge term is
    // (r*85) // (100*deg) — exact, so the per-node SUM is order-free and
    // the oracle reproduces every bit without float-order caveats.
    GraftQuery("dd_rep_rank", (s, d) => {
      val p = Similarity.minhashPairs(s, d).select("ia", "ib")
      val edges = p.union(p.select(col("ib").as("ia"), col("ia").as("ib")))
        .toDF("src", "dst")
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val n1 = deg.agg(count(lit(1)).as("n_nodes"))
      var r = deg.select(col("src").as("id"), col("deg"))
        .crossJoin(broadcast(n1))
        .withColumn("r", expr(s"CAST($prScale AS BIGINT) div n_nodes"))
        .drop("n_nodes")
      for (_ <- 1 to prRounds) {
        val contrib = edges
          .join(r.select(col("id").as("src"), col("deg"), col("r")), "src")
          .select(col("dst").as("id"),
            expr("(r * 85) div (100 * deg)").as("c"))
        r = contrib.groupBy("id").agg(sum("c").as("cs"))
          .crossJoin(broadcast(n1))
          .withColumn("r",
            expr(s"CAST(${15 * prScale} AS BIGINT) div (100 * n_nodes) + cs"))
          .join(deg.select(col("src").as("id"), col("deg")), "id")
          .select("id", "deg", "r")
      }
      val labels = Components.minLabel(s, p)
      val wRep = Window.partitionBy(col("label"))
        .orderBy(col("r").desc, col("id").asc)
      r.join(labels, "id")
        .withColumn("is_rep", row_number().over(wRep) === 1)
        .select(col("id").as("doc_id"), col("label").as("cluster_id"),
          col("deg"), col("r").as("centrality"), col("is_rep"))
    },
      Some(s"""${Similarity.minhashPairsSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
             |ed AS (SELECT ia AS src, ib AS dst FROM p
             |  UNION ALL SELECT ib, ia FROM p),
             |deg AS (SELECT src, COUNT(*) AS deg FROM ed GROUP BY src),
             |nn AS (SELECT COUNT(*) AS n_nodes FROM deg),
             |r0 AS (SELECT src AS id, deg,
             |    CAST($prScale AS BIGINT) // (SELECT n_nodes FROM nn) AS r
             |  FROM deg),
             |${(0 until prRounds).map(prRoundSql).mkString(",\n")},
             |e2 AS (SELECT ia AS a, ib AS b FROM p UNION ALL SELECT ib, ia FROM p),
             |reach(n_, m) AS (
             |  SELECT a, a FROM e2 GROUP BY a
             |  UNION
             |  SELECT r.n_, e2.b FROM reach r JOIN e2 ON e2.a = r.m),
             |cc AS (SELECT n_ AS id, MIN(m) AS cluster_id FROM reach GROUP BY n_),
             |rep AS (SELECT f.id, f.deg, f.r, cc.cluster_id,
             |    ROW_NUMBER() OVER (PARTITION BY cc.cluster_id
             |      ORDER BY f.r DESC, f.id) AS rrn
             |  FROM r${prRounds}d f JOIN cc ON cc.id = f.id)
             |SELECT id AS doc_id, cluster_id, deg, r AS centrality,
             |  rrn = 1 AS is_rep FROM rep""".stripMargin)),

    // 186. exact-quota deterministic stratified sample: per source take
    // the ceil(5%) lowest docs by (md5(doc_id), doc_id) — the reproducible
    // per-stratum subset a pipeline pins for eval slices and data cards
    // (q_sample's hash-mod filter gives a PROPORTION with binomial jitter
    // per stratum; this gives the exact COUNT, and small sources are never
    // sampled to zero because the quota is a ceiling). One window shuffle
    // on source (per-stratum rank = top-quota-per-group) plus a broadcast
    // of the ~n_sources count row; nothing corpus-wide crosses a second
    // shuffle. Quota arithmetic is integer-only: (n + 19) div 20.
    GraftQuery("ta_sample_stratified", (s, d) => {
      val dd = docs(s, d).select(col("doc_id"), col("source"))
        .withColumn("hk",
          conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long"))
      val cnt = dd.groupBy("source").agg(count(lit(1)).as("n_src"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("hk").asc, col("doc_id").asc)
      dd.withColumn("rk", row_number().over(w).cast("long"))
        .join(broadcast(cnt), "source")
        .filter(col("rk") <= expr("(n_src + 19) div 20"))
        .select(col("source"), col("doc_id"), col("rk"),
          expr("(n_src + 19) div 20").as("quota"))
    },
      Some(s"""WITH h AS (SELECT doc_id, source,
             |    md5(CAST(doc_id AS VARCHAR)) AS m FROM documents),
             |hk AS (SELECT doc_id, source, ${Relational.duckHex8("m", 1)} AS hk
             |  FROM h),
             |rk AS (SELECT doc_id, source,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY source
             |      ORDER BY hk, doc_id) AS BIGINT) AS rk
             |  FROM hk),
             |cnt AS (SELECT source, COUNT(*) AS n_src FROM documents
             |  GROUP BY source)
             |SELECT rk.source, rk.doc_id, rk.rk, (cnt.n_src + 19) // 20 AS quota
             |FROM rk JOIN cnt ON cnt.source = rk.source
             |WHERE rk.rk <= (cnt.n_src + 19) // 20""".stripMargin))
  )
}
