package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.3 — entity resolution (round 12): the record-linkage pass a
  * catalog/metadata pipeline runs before joining feeds that spell the
  * same real-world entity differently. Published shape: blocking +
  * pairwise compare + survivorship (Fellegi & Sunter 1969; Christen,
  * "Data Matching", 2012; Papadakis et al., "Blocking and Filtering
  * Techniques for Entity Resolution", ACM CSUR 2020). The reference
  * engine exposes connector rows as SQL tables and leaves linkage to
  * hand queries; at 100 TB the blocked pipeline has to BE the operator,
  * because the naive all-pairs compare is the canonical scale killer.
  *
  * Scale posture (the design constraint for both entries):
  *  - er_blocked_match resolves on the DISTINCT normalized-name table,
  *    not the row table: names are vocabulary-bounded (64 at every sf
  *    here; brands/vendors/skus in a real catalog), so the token-block
  *    self-join runs on a dictionary that stays small while the corpus
  *    grows — the row count only feeds the per-name frequency aggregate
  *    (one map-side-combined groupBy, the only corpus-sized shuffle).
  *    Candidate generation is token blocking (pairs must share a full
  *    token), so the quadratic term is per-block on the DICTIONARY —
  *    never all-pairs, never on rows. The edit-distance verify runs
  *    only on surviving candidates.
  *  - er_survivor builds the golden record with a TWO-LEVEL aggregate
  *    (per (name, brand) partials, then per name), so the distinct-brand
  *    count never plans as an Expand multi-distinct and the shuffle is
  *    distinct-pair-proportional — the same 100 TB shape dq_profile
  *    documents.
  *
  * Cross-engine discipline: levenshtein is the classic unit-cost edit
  * distance in both Spark (functions.levenshtein) and DuckDB
  * (levenshtein()); counts/keys/distances are int64 end to end; the one
  * double column (max_price) is a MAX — order-independent, no
  * accumulation.
  */
object Entity {

  /** The normalized-name dictionary: one corpus scan aggregated per name
    * (row support + stable int64 id = min partkey — mins over disjoint row
    * sets are distinct, so nid is a valid node key for the closure). The
    * SHARED stage all three er_ entries start from — memoized, so one
    * session builds and pins ONE copy instead of each entry persisting
    * its own (three separate builds/copies before r14). */
  private[operators] def nameDict(s: SparkSession, d: String): DataFrame =
    OpCache.memo(s, s"namedict|$d") {
      Tables.t(s, d, "part")
        .select(lower(trim(col("p_name"))).as("name"), col("p_partkey"))
        .groupBy("name").agg(count(lit(1)).as("n_rows"),
          min("p_partkey").as("nid"))
        .persist()
    }

  /** Blocked candidate generation over a (name, bk) blocking-key table:
    * distinct ordered name pairs sharing a key — the quadratic term stays
    * per-block on the vocabulary-bounded dictionary, broadcast through
    * the self-join so candidates never shuffle. */
  private def blockCands(keyed: DataFrame): DataFrame =
    keyed.as("a")
      .join(broadcast(keyed.as("b")),
        col("a.bk") === col("b.bk") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct()

  /** Token blocking keys (er_blocked_match / er_cluster's one pass). */
  private[operators] def tokenCands(names: DataFrame): DataFrame =
    blockCands(names.select(col("name"),
      explode(split(col("name"), " ")).as("bk"))
      .where(length(col("bk")) > 0))

  /** Token-blocked candidate generation + levenshtein-≤3 verify over the
    * (cached) dictionary — the SHARED match stage: pairs never leave the
    * vocabulary-bounded dictionary, the quadratic term is per-block on
    * names, and the verify is fused into the broadcast join. */
  private[operators] def matchedPairs(names: DataFrame): DataFrame =
    tokenCands(names)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"))
        .cast("long"))
      .where(col("dist") <= 3)

  /** The shared match-stage oracle CTEs, ending at
    * `m(name_a, name_b, dist)` — one SQL source for both entries. */
  private val matchSqlCtes: String =
    """names AS (SELECT lower(trim(p_name)) AS name,
      |    COUNT(*) AS n_rows, MIN(p_partkey) AS nid
      |  FROM part GROUP BY 1),
      |tok AS (SELECT name, unnest(string_split(name, ' ')) AS tok
      |  FROM names),
      |tok2 AS (SELECT name, tok FROM tok WHERE length(tok) > 0),
      |cand AS (SELECT DISTINCT a.name AS name_a, b.name AS name_b
      |  FROM tok2 a JOIN tok2 b
      |    ON a.tok = b.tok AND a.name < b.name),
      |m AS (SELECT name_a, name_b,
      |    CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
      |  FROM cand WHERE levenshtein(name_a, name_b) <= 3)""".stripMargin

  val defs: Seq[GraftQuery] = Seq(

    // 200. blocked fuzzy match over the normalized part-name dictionary:
    // normalize (lower/trim), aggregate per name (frequency + min key),
    // token-block the DISTINCT names, and verify candidates that share a
    // token with levenshtein ≤ 3. Output: the matched pair table a
    // linkage reviewer consumes — both names, the distance, and each
    // side's row support.
    GraftQuery("er_blocked_match", (s, d) => {
      // ONE corpus scan: the dictionary (vocabulary-bounded) is cached and
      // every downstream consumer — both token sides and both frequency
      // joins — reads the cache, never the corpus again
      val names = nameDict(s, d) // memoized + persisted (one shared copy)
      val matched = matchedPairs(names)
      matched
        .join(broadcast(names.withColumnRenamed("name", "name_a")
          .withColumnRenamed("n_rows", "n_rows_a")), Seq("name_a"))
        .join(broadcast(names.withColumnRenamed("name", "name_b")
          .withColumnRenamed("n_rows", "n_rows_b")), Seq("name_b"))
        .select("name_a", "name_b", "dist", "n_rows_a", "n_rows_b")
    },
      Some(s"""WITH $matchSqlCtes
             |SELECT m.name_a, m.name_b, m.dist,
             |  CAST(na.n_rows AS BIGINT) AS n_rows_a,
             |  CAST(nb.n_rows AS BIGINT) AS n_rows_b
             |FROM m
             |JOIN names na ON na.name = m.name_a
             |JOIN names nb ON nb.name = m.name_b""".stripMargin)),

    // 208. entity clustering — the closure step between matching and
    // survivorship: transitive closure over the verified match pairs
    // (a~b, b~c ⇒ one entity) via the SAME min-label propagation the
    // near-dup families use (Components.minLabel — the pair graph is
    // dictionary-bounded, so the loop converges in 2-3 rounds of
    // (id, label) shuffles at any corpus size), then one consolidated
    // row per ENTITY: member census, total row support, and the
    // canonical name (highest row support, ties → lexicographically
    // first — the representativity rule MDM survivorship uses).
    // Published shape: Papadakis 2020's block→compare→cluster pipeline;
    // Fellegi-Sunter links, closure resolves. Names with no match are
    // their own singleton entity (entity_id = own nid). The oracle
    // closes the cluster with a recursive CTE — safe HERE at every
    // scale because the node set is the vocabulary-bounded dictionary,
    // never corpus rows (the same argument er_blocked_match's block
    // join rests on).
    GraftQuery("er_cluster", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val names = nameDict(s, d) // memoized + persisted (one shared copy)
      // map verified name pairs to int64 node ids (dictionary-bounded
      // declared broadcasts), close, and label every name
      val na = names.select(col("name").as("name_a"), col("nid").as("ia"))
      val nb = names.select(col("name").as("name_b"), col("nid").as("ib"))
      val idPairs = matchedPairs(names)
        .join(broadcast(na), Seq("name_a"))
        .join(broadcast(nb), Seq("name_b"))
        .select("ia", "ib")
      val labels = Components.minLabel(s, idPairs)
        .withColumnRenamed("id", "nid")
      val ent = names.join(labels, Seq("nid"), "left")
        .withColumn("entity_id", coalesce(col("label"), col("nid")))
      val w = Window.partitionBy(col("entity_id"))
        .orderBy(col("n_rows").desc, col("name").asc)
      ent.withColumn("rn", row_number().over(w))
        .groupBy("entity_id").agg(
          count(lit(1)).as("n_names"),
          sum("n_rows").as("n_rows"),
          max(when(col("rn") === 1, col("name"))).as("canonical_name"))
    },
      Some(s"""WITH RECURSIVE $matchSqlCtes,
             |p AS (SELECT na.nid AS ia, nb.nid AS ib
             |  FROM m
             |  JOIN names na ON na.name = m.name_a
             |  JOIN names nb ON nb.name = m.name_b),
             |${DuckSql.reachCc("p", "id", "label")},
             |ent AS (SELECT n.name, n.n_rows,
             |    COALESCE(cc.label, n.nid) AS entity_id
             |  FROM names n LEFT JOIN cc ON cc.id = n.nid),
             |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY entity_id
             |    ORDER BY n_rows DESC, name) AS rn FROM ent)
             |SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n_names,
             |  CAST(SUM(n_rows) AS BIGINT) AS n_rows,
             |  MAX(CASE WHEN rn = 1 THEN name END) AS canonical_name
             |FROM rk GROUP BY entity_id""".stripMargin)),

    // 212. multi-pass blocking funnel (Papadakis CSUR 2020: block
    // building with SEVERAL key functions trades recall against candidate
    // volume — the ER analog of dd_lsh_funnel's measured banding funnel):
    // run token blocking AND 2-char-prefix blocking over the same
    // dictionary, plus their union, and report per pass the candidates
    // generated and the pairs the levenshtein verify confirms. The
    // prefix pass exists precisely for er_blocked_match's DOCUMENTED
    // recall boundary — near names sharing no token ("abc"/"abd") are
    // invisible to token blocking but share a prefix key (spec-pinned:
    // the union pass recovers them). All passes stay on the
    // vocabulary-bounded dictionary (broadcast self-joins, candidates
    // never shuffle); the funnel is ONE plan — the three pass tables
    // union with a pass label and one aggregate scores them all.
    GraftQuery("er_multi_block", (s, d) => {
      val names = nameDict(s, d) // memoized + persisted (one shared copy)
      val ct = tokenCands(names)
      val cp = blockCands(names.select(col("name"),
        substring(col("name"), 1, 2).as("bk")))
      val cu = ct.union(cp).distinct()
      val all = ct.withColumn("pass", lit("block:token"))
        .union(cp.withColumn("pass", lit("block:prefix2")))
        .union(cu.withColumn("pass", lit("union")))
      all.withColumn("dist", levenshtein(col("name_a"), col("name_b")))
        .groupBy("pass").agg(
          count(lit(1)).as("n_cand"),
          sum(when(col("dist") <= 3, 1L).otherwise(0L)).as("n_matched"))
    },
      Some(s"""WITH $matchSqlCtes,
             |pf AS (SELECT name, substr(name, 1, 2) AS bk FROM names),
             |cp AS (SELECT DISTINCT a.name AS name_a, b.name AS name_b
             |  FROM pf a JOIN pf b ON a.bk = b.bk AND a.name < b.name),
             |cu AS (SELECT name_a, name_b FROM cand
             |  UNION SELECT name_a, name_b FROM cp),
             |allc AS (
             |  SELECT 'block:token' AS pass, name_a, name_b FROM cand
             |  UNION ALL SELECT 'block:prefix2', name_a, name_b FROM cp
             |  UNION ALL SELECT 'union', name_a, name_b FROM cu)
             |SELECT pass, CAST(COUNT(*) AS BIGINT) AS n_cand,
             |  CAST(SUM(CASE WHEN levenshtein(name_a, name_b) <= 3
             |      THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
             |FROM allc GROUP BY pass""".stripMargin)),

    // 201. survivorship / golden record: one consolidated row per
    // resolved entity (the exact-normalized name) with the standard MDM
    // merge policies — stable id = MIN key, value completeness = COUNT,
    // conflict census = DISTINCT brands, attribute merges MAX(price) /
    // MIN(size). Two-level aggregate (see object Scaladoc).
    GraftQuery("er_survivor", (s, d) => {
      val perBrand = Tables.t(s, d, "part")
        .select(lower(trim(col("p_name"))).as("name"), col("p_brand"),
          col("p_partkey"), col("p_retailprice"), col("p_size"))
        .groupBy("name", "p_brand").agg(
          count(lit(1)).as("n"), min("p_partkey").as("mk"),
          max("p_retailprice").as("mp"), min("p_size").as("ms"))
      perBrand.groupBy("name").agg(
        min("mk").as("canonical_key"), sum("n").as("n_rows"),
        count(lit(1)).as("n_brands"), max("mp").as("max_price"),
        min("ms").cast("long").as("min_size"))
    },
      Some("""WITH pb AS (SELECT lower(trim(p_name)) AS name, p_brand,
             |    COUNT(*) AS n, MIN(p_partkey) AS mk,
             |    MAX(p_retailprice) AS mp, MIN(p_size) AS ms
             |  FROM part GROUP BY 1, 2)
             |SELECT name, MIN(mk) AS canonical_key,
             |  CAST(SUM(n) AS BIGINT) AS n_rows,
             |  CAST(COUNT(*) AS BIGINT) AS n_brands,
             |  MAX(mp) AS max_price, CAST(MIN(ms) AS BIGINT) AS min_size
             |FROM pb GROUP BY name""".stripMargin)))
}
