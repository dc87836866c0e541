package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.3 — corpus-curation batch 2 (round 8, second wave): the
  * published rule-based quality filters and selection passes a training-data
  * pipeline runs AFTER dedup and BEFORE mixing, plus the gaps-and-islands
  * sequence pattern the reference's SQLite surface expresses with window
  * functions.
  *
  * Scale posture: every entry here is either a pure map-side projection
  * (ta_gopher_rules), one windowed shuffle on a low-cardinality key
  * (ta_quality_prune, q_gaps_islands — partition count = n_sources /
  * n_event_types, each partition streams), or a broadcast of ONE row
  * (emb_centroid_gate). Nothing is pairwise; nothing collects.
  *
  * Cross-engine float discipline (same as ta_quality / the ANN family):
  * integer-only predicates where possible, and any double arithmetic uses
  * a fixed evaluation order both engines reproduce bit-exactly.
  */
object Curation2 {

  private def docs(s: SparkSession, d: String) = Tables.t(s, d, "documents")

  private val toksExpr = "filter(split(text, ' '), t -> t <> '')"

  /** BPE batch size: merges learned per iteration (M), from a top-2M
    * candidate pool (K). The capacity knob on the VOCABULARY axis
    * (SURVEY §5): the plan chain is O(iterations) deep, so a target
    * vocabulary of V merges costs V/M iterations of plan depth — at
    * M = 1 (the classic algorithm) a 30k-merge tokenizer would need a
    * 30k-stage plan; batching is the published scale path (one frequency
    * count amortizes across every merge in the batch).
    *
    * Both axes are DEPLOYMENT CONFIG (the nprobe/LSH-banding discipline):
    * `spark.graft.bpe.iters` / `spark.graft.bpe.batch` (env
    * `SPARK_GRAFT_BPE_ITERS`/`SPARK_GRAFT_BPE_BATCH`), read ONCE at module
    * init; the Spark chain's loop bound, its limits, AND the DuckDB
    * oracle's unrolled CTE chain all derive from the same two ints, so an
    * override (a V=256 vocabulary = 32 iterations × 8) can never split
    * the engines. The candidate pool is derived (K = 2M — the pool must
    * dominate the batch so parallel greedy has conflicts to skip).
    * Malformed values fail loud and named — a typo'd vocabulary knob
    * silently training the 40-merge default is a different tokenizer
    * than the deployment configured. */
  private[graft] val defaultBpeIters = 5
  private[graft] val defaultBpeBatch = 8
  private[graft] def bpeKnobNow(prop: String, env: String, dflt: Int): Int =
    sys.props.get(prop).orElse(sys.env.get(env)).map { raw =>
      val v = raw.trim.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"$prop must be a positive integer, got '$raw'"))
      if (v <= 0) throw new IllegalArgumentException(
        s"$prop must be a positive integer, got '$raw'")
      v
    }.getOrElse(dflt)
  private[graft] def bpeConfigNow: (Int, Int) =
    (bpeKnobNow("spark.graft.bpe.iters", "SPARK_GRAFT_BPE_ITERS", defaultBpeIters),
      bpeKnobNow("spark.graft.bpe.batch", "SPARK_GRAFT_BPE_BATCH", defaultBpeBatch))
  private[graft] lazy val bpeIters: Int = bpeConfigNow._1
  private[graft] lazy val bpeBatch: Int = bpeConfigNow._2
  private[graft] lazy val bpeCand: Int = 2 * bpeBatch

  /** The declarative BATCHED BPE chain shared by ta_bpe_learn (the merge
    * table) and ta_bpe_apply (the final vocabulary symbol table). Per
    * iteration: pair counts (explode → partial-agg), top-K candidate pool
    * as a distributed TakeOrdered(K), then up to M NON-CONFLICTING merges
    * chosen by PARALLEL GREEDY — keep a candidate iff no higher-ranked
    * candidate shares a symbol with it (deterministic, declarative: a
    * ≤K-row self-anti-join, no sequential driver scan). Disjoint symbol
    * sets make the one-pass left-to-right fold order-independent: a batch
    * member can never consume another member's symbol, and a freshly
    * merged symbol is new — no member matches it. One broadcast row
    * carries the batch back; no collect, no driver loop over data; the
    * per-iteration working set is the VOCABULARY (persisted once — the
    * corpus is read exactly once, for the word count).
    * Returns (merges: it/rk/l/r/cnt, syms5: word/freq/syms). */
  private def bpeChain(s: SparkSession, d: String): (DataFrame, DataFrame) =
    bpeChainImpl(s, d, cut = true, bpeIters, bpeBatch, bpeCand)

  /** Config-parameterized constructor — GenScaleSpec exercises an
    * overridden (iters, batch) through the SAME chain the entries run. */
  private[graft] def bpeChainWith(s: SparkSession, d: String,
      iters: Int, batch: Int): (DataFrame, DataFrame) =
    bpeChainImpl(s, d, cut = true, iters, batch, 2 * batch)

  /** The same chain with the lineage cuts DISABLED — audit-only (one code
    * path, one flag): the snapped entry plan is a scan over materialized
    * snapshots, so the per-iteration plan shape (distributed TakeOrdered
    * argmax, declared one-row merge broadcast) is only visible on the
    * uncut composition. Never benched or oracled; PlanContracts routes
    * ta_bpe_learn's audit here. */
  private[graft] def bpeChainUncutForAudit(s: SparkSession, d: String): DataFrame =
    bpeChainImpl(s, d, cut = false, bpeIters, bpeBatch, bpeCand)._1

  /** One candidate pool: top-candK adjacent-pair counts over the current
    * vocabulary, rank-stamped (single-partition windows are fine: they
    * rank over ≤ candK rows). Extracted so GenScaleSpec can replay the
    * parallel-greedy rule against the REAL pool. */
  private[graft] def bpeCandPool(syms: DataFrame, candK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairsExpr =
      "CASE WHEN size(syms) < 2 THEN cast(array() as array<struct<l:string,r:string>>) " +
        "ELSE transform(sequence(1, size(syms) - 1), " +
        "j -> struct(element_at(syms, j) AS l, element_at(syms, j + 1) AS r)) END"
    syms
      .select(col("freq"), explode(expr(pairsExpr)).as("pr"))
      .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
      .agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("l"), col("r")).limit(candK)
      .withColumn("rk0", row_number().over(
        Window.orderBy(col("cnt").desc, col("l"), col("r"))))
  }

  /** PARALLEL GREEDY batch selection: keep a candidate iff NO
    * higher-ranked candidate shares a symbol with it — deterministic and
    * fully declarative (a ≤candK-row self-anti-join, no sequential driver
    * scan); disjoint symbol sets make the one-pass merge fold
    * order-independent. Extracted for the same replay pin. */
  private[graft] def bpeGreedyKeep(cand: DataFrame, batch: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    cand.as("a")
      .join(cand.as("b"),
        col("b.rk0") < col("a.rk0") && (col("b.l") === col("a.l")
          || col("b.l") === col("a.r") || col("b.r") === col("a.l")
          || col("b.r") === col("a.r")), "left_anti")
      .orderBy(col("rk0")).limit(batch)
      .withColumn("rk", row_number().over(Window.orderBy(col("rk0"))).cast("long"))
  }

  /** The word-count base vocabulary with its initial char split —
    * iteration 0's `syms` input, shared with the GenScaleSpec replay. */
  private[graft] def bpeInitSyms(s: SparkSession, d: String): DataFrame =
    OpCache.memo(s, "bpewords|" + d)(
      docs(s, d)
        .select(explode(expr(toksExpr)).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
        .persist())
      .withColumn("syms", expr("split(word, '')"))

  private def bpeChainImpl(s: SparkSession, d: String, cut: Boolean,
      iters: Int, batch: Int, candK: Int): (DataFrame, DataFrame) = {
    val initSyms = bpeInitSyms(s, d)
    // Lineage cut per iteration (the Components.scala snap discipline).
    // Without it, iteration i's plan embeds iteration i-1's chain TWICE —
    // once via kept (built from syms(i-1)) and once via the syms update
    // that crossJoins kept back in — i.e. 2^iters copies of the base plan;
    // Catalyst analysis + re-execution of those copies dominated the data
    // cost at every scale (sf1 ≈ sf10 wall time). Each snapshot is
    // vocabulary-sized (syms) or ≤ bpeBatch rows (kept); materialize the
    // successor FIRST, then release the predecessor it reads.
    var liveSyms: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = null
    def snap(df: DataFrame, vocabAxis: Boolean): DataFrame = if (!cut) df else {
      val rdd = df.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rdd.count()
      if (vocabAxis) {
        if (liveSyms != null) liveSyms.unpersist(false)
        liveSyms = rdd
      } else OpCache.trackHook(s, () => rdd.unpersist(false))
      s.createDataFrame(rdd, df.schema)
    }
    // the batch arrives as one broadcast row mb: array<struct<l,r>>
    val mergeFold =
      "aggregate(syms, cast(array() as array<string>), (out, x) -> " +
        "IF(size(out) > 0 AND exists(mb, p -> " +
        "p.l = element_at(out, size(out)) AND p.r = x), " +
        "concat(slice(out, 1, size(out) - 1), " +
        "array(concat(element_at(out, size(out)), x))), " +
        "concat(out, array(x))))"
    var syms = initSyms
    var merges: DataFrame = null
    for (i <- 0 until iters) {
      val cand = bpeCandPool(syms, candK)
      val kept = snap(bpeGreedyKeep(cand, batch), vocabAxis = false)
      val rows = kept.select(lit(i.toLong).as("it"), col("rk"),
        col("l"), col("r"), col("cnt"))
      merges = if (merges == null) rows else merges.unionAll(rows)
      syms = snap(syms
        .crossJoin(broadcast(kept.agg(
          expr("collect_list(struct(l, r))").as("mb"))))
        .withColumn("syms", expr(mergeFold))
        .drop("mb"), vocabAxis = true)
    }
    // the final vocabulary snapshot stays pinned — bpeSyms memoizes the
    // DataFrame over it; OpCache.release frees it with the other memos
    val finalSyms = liveSyms
    if (finalSyms != null) OpCache.trackHook(s, () => finalSyms.unpersist(false))
    (merges, syms)
  }

  /** The learned vocabulary symbol table as a standing artifact, memoized
    * per (session, dir) — in production the tokenizer is trained once and
    * every encode pass reads the snapshot (the minhashPairs discipline:
    * build cost amortizes across consumers; ta_bpe_learn still times the
    * full learning chain). The vocab is ≪ corpus, so the persist is a few
    * MB at any scale. */
  private[operators] def bpeSyms(s: SparkSession, d: String): DataFrame =
    OpCache.memo(s, "bpesyms|" + d)(bpeChain(s, d)._2.persist())

  /** Bench warmup hook: materialize the learned vocabulary so the encode
    * entry times encoding, not tokenizer training. */
  def warmBpe(s: SparkSession, d: String): Unit = {
    bpeSyms(s, d).write.format("noop").mode("overwrite").save(); ()
  }

  /** DuckDB mirror of bpeChain: the iterations unrolled as MATERIALIZED
    * recursive CTEs (the merge fold is a per-word positional recursion;
    * MATERIALIZED stops DuckDB inline-re-evaluating the chain). Per
    * iteration: c$i = top-K candidate pool with rank, b$i = the
    * parallel-greedy batch (NOT EXISTS a higher-ranked symbol-sharing
    * candidate, re-ranked 1..m), then the per-word fold merges against
    * batch MEMBERSHIP — carried as ONE list of [l, r] pairs read by an
    * UNCORRELATED scalar subquery + list_contains, NOT a correlated
    * EXISTS: DuckDB 1.0 mis-evaluates a correlated EXISTS against a
    * derived CTE inside a recursive part (word-INITIAL merges silently
    * skip — reproduced and pinned during round 10). Ends with
    * `b0..b{iters-1}` (merge rows) and `s{iters}` (final vocabulary
    * syms). Unrolled from the SAME config ints the Spark chain runs. */
  private[graft] def bpeSqlChainWith(iters: Int, batch: Int, cand: Int): String = {
    def iter(i: Int) =
      s"""p$i AS MATERIALIZED (SELECT pr.l AS l, pr.r AS r, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT freq, unnest(list_transform(range(1, len(syms)),
         |      j -> {'l': syms[j], 'r': syms[j+1]})) AS pr
         |    FROM s$i) t GROUP BY pr.l, pr.r),
         |c$i AS MATERIALIZED (SELECT l, r, cnt,
         |    ROW_NUMBER() OVER (ORDER BY cnt DESC, l, r) AS rk0
         |  FROM p$i ORDER BY cnt DESC, l, r LIMIT $cand),
         |b$i AS MATERIALIZED (SELECT l, r, cnt,
         |    CAST(ROW_NUMBER() OVER (ORDER BY rk0) AS BIGINT) AS rk
         |  FROM c$i a WHERE NOT EXISTS (SELECT 1 FROM c$i b WHERE b.rk0 < a.rk0
         |    AND (b.l = a.l OR b.l = a.r OR b.r = a.l OR b.r = a.r))
         |  ORDER BY rk0 LIMIT $batch),
         |mb$i AS MATERIALIZED (SELECT list([l, r]) AS mb FROM b$i),
         |rec$i (word, freq, j, out) AS (
         |  SELECT word, freq, 1, CAST([] AS VARCHAR[]) FROM s$i
         |  UNION ALL
         |  SELECT rec$i.word, rec$i.freq, j + 1,
         |    CASE WHEN len(out) > 0 AND list_contains((SELECT mb FROM mb$i),
         |        [out[len(out)], s.syms[j]])
         |      THEN list_append(out[1:len(out)-1], out[len(out)] || s.syms[j])
         |      ELSE list_append(out, s.syms[j]) END
         |  FROM rec$i JOIN s$i s USING (word) WHERE j <= len(s.syms)),
         |s${i + 1} AS MATERIALIZED (SELECT r.word, r.freq, r.out AS syms
         |  FROM rec$i r JOIN s$i s USING (word) WHERE r.j = len(s.syms) + 1)""".stripMargin
    s"""WITH RECURSIVE
       |words AS MATERIALIZED (SELECT tok AS word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
       |    FROM documents) GROUP BY tok),
       |s0 AS MATERIALIZED (SELECT word, freq, string_split(word, '') AS syms FROM words),
       |${(0 until iters).map(iter).mkString(",\n")}""".stripMargin
  }

  private lazy val bpeSqlChain: String =
    bpeSqlChainWith(bpeIters, bpeBatch, bpeCand)

  /** The merge-table oracle tail (`b0..b{iters-1}` unioned), generated
    * from the same iteration count as the chain. */
  private[graft] def bpeLearnSqlTail(iters: Int): String =
    (0 until iters).map { i =>
      if (i == 0) s"SELECT CAST(0 AS BIGINT) AS it, rk, l, r, cnt FROM b0"
      else s"UNION ALL SELECT $i, rk, l, r, cnt FROM b$i"
    }.mkString("\n  ")

  /** Gopher rule metrics, ONE definition for ta_gopher_rules and the
    * capstone's stage 1 (four drifting copies — Spark + SQL × two
    * entries — would silently break the composition invariant "the
    * pipeline must not resurrect a rejected doc"). Adds toks, n_words,
    * n_uniq, sum_len, n_sym, n_alpha, n_stop; Catalyst prunes whatever a
    * consumer doesn't reference. */
  private[operators] def gopherMetrics(df: DataFrame): DataFrame = df
    .withColumn("toks", expr(toksExpr))
    .withColumn("n_words", expr("size(toks)").cast("long"))
    .withColumn("n_uniq", expr("size(array_distinct(toks))").cast("long"))
    .withColumn("sum_len",
      expr("aggregate(transform(toks, t -> length(t)), 0L, (a, x) -> a + x)"))
    .withColumn("n_sym",
      (length(col("text")) - length(regexp_replace(col("text"), "#", ""))).cast("long")
        + ((length(col("text")) - length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3).cast("long"))
    .withColumn("n_alpha",
      expr("size(filter(toks, t -> t rlike '[a-zA-Z]'))").cast("long"))
    .withColumn("n_stop",
      expr("size(filter(toks, t -> t IN ('the','be','to','of','and','that','have','with')))").cast("long"))

  /** The composite quality score over gopherMetrics columns, shared by
    * ta_pipeline_curate and the grand capstone (ta_pipeline_full). */
  private[operators] def qualityCol: Column =
    lit(0.4) * (col("n_uniq") / col("n_words")) +
      lit(0.3) * least(col("n_words") / lit(200.0), lit(1.0)) +
      lit(0.3) * least(col("sum_len") / col("n_words") / lit(10.0), lit(1.0))
  private[operators] val qualitySql: String =
    "0.4 * (n_uniq / n_words) + 0.3 * least(n_words / 200.0, 1.0) " +
      "+ 0.3 * least(sum_len / n_words / 10.0, 1.0)"

  /** The conjunction of all five Gopher rules over gopherMetrics columns. */
  private[operators] def gopherKeep: Column =
    col("n_words") >= 50 && col("n_words") <= 100000 &&
      lit(3) * col("n_words") <= col("sum_len") &&
      col("sum_len") <= lit(10) * col("n_words") &&
      lit(10) * col("n_sym") <= col("n_words") &&
      lit(5) * col("n_alpha") >= lit(4) * col("n_words") &&
      col("n_stop") >= 2

  /** DuckDB mirror of gopherMetrics: CTE chain (no WITH prefix) ending
    * with `gm(doc_id, source, n_words, n_uniq, sum_len, n_sym, n_alpha,
    * n_stop)`. */
  private[operators] def gopherSqlCtesFor(src: String, textCol: String): String =
    s"""gt AS (SELECT doc_id, source, $textCol AS text,
      |    list_filter(string_split($textCol, ' '), t -> t <> '') AS toks
      |  FROM $src),
      |gm AS (SELECT doc_id, source,
      |    CAST(len(toks) AS BIGINT) AS n_words,
      |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
      |    CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS sum_len,
      |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
      |      + CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS n_sym,
      |    CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]'))) AS BIGINT) AS n_alpha,
      |    CAST(len(list_filter(toks,
      |      t -> t IN ('the','be','to','of','and','that','have','with'))) AS BIGINT) AS n_stop
      |  FROM gt)""".stripMargin

  private lazy val gopherSqlCtes: String = gopherSqlCtesFor("documents", "text")

  /** DuckDB mirror of gopherKeep. */
  private[operators] val gopherKeepSql: String =
    "n_words >= 50 AND n_words <= 100000 " +
      "AND 3 * n_words <= sum_len AND sum_len <= 10 * n_words " +
      "AND 10 * n_sym <= n_words AND 5 * n_alpha >= 4 * n_words " +
      "AND n_stop >= 2"

  val defs: Seq[GraftQuery] = Seq(

    // 169. Gopher quality rules (Rae et al. 2021, published thresholds):
    // word-count bounds, mean-word-length band, symbol-to-word ratio,
    // alphabetic-word fraction, minimum stopword evidence. Every predicate
    // is INTEGER arithmetic (3·n ≤ Σlen ≤ 10·n instead of a double mean;
    // 10·symbols ≤ n instead of ratio ≤ 0.1; 5·alpha ≥ 4·n instead of
    // fraction ≥ 0.8), so the oracle is bit-exact with no float contract.
    // Pure per-row projection — at 100 TB this is a map-only pass that
    // fuses into the parquet scan (no shuffle, no state).
    GraftQuery("ta_gopher_rules", (s, d) =>
      gopherMetrics(docs(s, d))
        .select(
          col("doc_id"), col("n_words"),
          (col("n_words") >= 50 && col("n_words") <= 100000).as("f_count"),
          (lit(3) * col("n_words") <= col("sum_len")
            && col("sum_len") <= lit(10) * col("n_words")).as("f_meanlen"),
          (lit(10) * col("n_sym") <= col("n_words")).as("f_symbol"),
          (lit(5) * col("n_alpha") >= lit(4) * col("n_words")).as("f_alpha"),
          (col("n_stop") >= 2).as("f_stop"))
        .withColumn("keep",
          col("f_count") && col("f_meanlen") && col("f_symbol")
            && col("f_alpha") && col("f_stop")),
      Some(s"""WITH $gopherSqlCtes
             |SELECT doc_id, n_words,
             |  n_words >= 50 AND n_words <= 100000 AS f_count,
             |  3 * n_words <= sum_len AND sum_len <= 10 * n_words AS f_meanlen,
             |  10 * n_sym <= n_words AS f_symbol,
             |  5 * n_alpha >= 4 * n_words AS f_alpha,
             |  n_stop >= 2 AS f_stop,
             |  ($gopherKeepSql) AS keep
             |FROM gm""".stripMargin)),

    // 170. quality-percentile pruning (the DCLM/FineWeb selection shape):
    // score every doc with the ta_quality formula (identical fixed-order
    // double arithmetic), then keep the top quartile PER SOURCE by
    // percent_rank — per-source so a high-scoring source can't crowd out
    // the rest of the mix. One windowed shuffle on `source`; the window
    // function streams each partition, so skewed sources cost memory O(1).
    GraftQuery("ta_quality_prune", (s, d) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("quality").desc, col("doc_id").asc)
      docs(s, d)
        .withColumn("toks", expr(toksExpr))
        .withColumn("n_toks", expr("size(toks)").cast("long"))
        .withColumn("n_uniq", expr("size(array_distinct(toks))").cast("long"))
        .withColumn("sum_len",
          expr("aggregate(transform(toks, t -> length(t)), 0L, (a, x) -> a + x)"))
        .withColumn("quality",
          lit(0.4) * (col("n_uniq") / col("n_toks"))
            + lit(0.3) * least(col("n_toks") / lit(200.0), lit(1.0))
            + lit(0.3) * least(col("sum_len") / col("n_toks") / lit(10.0), lit(1.0)))
        .withColumn("pr", percent_rank().over(w))
        .filter(col("pr") <= 0.25)
        .select("source", "doc_id", "quality", "pr")
    },
      Some("""WITH t AS (SELECT doc_id, source,
             |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
             |  FROM documents),
             |m AS (SELECT doc_id, source,
             |    CAST(len(toks) AS BIGINT) AS n_toks,
             |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
             |    CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS sum_len
             |  FROM t),
             |q AS (SELECT doc_id, source,
             |    0.4 * (n_uniq / n_toks)
             |      + 0.3 * least(n_toks / 200.0, 1.0)
             |      + 0.3 * least(sum_len / n_toks / 10.0, 1.0) AS quality
             |  FROM m),
             |r AS (SELECT source, doc_id, quality,
             |    PERCENT_RANK() OVER (PARTITION BY source
             |      ORDER BY quality DESC, doc_id ASC) AS pr
             |  FROM q)
             |SELECT source, doc_id, quality, pr FROM r WHERE pr <= 0.25""".stripMargin)),

    // 171. gaps-and-islands: collapse each event_type's event_id sequence
    // into maximal runs of consecutive ids (the classic id − row_number()
    // grouping key — a sequence gap starts a new island). The missing-id
    // report (monitoring ingestion holes) is this result's complement.
    // One windowed shuffle on event_type, then a partial-agg groupBy on
    // (event_type, grp) — both keyed, both stream; output size = number of
    // runs, never the row count.
    GraftQuery("q_gaps_islands", (s, d) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
      Tables.t(s, d, "events")
        .select(col("event_type"), col("event_id"))
        .withColumn("grp", col("event_id") - row_number().over(w).cast("long"))
        .groupBy(col("event_type"), col("grp"))
        .agg(min("event_id").as("island_start"),
          max("event_id").as("island_end"),
          count(lit(1)).as("island_len"))
        .select("event_type", "island_start", "island_end", "island_len")
    },
      Some("""WITH r AS (SELECT event_type, event_id,
             |    event_id - CAST(ROW_NUMBER() OVER (PARTITION BY event_type
             |      ORDER BY event_id) AS BIGINT) AS grp
             |  FROM events)
             |SELECT event_type,
             |  min(event_id) AS island_start,
             |  max(event_id) AS island_end,
             |  count(*) AS island_len
             |FROM r GROUP BY event_type, grp""".stripMargin)),

    // 172. centroid-cosine embedding gate (the CLIP-score filtering shape:
    // keep items whose embedding is close to a concept vector). The concept
    // centroid is the mean of a fixed 8-vector probe set, folded in sorted
    // vec_id order (collect_list → sort_array → left fold) so both engines
    // accumulate the identical double sequence; the centroid is ONE row,
    // broadcast to a map-only cosine + threshold pass over the corpus. At
    // 100 TB this is the cheapest possible semantic filter: no shuffle, no
    // index — scan · O(dim) per row.
    GraftQuery("emb_centroid_gate", (s, d) => {
      val e = Similarity.vecs(s, d)
      val cent = e.filter(col("vec_id") < 8)
        .groupBy()
        .agg(sort_array(collect_list(struct(col("vec_id"), col("v")))).as("ps"))
        .select(expr(
          "transform(aggregate(slice(ps, 2, size(ps) - 1), element_at(ps, 1).v, " +
            "(acc, p) -> zip_with(acc, p.v, (x, y) -> x + y)), x -> x / 8.0D)").as("cent"))
        .withColumn("cn2", expr("dot_product(cent, cent)"))
      e.crossJoin(broadcast(cent))
        .withColumn("cos",
          expr("dot_product(cent, v)") / (sqrt(col("cn2")) * sqrt(col("n2"))))
        .filter(col("cos") >= 0.10)
        .select("vec_id", "label", "cos")
    },
      Some(s"""WITH e AS (SELECT vec_id, label,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings),
             |p AS (SELECT list(v ORDER BY vec_id) AS ps FROM e WHERE vec_id < 8),
             |c AS (SELECT list_transform(
             |    list_reduce(ps, (a, b) -> list_transform(range(1, len(a) + 1), i -> a[i] + b[i])),
             |    x -> x / 8.0) AS cent FROM p),
             |n AS (SELECT vec_id, label, v,
             |    ${Similarity.duckDot("v", "v")} AS n2 FROM e),
             |s AS (SELECT vec_id, label,
             |    ${Similarity.duckDot("cent", "v")} /
             |      (sqrt(${Similarity.duckDot("cent", "cent")}) * sqrt(n2)) AS cos
             |  FROM n, c)
             |SELECT vec_id, label, cos FROM s WHERE cos >= 0.10""".stripMargin)),

    // 173. BPE merge learning (Sennrich et al. 2016): learn iters × M
    // merge rules (config; default 5 × 8 = 40, a V = 256 vocabulary is
    // SPARK_GRAFT_BPE_ITERS=32 — oracle-verified, SURVEY §5 has the
    // depth-cost curve) over the corpus vocabulary, fully declaratively —
    // each
    // iteration counts adjacent symbol pairs weighted by word frequency
    // (explode → partial-agg groupBy), takes the argmax pair as a
    // distributed TakeOrdered(1) (total order: cnt desc, l, r), broadcasts
    // that ONE row back, and applies the greedy left-to-right merge as a
    // per-word array fold. No collect, no driver loop over data: the 5
    // iterations are a fixed plan chain whose per-iteration working set is
    // the VOCABULARY (≪ corpus; persisted once), so at 100 TB the corpus
    // is read exactly once for the word count and never again. Oracle:
    // the same 5 iterations unrolled as recursive CTEs (the merge fold is
    // a per-word positional recursion), MATERIALIZED so DuckDB doesn't
    // inline-re-evaluate the iteration chain.
    GraftQuery("ta_bpe_learn", (s, d) => bpeChain(s, d)._1,
      Some(s"""$bpeSqlChain
             |SELECT * FROM (
             |  ${bpeLearnSqlTail(bpeIters)}) ORDER BY it, rk""".stripMargin)),

    // 178. apply the learned BPE merges back to the corpus — the encode
    // side of ta_bpe_learn, reporting per-doc compression: each word's
    // token count after the learned merges comes from the final vocabulary symbol
    // table (word-keyed equi-join — the corpus never re-tokenizes; the
    // vocabulary carries the encoding), then one doc_id re-aggregation.
    // n_chars/n_tokens are integer sums (exact); ratio is one double
    // division. At 100 TB: corpus → words explode is the same shuffle
    // shape as the word count; the vocab join co-partitions on word.
    GraftQuery("ta_bpe_apply", (s, d) => {
      val syms5 = bpeSyms(s, d)
      val enc = syms5.select(col("word"),
        expr("CAST(size(syms) AS BIGINT)").as("toklen"),
        length(col("word")).cast("long").as("wlen"))
      val perDoc = docs(s, d)
        .select(col("doc_id"), explode(expr(toksExpr)).as("word"))
        .join(enc, Seq("word"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("w"),
          sum("wlen").as("c"),
          sum("toklen").as("t"))
      // aggregate FROM the documents side: explode produces no rows for a
      // zero-token doc, so a doc-side left join (counts coalesced to 0,
      // ratio NULL) is the only shape that keeps out.count == docs.count —
      // GenScale deliberately preserves empty docs even when this sf tile
      // has none.
      docs(s, d).select("doc_id")
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("w"), lit(0L)).as("n_words"),
          coalesce(col("c"), lit(0L)).as("n_chars"),
          coalesce(col("t"), lit(0L)).as("n_tokens"))
        .withColumn("ratio",
          when(col("n_tokens") === 0, lit(null).cast("double"))
            .otherwise(col("n_chars").cast("double") / col("n_tokens").cast("double")))
    },
      Some(s"""$bpeSqlChain,
             |enc AS (SELECT word, CAST(len(syms) AS BIGINT) AS toklen,
             |    CAST(length(word) AS BIGINT) AS wlen FROM s$bpeIters),
             |dw AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
             |  FROM documents),
             |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS w,
             |    CAST(sum(e.wlen) AS BIGINT) AS c,
             |    CAST(sum(e.toklen) AS BIGINT) AS t
             |  FROM dw JOIN enc e USING (word) GROUP BY doc_id)
             |SELECT d.doc_id, coalesce(pd.w, 0) AS n_words,
             |  coalesce(pd.c, 0) AS n_chars,
             |  coalesce(pd.t, 0) AS n_tokens,
             |  CASE WHEN coalesce(pd.t, 0) = 0 THEN NULL
             |       ELSE CAST(pd.c AS DOUBLE) / CAST(pd.t AS DOUBLE) END AS ratio
             |FROM documents d LEFT JOIN pd USING (doc_id)""".stripMargin)),

    // 174. cohort retention (week-granular): cohort = each user's first
    // active week (window min over user_id — no self-join), activity =
    // distinct (user, week), report = users active at each week offset
    // from their cohort. date_trunc('week') is Monday-start in both
    // engines and the offset division is exact (week-aligned timestamps),
    // so the matrix is integer-deterministic. Shuffles: one on user_id
    // (window), then the countDistinct two-phase agg on (cohort, offset).
    GraftQuery("q_retention", (s, d) => {
      val w = Window.partitionBy(col("user_id"))
      Tables.t(s, d, "events")
        .select(col("user_id"),
          // DATE-typed week start on both engines (DuckDB's date_trunc
          //('week', ts) returns DATE; Spark's returns TIMESTAMP)
          expr("to_date(date_trunc('week', ts))").as("wk"))
        .withColumn("cohort", min("wk").over(w))
        .withColumn("week_offset",
          expr("CAST(datediff(wk, cohort) DIV 7 AS BIGINT)"))
        .groupBy("cohort", "week_offset")
        .agg(countDistinct("user_id").as("n_users"))
    },
      Some("""WITH e AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
             |c AS (SELECT user_id, wk,
             |    min(wk) OVER (PARTITION BY user_id) AS cohort
             |  FROM e)
             |SELECT cohort,
             |  CAST(date_diff('day', cohort, wk) // 7 AS BIGINT) AS week_offset,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM c GROUP BY cohort, week_offset""".stripMargin)),

    // 176. DSIR importance weighting (Xie et al. 2023, Data Selection via
    // Importance Resampling): score every raw doc by how target-like its
    // hashed n-gram profile is — w(doc) = Π_g p_tgt(h(g)) / p_raw(h(g))
    // over word uni+bigrams hashed to 64 buckets (md5-prefix hash shared
    // with ta_split so the oracle recomputes identical buckets), add-1
    // smoothed. The two 64-bucket feature distributions are ONE broadcast
    // row each; scoring is a map-only per-doc fold in gram position order
    // (no cross-row float accumulation — the only sums are integer bucket
    // counts), so the corpus is scanned twice (histogram + score) and
    // nothing else moves. Target proxy: the 'src0' source slice.
    GraftQuery("ta_dsir", (s, d) =>
      dsirScores(s, d).select("doc_id", "n_grams", "w"),
      Some(s"""WITH $dsirSqlCtes
             |SELECT doc_id, n_grams, w FROM sc""".stripMargin)),

    // 183. fastText-SHAPE quality classifier (Joulin et al. 2016; the
    // selector DCLM-style pipelines run next to Gopher/DSIR): a hashed
    // bag-of-n-grams LINEAR scorer — features are the SAME unigram+bigram
    // md5-bucket stream as DSIR (one feature-store pass, shared memo),
    // weights learned in ONE CLOSED-FORM pass from a labeled slice, and
    // scoring is a map-only broadcast dot product. The weights are the
    // class-frequency difference in EXACT integer arithmetic,
    // w_b = pos_b·NEG − neg_b·POS (the log-odds' sign structure without
    // the libm log whose last ulp differs across engines — SURVEY §6),
    // so score = Σ_g w_bucket(g) is a BIGINT both engines reproduce
    // bit-for-bit, and Σ_b w_b ≡ 0 by construction (spec-pinned).
    // The labeled slice is FIXED-SIZE (doc_id < 4000 — labeled sets are
    // curated by humans and do not grow with the crawl; the r9 capstone
    // lesson), which also bounds |w_b| ≤ POS·NEG at ANY corpus size.
    // Scale shape: slice histograms are bounded-input aggregations; the
    // corpus side crosses ONE declared one-row broadcast (the weight
    // vector) and never shuffles.
    GraftQuery("ta_quality_classifier", (s, d) =>
      classifierScores(s, d).withColumn("keep", col("score") > 0),
      Some(s"""WITH $classifierSqlCtes
             |SELECT doc_id, n_grams, score, score > 0 AS keep FROM sc""".stripMargin)),

    // 180. the CURATION CAPSTONE — one declarative plan chaining the whole
    // post-crawl curation stack in production order (the way dd_pipeline
    // composes the dedup family): Gopher rule gate → per-source quality-
    // percentile prune → exact-dedup keep set + near-dup anti-join against
    // the shared MinHash pair index → benchmark decontamination (relative
    // 8-gram containment: the n_hits>=5 absolute gate of dd_decontaminate
    // flags ~100% of any same-domain corpus — a drop filter needs the
    // CONTAINMENT fraction, threshold 0.5 with background p99≈0.41) →
    // DSIR importance weights (corpus-wide distributions, shared memo) →
    // temperature mixing weights over the SURVIVORS → 256-token sequence
    // packing → deterministic 80/10/10 split. Output: the curated-manifest
    // row a training loader consumes (doc, weights, bin, split).
    //
    // Scale shape: the corpus is scanned THREE times (manifest projection,
    // 8-gram restrict join, DSIR — whose gram pass is the shared memo) and
    // never carries text through a shuffle: the rule gate + quality window
    // move a 4-column manifest keyed by source; dedup joins are
    // id-vs-id; the bench shingle set, both DSIR distributions, and the
    // mixing-weight row are broadcasts; packing windows per source. Every
    // corpus-order-sensitive number is integer-derived; the five output
    // doubles are fixed-shape divisions/folds both engines reproduce
    // bit-exactly.
    GraftQuery("ta_pipeline_curate", (s, d) => {
      graft.functions.F.register(s)
      val base = docs(s, d)
      // 1. Gopher rule gate + quality (one map-only projection, slim
      // manifest) — the SAME gopherMetrics/gopherKeep definitions as the
      // standalone ta_gopher_rules entry, by construction
      val manifest = gopherMetrics(base)
        .filter(gopherKeep)
        .withColumn("quality", qualityCol)
        .select(col("doc_id"), col("source"),
          col("n_words").as("n_toks"), col("quality"))
      // 2. per-source quality prune (top half; one slim window shuffle)
      val pruned = manifest
        .withColumn("prr", percent_rank().over(Window.partitionBy(col("source"))
          .orderBy(col("quality").desc, col("doc_id").asc)))
        .filter(col("prr") <= 0.5)
        .drop("prr")
      // 3. exact-dedup keep set + near-dup anti-join (the indexed shape of
      // dd_pipeline_indexed: the pair index amortizes across runs)
      val keepIds = base.groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
      val dupIb = Similarity.minhashPairs(s, d)
        .select(col("ib").as("doc_id")).distinct()
      val dd = pruned.join(keepIds, Seq("doc_id"))
        .join(dupIb, Seq("doc_id"), "left_anti")
      // 4. decontamination by relative 8-gram containment vs the broadcast
      // benchmark shingle set; shingling is restricted to the survivors.
      // The bench set is FIXED-SIZE (ids < 600 — ≤ 6 docs at any sf), not
      // corpus-proportional: real eval suites don't grow with the crawl,
      // and a proportional stand-in (dd_decontaminate's doc_id % 97 alone)
      // makes background containment scale with corpus size until the 0.5
      // gate drops EVERYTHING (measured at the sf1 tile: a 515-doc bench
      // union flags 944/944 sampled docs; the fixed 6-doc set flags 3).
      val bench = base.filter(col("doc_id") % 97 === 0 && col("doc_id") < 600)
        .select(explode(expr("char_shingles(text, 8)")).as("sg")).distinct()
      val hits = base.join(dd.select("doc_id"), Seq("doc_id"))
        .withColumn("sh", expr("char_shingles(text, 8)"))
        .withColumn("n_sh", expr("CAST(size(sh) AS BIGINT)"))
        .select(col("doc_id"), col("n_sh"), explode(col("sh")).as("sg"))
        .join(broadcast(bench), Seq("sg"), "left_semi")
        .groupBy("doc_id", "n_sh").agg(count(lit(1)).as("n_hits"))
      val clean = OpCache.track(s, dd
        .join(hits, Seq("doc_id"), "left")
        .withColumn("contain",
          coalesce(col("n_hits").cast("double") / col("n_sh"), lit(0.0)))
        .filter(col("contain") < 0.5)
        .select("doc_id", "source", "n_toks", "quality", "contain")
        .persist())
      // 5. DSIR weights (corpus-wide distributions — the shared memo)
      val dsir = dsirScores(s, d).select(col("doc_id"), col("w").as("dsir_w"))
      // 6. temperature mixing weights over the survivors (τ = 2)
      val perSrc = clean.groupBy("source").agg(count(lit(1)).as("n_docs"))
      val z = perSrc.agg(expr(
        "aggregate(transform(array_sort(collect_list(struct(source, n_docs))), " +
          "x -> sqrt(CAST(x.n_docs AS DOUBLE))), CAST(0 AS DOUBLE), (a, w) -> a + w)")
        .as("z"))
      val mix = perSrc.crossJoin(broadcast(z))
        .select(col("source"),
          (sqrt(col("n_docs").cast("double")) / col("z")).as("src_weight"))
      // 7. 256-token sequence packing per source + 8. deterministic split
      val w = Window.partitionBy(col("source"))
        .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
      clean
        .withColumn("bin",
          floor(coalesce(sum(col("n_toks")).over(w), lit(0L)) / 256L))
        .join(dsir, Seq("doc_id"))
        .join(broadcast(mix), Seq("source"))
        .withColumn("bucket",
          conv(substring(md5(concat(col("source"), lit(":"),
            col("doc_id").cast("string"))), 1, 8), 16, 10)
            .cast("long") % 100)
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val").otherwise("test"))
        .select("doc_id", "source", "n_toks", "quality", "contain",
          "dsir_w", "src_weight", "bin", "split")
    },
      Some(s"""${Similarity.minhashPairsSql},
             |$gopherSqlCtes,
             |gop AS (SELECT doc_id, source, n_words, n_uniq, sum_len FROM gm
             |  WHERE $gopherKeepSql),
             |qq AS (SELECT doc_id, source, n_words AS n_toks,
             |    $qualitySql AS quality
             |  FROM gop),
             |prq AS (SELECT *, PERCENT_RANK() OVER (PARTITION BY source
             |    ORDER BY quality DESC, doc_id) AS prr FROM qq),
             |pruned AS (SELECT doc_id, source, n_toks, quality FROM prq WHERE prr <= 0.5),
             |keepx AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
             |dupx AS (SELECT DISTINCT ib AS doc_id FROM p),
             |ddx AS (SELECT pruned.* FROM pruned JOIN keepx USING (doc_id)
             |  ANTI JOIN dupx USING (doc_id)),
             |shd AS (SELECT d2.doc_id, list_distinct(list_transform(
             |    range(1, length(d2.text) - 6), i -> substr(d2.text, i, 8))) AS sh
             |  FROM documents d2),
             |bsx AS (SELECT DISTINCT unnest(sh) AS sg FROM shd
             |  WHERE doc_id % 97 = 0 AND doc_id < 600),
             |trx AS (SELECT s.doc_id, CAST(len(s.sh) AS BIGINT) AS n_sh, unnest(s.sh) AS sg
             |  FROM shd s JOIN ddx USING (doc_id)),
             |hx AS (SELECT doc_id, any_value(n_sh) AS n_sh, CAST(COUNT(*) AS BIGINT) AS n_hits
             |  FROM trx JOIN bsx USING (sg) GROUP BY doc_id),
             |clean AS (SELECT ddx.*,
             |    COALESCE(CAST(hx.n_hits AS DOUBLE) / hx.n_sh, CAST(0 AS DOUBLE)) AS contain
             |  FROM ddx LEFT JOIN hx USING (doc_id)
             |  WHERE COALESCE(CAST(hx.n_hits AS DOUBLE) / hx.n_sh, CAST(0 AS DOUBLE)) < 0.5),
             |$dsirSqlCtes,
             |mixn AS (SELECT source, COUNT(*) AS n_docs FROM clean GROUP BY source),
             |mz AS (SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
             |    list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY source)), (a, w) -> a + w) AS z
             |  FROM mixn),
             |mw AS (SELECT source, sqrt(CAST(n_docs AS DOUBLE)) / mz.z AS src_weight
             |  FROM mixn CROSS JOIN mz),
             |packed AS (SELECT c.doc_id, c.source, c.n_toks, c.quality, c.contain,
             |    COALESCE(SUM(c.n_toks) OVER (PARTITION BY c.source ORDER BY c.doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
             |  FROM clean c),
             |fin AS (SELECT pk.doc_id, pk.source, pk.n_toks, pk.quality, pk.contain,
             |    sc.w AS dsir_w, mw.src_weight,
             |    CAST(FLOOR(prior / 256) AS BIGINT) AS bin,
             |    ${Relational.duckHex8("md5(pk.source || ':' || CAST(pk.doc_id AS VARCHAR))", 1)} % 100 AS bucket
             |  FROM packed pk JOIN sc USING (doc_id) JOIN mw USING (source))
             |SELECT doc_id, source, n_toks, quality, contain, dsir_w, src_weight, bin,
             |  CASE WHEN bucket < 80 THEN 'train'
             |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
             |FROM fin""".stripMargin))
  )

  /** Shared DSIR scoring chain (ta_dsir + ta_pipeline_curate): per-doc
    * importance weight from two broadcast 64-bucket hashed-gram
    * distributions. Returns (doc_id, n_grams, w). The bucketed-gram table
    * feeds THREE consumers (raw histogram, target histogram, scoring
    * pass) — materialized once under a shared memo key; the md5 bucketing
    * is the native codegen'd md5_buckets (the HOF-chain formulation ran
    * interpreted at 26.6 s on the sf0.1 gram stream). */
  // `final` + literal = compile-time constant, safe to reference from
  // `defs` above regardless of object-initialization order (a plain val
  // here reads 0 during defs init — the scalac warning is the guard)
  private[operators] final val dsirB = 64

  /** The hashed-n-gram FEATURE STORE (doc_id, source, bks: array of
    * unigram+bigram md5-bucket ids), memoized per (session, dir) — ONE
    * feature-extraction pass shared by DSIR (importance weights) and the
    * quality classifier (linear scorer): the production feature-store
    * pattern, and the reason the classifier's marginal cost is one
    * map-only scoring pass. */
  private[graft] def dsirBuckets(s: SparkSession, d: String): DataFrame = {
    graft.functions.F.register(s)
    OpCache.memo(s, "dsirbks|" + d)(
      Tables.widened(s, d, "documents")
        .withColumn("toks", expr(toksExpr))
        .withColumn("grams", expr(
          "concat(toks, CASE WHEN size(toks) < 2 THEN cast(array() as array<string>) " +
            "ELSE transform(sequence(1, size(toks) - 1), " +
            "i -> concat(element_at(toks, i), '_', element_at(toks, i + 1))) END)"))
        .withColumn("bks", expr(s"md5_buckets(grams, $dsirB)"))
        .select("doc_id", "source", "bks")
        .persist())
  }

  /** Dense B-bucket histogram of a bks frame as ONE row (arr, tot). */
  private def bucketHist(df: DataFrame): DataFrame = df
    .select(explode(col("bks")).as("b"))
    .groupBy("b").agg(count(lit(1)).as("c"))
    .agg(map_from_entries(sort_array(collect_list(struct(col("b"), col("c"))))).as("m"),
      sum("c").as("tot"))
    .select(expr(
      s"transform(sequence(0, ${dsirB - 1}), bb -> coalesce(element_at(m, CAST(bb AS BIGINT)), 0L))")
      .as("arr"), col("tot"))

  /** Shared fastText-shape classifier score chain — ta_quality_classifier
    * returns it directly and the paired multimodal gate
    * (mm_pipeline_paired) joins it as the caption-side quality gate:
    * (doc_id, n_grams, score). One feature-store pass (the memoized DSIR
    * buckets), one closed-form exact-integer weight row broadcast,
    * map-only scoring. */
  private[graft] def classifierScores(s: SparkSession, d: String): DataFrame = {
    val gb = dsirBuckets(s, d)
    val lab = gb.filter(col("doc_id") < 4000)
    val pos = bucketHist(lab.filter(col("source") === "src0"))
      .select(col("arr").as("parr"), col("tot").as("ptot"))
    val neg = bucketHist(lab.filter(col("source") =!= "src0"))
      .select(col("arr").as("narr"), col("tot").as("ntot"))
    val wrow = pos.crossJoin(broadcast(neg)).select(expr(
      s"transform(sequence(1, $dsirB), i -> " +
        "element_at(parr, i) * ntot - element_at(narr, i) * ptot)").as("warr"))
    gb.crossJoin(broadcast(wrow))
      .select(col("doc_id"),
        expr("CAST(size(bks) AS BIGINT)").as("n_grams"),
        expr("aggregate(bks, CAST(0 AS BIGINT), " +
          "(a, b) -> a + element_at(warr, CAST(b AS INT) + 1))").as("score"))
  }

  /** DuckDB mirror of classifierScores (no WITH prefix): extends
    * dsirGbCtes, ends with `sc(doc_id, n_grams, score)`. */
  private[operators] lazy val classifierSqlCtes: String =
    s"""$dsirGbCtes,
       |lab AS (SELECT * FROM gb WHERE doc_id < 4000),
       |pm AS (SELECT map_from_entries(list({'k': b, 'v': c} ORDER BY b)) AS m,
       |    CAST(sum(c) AS BIGINT) AS tot
       |  FROM (SELECT b, CAST(count(*) AS BIGINT) AS c
       |    FROM (SELECT unnest(bks) AS b FROM lab WHERE source = 'src0') GROUP BY b)),
       |nm AS (SELECT map_from_entries(list({'k': b, 'v': c} ORDER BY b)) AS m,
       |    CAST(sum(c) AS BIGINT) AS tot
       |  FROM (SELECT b, CAST(count(*) AS BIGINT) AS c
       |    FROM (SELECT unnest(bks) AS b FROM lab WHERE source <> 'src0') GROUP BY b)),
       |wd AS (SELECT
       |    (SELECT list_transform(range(0, $dsirB), bb -> coalesce(m[bb][1], CAST(0 AS BIGINT))) FROM pm) AS parr,
       |    (SELECT list_transform(range(0, $dsirB), bb -> coalesce(m[bb][1], CAST(0 AS BIGINT))) FROM nm) AS narr,
       |    (SELECT tot FROM pm) AS ptot,
       |    (SELECT tot FROM nm) AS ntot),
       |w AS (SELECT list_transform(range(1, ${dsirB + 1}), i ->
       |    parr[CAST(i AS INTEGER)] * ntot - narr[CAST(i AS INTEGER)] * ptot) AS warr
       |  FROM wd),
       |sc AS (SELECT doc_id, CAST(len(bks) AS BIGINT) AS n_grams,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(bks,
       |      b -> warr[CAST(b + 1 AS INTEGER)])), (a, x) -> a + x) AS score
       |  FROM gb, w)""".stripMargin

  private[operators] def dsirScores(s: SparkSession, d: String): DataFrame = {
    val gb = dsirBuckets(s, d)
    val raw = bucketHist(gb).select(col("arr").as("rarr"), col("tot").as("rtot"))
    val tgt = bucketHist(gb.filter(col("source") === "src0"))
      .select(col("arr").as("tarr"), col("tot").as("ttot"))
    gb.crossJoin(broadcast(raw)).crossJoin(broadcast(tgt))
      .select(col("doc_id"),
        expr("CAST(size(bks) AS BIGINT)").as("n_grams"),
        expr(
          "aggregate(bks, CAST(1.0 AS DOUBLE), (a, b) -> a * " +
            "((CAST(element_at(tarr, CAST(b AS INT) + 1) + 1 AS DOUBLE) / CAST(ttot + 64 AS DOUBLE)) " +
            "/ (CAST(element_at(rarr, CAST(b AS INT) + 1) + 1 AS DOUBLE) / CAST(rtot + 64 AS DOUBLE))))")
          .as("w"))
  }

  /** DuckDB mirror of dsirBuckets: the shared feature-store CTE prefix
    * (no WITH), ending with `gb(doc_id, source, bks)` — DSIR and the
    * quality classifier both extend it, as their Spark sides share the
    * memoized frame. */
  private[operators] lazy val dsirGbCtes: String = {
    val hex8 = "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 9), " +
      "i -> CAST(strpos('0123456789abcdef', substr(md5(g), CAST(i AS INTEGER), 1)) - 1 AS BIGINT))), " +
      "(a, x) -> a * 16 + x)"
    s"""t0 AS (SELECT doc_id, source,
       |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
       |  FROM documents),
       |g0 AS (SELECT doc_id, source,
       |    list_concat(toks,
       |      CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[])
       |        ELSE list_transform(range(1, len(toks)), i -> toks[i] || '_' || toks[i+1]) END) AS grams
       |  FROM t0),
       |gb AS (SELECT doc_id, source,
       |    list_transform(grams, g -> ($hex8 % $dsirB)) AS bks FROM g0)""".stripMargin
  }

  /** DuckDB mirror of dsirScores; CTE chain (no WITH prefix) ending with
    * `sc(doc_id, n_grams, w)`. (lazy: referenced from `defs`, which
    * initializes first.) */
  private[operators] lazy val dsirSqlCtes: String = {
    s"""$dsirGbCtes,
       |rawm AS (SELECT map_from_entries(list({'k': b, 'v': c} ORDER BY b)) AS m, sum(c) AS tot
       |  FROM (SELECT b, CAST(count(*) AS BIGINT) AS c
       |    FROM (SELECT unnest(bks) AS b FROM gb) GROUP BY b)),
       |tgtm AS (SELECT map_from_entries(list({'k': b, 'v': c} ORDER BY b)) AS m, sum(c) AS tot
       |  FROM (SELECT b, CAST(count(*) AS BIGINT) AS c
       |    FROM (SELECT unnest(bks) AS b FROM gb WHERE source = 'src0') GROUP BY b)),
       |dist AS (SELECT
       |    (SELECT list_transform(range(0, 64), bb -> coalesce(m[bb][1], CAST(0 AS BIGINT))) FROM rawm) AS rarr,
       |    (SELECT list_transform(range(0, 64), bb -> coalesce(m[bb][1], CAST(0 AS BIGINT))) FROM tgtm) AS tarr,
       |    (SELECT tot FROM rawm) AS rtot,
       |    (SELECT tot FROM tgtm) AS ttot),
       |sc AS (SELECT doc_id, CAST(len(bks) AS BIGINT) AS n_grams,
       |    list_reduce(list_prepend(CAST(1.0 AS DOUBLE), list_transform(bks,
       |      b -> (CAST(tarr[b + 1] + 1 AS DOUBLE) / CAST(ttot + 64 AS DOUBLE))
       |         / (CAST(rarr[b + 1] + 1 AS DOUBLE) / CAST(rtot + 64 AS DOUBLE)))),
       |      (a, x) -> a * x) AS w
       |  FROM gb, dist)""".stripMargin
  }
}
