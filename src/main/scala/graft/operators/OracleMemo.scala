package graft.operators

/** Memoized-oracle plan for the sf1+ sweep (tools/verify_sweep.py).
  *
  * The md5-MinHash signature chain (DuckSql.sigCtes) is shared text inside
  * 18 oracle queries; at sf1 DuckDB recomputes it from scratch per query
  * (~10× its sf0.1 cost → the 12 timeout rows of CORRECTNESS_sf1 r11).
  * This module is the oracle-side analog of Similarity.minhashPairs'
  * standing-index discipline: materialize the shared signature tables ONCE
  * per sweep into parquet side-files, then run each oracle with its chain
  * prefix swapped for a read of the memo.
  *
  * Lockstep rules:
  *  - every swap is an EXACT-substring replacement of chain text built
  *    from the same DuckSql constants the plain oracles embed; require()
  *    fails the whole sweep loudly if an oracle's text drifts;
  *  - the memo build (DuckSql.slBuild — a 4.3× faster list-fold
  *    formulation) is re-checked against the plain sigCtes text on a doc
  *    sample EVERY sweep (DuckSql.slCheck), so the two formulations can't
  *    drift silently;
  *  - the driver's sf0.01 gate keeps using the UNSWAPPED oracle_sql.json —
  *    memoization only ever touches the scale sweep.
  *
  * Component-closure entries (the recursive-CTE class DuckDB OOMs on at
  * sf1 — transitive closure cannot spill) are covered by the union-find
  * REPLAY: the pair set is materialized by DuckDB from the memoized chain,
  * Python union-find replays min-label components (a deterministic
  * function of the pair set), and the oracle's reachCc block is swapped
  * for a read of the replayed labels (DuckSql.reachCcReplay). Everything
  * downstream of cc still runs in DuckDB.
  */
object OracleMemo {

  /** Path placeholder the sweep runner substitutes with its memo dir. */
  val dirToken = "$GRAFT_MEMO_DIR"

  private def rd(f: String): String =
    s"SELECT * FROM read_parquet('$dirToken/$f.parquet')"

  // ---- exact chain prefixes as they appear inside the plain oracles ----

  private def dSig(src: String, id: String, n: Int): String =
    s"d AS (${DuckSql.shingles(src, id, n)}),\n${DuckSql.sigCtes(id)}"

  /** 5-gram chain over documents (minhashPairsSql and dd_incremental). */
  private val s5 = dSig("documents", "doc_id", 5)
  private val s5m =
    s"d AS (${DuckSql.shingles("documents", "doc_id", 5)}),\n" +
      s"sl AS (${rd("mh5_sl")})"

  /** 3-gram chain over documents (dd_ngram_jaccard). */
  private val s3 = dSig("documents", "doc_id", 3)
  private val s3m =
    s"d AS (${DuckSql.shingles("documents", "doc_id", 3)}),\n" +
      s"sl AS (${rd("mh3_sl")})"

  /** 3-gram chain over the exact-dedup survivors (dd_pipeline): shingles
    * and signatures are doc-local, so the memo over all documents
    * restricted to the kept ids IS the chain over `kept`. */
  private val sk = dSig("kept", "doc_id", 3)
  private val skm =
    s"d AS (${DuckSql.shingles("kept", "doc_id", 3)}),\n" +
      s"""sl AS (SELECT m.doc_id, m.sig
         |  FROM read_parquet('$dirToken/mh3_sl.parquet') m
         |  JOIN keep USING (doc_id))""".stripMargin

  /** Source-keyed chain (dd_source_overlap): the per-source union sketch
    * equals the ELEMENTWISE MIN of its members' per-doc sketches —
    * sig[j] = min over the shingle union = min over docs of each doc's
    * min — so the memoized form folds mh5_sl instead of re-hashing every
    * (source, shingle) draw. The dead `d` CTE is left in place
    * (unreferenced CTEs aren't executed). */
  private val ss =
    s"d AS (${DuckSql.shingles("documents", "source AS src", 5)}),\n" +
      DuckSql.sigCtes("src")
  private val ssm =
    s"d AS (${DuckSql.shingles("documents", "source AS src", 5)}),\n" +
      s"""sigs AS (SELECT dd.source AS src, j,
         |    MIN(m.sig[CAST(j + 1 AS INTEGER)]) AS sig
         |  FROM read_parquet('$dirToken/mh5_sl.parquet') m
         |  JOIN documents dd USING (doc_id), range(0, 64) r(j)
         |  GROUP BY src, j),
         |sl AS (SELECT src, list(sig ORDER BY j) AS sig FROM sigs GROUP BY src)""".stripMargin

  // ---- memo builds (ordered: later entries may read earlier memos) ----

  /** (name, kind, payload): kind "sql" = COPY the SELECT to
    * <dir>/<name>.parquet; "check" = run, require one row with
    * n_sampled = n_match > 0; "unionfind" = Python min-label union-find
    * over the named pair memo's first two columns → (id, label) parquet. */
  def memos: Seq[(String, String, String)] = Seq(
    ("mh5_sl", "sql", DuckSql.slBuild("documents", "doc_id", 5)),
    ("mh5_check", "check", DuckSql.slCheck("mh5_sl", 5, 251)),
    ("mh3_sl", "sql", DuckSql.slBuild("documents", "doc_id", 3)),
    ("mh3_check", "check", DuckSql.slCheck("mh3_sl", 3, 251)),
    ("mh5_p", "sql",
      swapAll("mh5_p", s"${Similarity.minhashPairsSql}\nSELECT ia, ib, jacc FROM p",
        Seq(s5 -> s5m))),
    ("phash_pairs", "sql",
      s"${Multimodal.phashPairsSql}\nSELECT ia, ib FROM pairs"),
    ("cc_mh5", "unionfind", "mh5_p"),
    ("cc_phash", "unionfind", "phash_pairs"))

  private def swapAll(name: String, sql0: String,
      subs: Seq[(String, String)]): String =
    subs.foldLeft(sql0) { case (sql, (from, to)) =>
      require(sql.contains(from),
        s"OracleMemo: $name no longer contains the expected chain text " +
          s"(first 80 chars of the fragment: ${from.take(80)}…)")
      sql.replace(from, to)
    }

  /** Built once per memoizedQueries call: SparkEntry.oracleSql is a def
    * that folds the full ~200-entry map — rebuilding it per q() lookup
    * would construct it once per memoized entry. */
  private lazy val allOracles: Map[String, String] = graft.SparkEntry.oracleSql

  private def q(name: String, subs: (String, String)*): (String, String) =
    name -> swapAll(name, allOracles(name), subs.toSeq)

  /** Memoized sweep variants, one per scale-heavy oracle. Built lazily so
    * module init can't recurse through SparkEntry. */
  def memoizedQueries: Map[String, String] = {
    val ccMh5Cluster = DuckSql.reachCc("p", "doc_id", "cluster_id") ->
      DuckSql.reachCcReplay("cc_mh5", "doc_id", "cluster_id")
    val ccMh5Label = DuckSql.reachCc("p", "doc_id", "label") ->
      DuckSql.reachCcReplay("cc_mh5", "doc_id", "label")
    val ccMh5Rank = DuckSql.reachCc("p", "id", "cluster_id") ->
      DuckSql.reachCcReplay("cc_mh5", "id", "cluster_id")
    val ccPhashCluster = DuckSql.reachCc("pairs", "media_id", "cluster_id") ->
      DuckSql.reachCcReplay("cc_phash", "media_id", "cluster_id")
    val ccPhashLabel = DuckSql.reachCc("pairs", "id", "label") ->
      DuckSql.reachCcReplay("cc_phash", "id", "label")
    Map(
      q("dd_minhash_lsh", s5 -> s5m),
      q("dd_edit_verify", s5 -> s5m),
      q("dd_lsh_curve", s5 -> s5m),
      q("dd_lsh_funnel", s5 -> s5m),
      q("dd_pipeline_indexed", s5 -> s5m),
      q("dd_incremental", s5 -> s5m),
      q("st_incremental", s5 -> s5m),
      q("dd_split_leak", s5 -> s5m),
      q("ta_pipeline_curate", s5 -> s5m),
      q("ta_pipeline_full", s5 -> s5m),
      q("dd_ngram_jaccard", s3 -> s3m),
      q("dd_pipeline", sk -> skm),
      q("dd_source_overlap", ss -> ssm),
      // component-closure class: signature memo + union-find replay
      q("dd_cluster", s5 -> s5m, ccMh5Cluster),
      q("dd_canonical", s5 -> s5m, ccMh5Label),
      q("dd_rep_rank", s5 -> s5m, ccMh5Rank),
      q("mm_phash_cluster", ccPhashCluster),
      q("mm_pipeline_curate", ccPhashLabel),
      q("mm_pipeline_paired", ccPhashLabel),
      q("mm_pipeline_full", ccPhashLabel))
  }
}
