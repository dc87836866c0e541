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

  // ---- ANN assignment memos (the N×K window class) -------------------
  //
  // The exact oracles of the centroid-quantizer family (ann_ivf,
  // ann_ivf_pq, ann_kmeans_refine, dd_semantic, and the recall evals that
  // embed the same chains) all contain an N×K nearest-centroid window
  // (`n CROSS JOIN c` → ROW_NUMBER per vec_id) and, for the PQ members,
  // an N×(8·K2) code-assignment window. At sf10 (200k vectors × 781
  // cells) DuckDB OOMs on the monolithic window even with 48 GB + spill —
  // the r12 oracle-resource class. The memo plan rebuilds both tables
  // BOUNDED: centroids once (one corpus window), then the assignment in
  // $CHUNK_MOD chunks of vec_id % — each chunk a small window — COPY'd
  // into a parquet DIRECTORY ("sql_chunked" kind). Every swapped oracle
  // then reads the memo and keeps its remaining (candidate-bounded)
  // stages in DuckDB verbatim, so the sf10 verdict stays a FULL exact
  // verdict, not a sampled one. The checks recompute a deterministic
  // md5-sampled slice of each memo through the PLAIN inline formulation
  // (centroids included) and require exact agreement.

  /** e/n prelude for memo payloads (memo-only text — swaps never match
    * against it), with an optional chunk predicate on the corpus scan. */
  private def vecN(where: String): String =
    s"""e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings$where),
       |n AS (SELECT vec_id, v, ${Similarity.duckDot("v", "v")} AS n2 FROM e)""".stripMargin

  private val chunkPred = " WHERE vec_id % $CHUNK_MOD = $CHUNK_IDX"

  private val ivfCentsBuild =
    s"WITH ${vecN("")}\n${Similarity.centroidsSql}"

  private val ivfAsgBuild =
    s"""WITH ${vecN(chunkPred)},
       |c AS (SELECT cid, cv, cn2 FROM read_parquet('$dirToken/ivf_cents.parquet'))
       |SELECT vec_id, cell FROM (
       |  SELECT n.vec_id, c.cid AS cell,
       |    ROW_NUMBER() OVER (PARTITION BY n.vec_id
       |      ORDER BY ${Similarity.duckL2("n.v", "c.cv")}, c.cid) AS arn
       |  FROM n CROSS JOIN c) WHERE arn = 1""".stripMargin

  private val ivfAsgCheck =
    s"""WITH ${vecN("")},
       |c AS (${Similarity.centroidsSql}),
       |samp AS (SELECT * FROM n WHERE md5(CAST(vec_id AS VARCHAR)) LIKE '00%'),
       |plain AS (SELECT vec_id, cid FROM (
       |  SELECT samp.vec_id, c.cid,
       |    ROW_NUMBER() OVER (PARTITION BY samp.vec_id
       |      ORDER BY ${Similarity.duckL2("samp.v", "c.cv")}, c.cid) AS arn
       |  FROM samp CROSS JOIN c) WHERE arn = 1)
       |SELECT COUNT(*) AS sampled,
       |  SUM(CASE WHEN m.cell = plain.cid THEN 1 ELSE 0 END) AS n_match
       |FROM plain JOIN read_parquet('$dirToken/ivf_asg.parquet/*.parquet') m
       |  ON m.vec_id = plain.vec_id""".stripMargin

  private val pqSubBuild =
    s"""WITH ${vecN("")},
       |${Similarity2.pqCodebookSql}
       |SELECT m, crank, sub FROM sub""".stripMargin

  private val pqCodesBuild =
    s"""WITH ${vecN(chunkPred)},
       |sub AS (SELECT m, crank, sub FROM read_parquet('$dirToken/pq_sub.parquet')),
       |${Similarity2.pqCodesSqlCtes}
       |SELECT n_id, codes FROM codes""".stripMargin

  private val pqCodesCheck =
    s"""WITH ${vecN("")},
       |${Similarity2.pqCodebookSql},
       |samp AS (SELECT * FROM n WHERE md5(CAST(vec_id AS VARCHAR)) LIKE '00%'),
       |${Similarity2.pqCodesSqlCtes.replace(
          "FROM n CROSS JOIN sub s", "FROM samp n CROSS JOIN sub s")}
       |SELECT COUNT(*) AS sampled,
       |  SUM(CASE WHEN m.codes = codes.codes THEN 1 ELSE 0 END) AS n_match
       |FROM codes JOIN read_parquet('$dirToken/pq_codes.parquet/*.parquet') m
       |  ON m.n_id = codes.n_id""".stripMargin

  /** Memo-read replacement fragments for the swapped oracles. */
  private val centsM =
    s"c AS (SELECT cid, cv, cn2 FROM read_parquet('$dirToken/ivf_cents.parquet')),\n"
  private val ivfAsgM = centsM +
    s"""asg AS (SELECT a.vec_id AS n_id, a.cell, n.v AS nv, n.n2 AS nn2
       |  FROM read_parquet('$dirToken/ivf_asg.parquet/*.parquet') a
       |  JOIN n ON n.vec_id = a.vec_id),
       |""".stripMargin
  private val kmAsgM = centsM +
    s"""asg AS (SELECT a.vec_id, a.cell, n.v
       |  FROM read_parquet('$dirToken/ivf_asg.parquet/*.parquet') a
       |  JOIN n ON n.vec_id = a.vec_id),
       |""".stripMargin
  private val semAsgM = centsM +
    s"""asgn AS (SELECT vec_id, cell AS cluster_id
       |  FROM read_parquet('$dirToken/ivf_asg.parquet/*.parquet')),
       |""".stripMargin
  private val pqAsgM = centsM +
    s"""asg AS (SELECT vec_id AS n_id, cell
       |  FROM read_parquet('$dirToken/ivf_asg.parquet/*.parquet')),
       |""".stripMargin
  private val codesM =
    s"""codes AS (SELECT n_id, codes
       |  FROM read_parquet('$dirToken/pq_codes.parquet/*.parquet')),
       |""".stripMargin

  // ---- phash signature memo (chunked) --------------------------------
  //
  // phashPairsSql's per-doc chain (raw → am → m → v → bitv → bl → ph)
  // materializes several full per-character lists per document; the
  // monolithic build exhausted even an 80 GB cap at sf10. The chain is
  // doc-local, so it chunks on doc_id exactly like the ANN assignment
  // (each planted re-encode variant derives from its original's raw row
  // and stays in the same chunk); the band join + hamming verify then
  // run over the 4-longs-per-doc memo, which is cheap at any scale. The
  // chunked text IS the oracle's own chain (sliced, chunk predicate on
  // the one corpus scan) — same formulation, so no reformulation check
  // is needed (the slCheck discipline guards REFORMULATED builds).
  private val phashPhBuild: String = {
    val sql = Multimodal.phashPairsSql
    val cut = sql.indexOf("\nbands AS (")
    require(cut > 0, "OracleMemo: phashPairsSql lost its bands marker")
    val head = sql.substring(0, cut).stripSuffix(",")
    val rawMark = "  FROM documents),\nam AS ("
    require(head.contains(rawMark),
      "OracleMemo: phashPairsSql lost its raw-scan marker")
    head.replace(rawMark,
      s"  FROM documents WHERE doc_id % $$CHUNK_MOD = $$CHUNK_IDX),\nam AS (") +
      "\nSELECT doc_id, b3, b2, b1, b0 FROM ph"
  }

  private val phashPairsFromPh: String = {
    val sql = Multimodal.phashPairsSql
    val cut = sql.indexOf("\nbands AS (")
    s"""WITH ph AS (SELECT * FROM read_parquet('$dirToken/phash_ph.parquet/*.parquet')),
       |${sql.substring(cut + 1)}
       |SELECT ia, ib, hamming FROM pairs""".stripMargin
  }

  /** mm_phash reads the pair memo directly (its plain oracle recomputes
    * the whole per-doc chain monolithically — the sf10 OOM class). */
  private val phashPairsM =
    s"WITH pairs AS (SELECT ia, ib, hamming " +
      s"FROM read_parquet('$dirToken/phash_pairs.parquet'))"

  // ---- CDC chunk-hash memo (chunked) ---------------------------------
  //
  // dd_chunk_dedup's oracle folds a 16-codepoint rolling hash per
  // character position — doc-local like the phash chain, but CPU-bound
  // enough that the monolithic query exceeds the sf10 row timeout. The
  // chunked build is the oracle's own b0→b→c text (sliced) with a chunk
  // predicate on the one corpus scan; each chunk gets its own (larger)
  // memo-build budget, and the swapped oracle reads (doc_id, ch) and
  // keeps the dup/per-doc aggregation in DuckDB unchanged.
  private lazy val cdcChainSlice: String =
    slice("dd_chunk_dedup", allOracles("dd_chunk_dedup"), "b0 AS (", "\ndup AS (")

  private lazy val cdcChBuild: String = {
    val rawMark = "  FROM documents),\n"
    require(cdcChainSlice.contains(rawMark),
      "OracleMemo: dd_chunk_dedup lost its corpus-scan marker")
    val chunked = cdcChainSlice.replace(rawMark,
      s"  FROM documents WHERE doc_id % $$CHUNK_MOD = $$CHUNK_IDX),\n")
    s"WITH ${chunked.stripSuffix(",")}\nSELECT doc_id, ch FROM c"
  }

  private val cdcChM =
    s"c AS (SELECT doc_id, ch FROM read_parquet('$dirToken/cdc_ch.parquet/*.parquet')),"

  // ---- SimHash fingerprint memo (chunked) ----------------------------
  //
  // dd_simhash's oracle streams token-md5 bit votes through a
  // (doc, 64-bit-position) aggregate — corpus-token-stream × 64 rows,
  // which exhausts the sf10 memory guard as one query. Doc-local like
  // the phash/CDC chains → same chunked-slice treatment (the oracle's
  // own t→tok→hx→votes→bl→fp text, chunk predicate on the one scan).
  private lazy val shFpSlice: String =
    slice("dd_simhash", allOracles("dd_simhash"), "t AS (", "\nSELECT doc_id,")

  private lazy val shFpBuild: String = {
    val rawMark = "  FROM documents),\n"
    require(shFpSlice.contains(rawMark),
      "OracleMemo: dd_simhash lost its corpus-scan marker")
    val chunked = shFpSlice.replace(rawMark,
      s"  FROM documents WHERE doc_id % $$CHUNK_MOD = $$CHUNK_IDX),\n")
    // ufp is HUGEINT (unsigned 64-bit fingerprint): parquet has no int128,
    // so it round-trips through VARCHAR (exact for integers) and the
    // swapped fp CTE casts back
    s"WITH $chunked\nSELECT doc_id, CAST(ufp AS VARCHAR) AS ufp_s FROM fp"
  }

  private val shFpM =
    s"fp AS (SELECT doc_id, CAST(ufp_s AS HUGEINT) AS ufp " +
      s"FROM read_parquet('$dirToken/sh_fp.parquet/*.parquet'))"

  /** The exact fragment to swap out, SLICED from the oracle's own text
    * between two CTE-name markers — robust to formatting, and a marker
    * that stops matching fails loudly (swapAll re-requires containment). */
  private def slice(name: String, sql: String, from: String, until: String): String = {
    val a = sql.indexOf(from)
    require(a >= 0, s"OracleMemo: $name lost its '$from' marker")
    val b = sql.indexOf(until, a)
    require(b > a, s"OracleMemo: $name lost its '$until' marker after '$from'")
    sql.substring(a, b)
  }

  // ---- two-level quantizer memos (dd_semantic_hier) -------------------
  //
  // The hier oracle's two assignment windows (a1: N×K1 coarse, a2: N×K2
  // fine) are each referenced by later CTEs (f re-reads a1; j re-reads a2
  // twice) and DuckDB re-inlines the window chain per reference — the
  // sf10 timeout class (901 s, CORRECTNESS_sf10 r13). Every build below
  // is the oracle's OWN CTE text sliced between markers, with earlier
  // CTEs swapped for memo reads and — for the chunked builds — a chunk
  // predicate on the vec_id side; both windows PARTITION BY vec_id, so a
  // vec_id chunk is exact (a2's f/n sides stay FULL: a fine centroid may
  // live in any chunk). Two ivfAsgCheck-style md5-sampled checks guard
  // the assembly (the c1-memo indirection and the f-memo indirection).
  private lazy val hierSql: String = allOracles("dd_semantic_hier")
  private def hierPart(from: String, until: String): String = {
    // newline-anchored (bare "f AS (" could in principle match mid-token),
    // leading newline dropped so parts re-assemble with explicit "\n"
    slice("dd_semantic_hier", hierSql, "\n" + from, "\n" + until).drop(1)
  }
  /** e/n prelude exactly as the hier oracle spells it (list_reduce norm). */
  private lazy val hierEN: String =
    slice("dd_semantic_hier", hierSql, "e AS (", "\nc1 AS (")
  private lazy val hierC1 = hierPart("c1 AS (", "a1 AS (")
  private lazy val hierA1 = hierPart("a1 AS (", "f AS (")
  private lazy val hierF = hierPart("f AS (", "a2 AS (")
  private lazy val hierA2 = hierPart("a2 AS (", "j AS (")

  private val hierEmbedMark = "  FROM embeddings),"
  private def hierENChunked: String = {
    require(hierEN.contains(hierEmbedMark),
      "OracleMemo: dd_semantic_hier lost its embeddings-scan marker")
    hierEN.replace(hierEmbedMark,
      "  FROM embeddings WHERE vec_id % $CHUNK_MOD = $CHUNK_IDX),")
  }

  private lazy val hierC1Build: String =
    s"WITH $hierEN\n${hierC1.stripSuffix(",")}\nSELECT cid, cv FROM c1"

  private lazy val hierA1Build: String =
    s"""WITH $hierENChunked
       |c1 AS (SELECT cid, cv FROM read_parquet('$dirToken/hier_c1.parquet')),
       |${hierA1.stripSuffix(",")}
       |SELECT vec_id, coarse_id FROM a1""".stripMargin

  private lazy val hierA1Check: String =
    s"""WITH $hierEN
       |${hierC1.stripSuffix(",")},
       |samp AS (SELECT * FROM n WHERE md5(CAST(vec_id AS VARCHAR)) LIKE '00%'),
       |plain AS (SELECT vec_id, cid FROM (
       |    SELECT samp.vec_id, c1.cid,
       |      ROW_NUMBER() OVER (PARTITION BY samp.vec_id ORDER BY
       |        ${Similarity.duckL2("samp.v", "c1.cv")}, c1.cid) AS rn
       |    FROM samp CROSS JOIN c1) WHERE rn = 1)
       |SELECT COUNT(*) AS sampled,
       |  SUM(CASE WHEN m.coarse_id = plain.cid THEN 1 ELSE 0 END) AS n_match
       |FROM plain JOIN read_parquet('$dirToken/hier_a1.parquet/*.parquet') m
       |  ON m.vec_id = plain.vec_id""".stripMargin

  private val hierA1Rd =
    s"SELECT vec_id, coarse_id FROM read_parquet('$dirToken/hier_a1.parquet/*.parquet')"

  private lazy val hierFBuild: String =
    s"""WITH a1 AS ($hierA1Rd),
       |${hierF.stripSuffix(",")}
       |SELECT coarse_id, fcid FROM f""".stripMargin

  private lazy val hierA2Build: String =
    s"""WITH $hierEN
       |a1 AS ($hierA1Rd
       |  WHERE vec_id % $$CHUNK_MOD = $$CHUNK_IDX),
       |f AS (SELECT coarse_id, fcid FROM read_parquet('$dirToken/hier_f.parquet')),
       |${hierA2.stripSuffix(",")}
       |SELECT vec_id, coarse_id, fine_id FROM a2""".stripMargin

  /** Validates the hier_f memo AND the a2 chunk assembly: fine codebooks
    * re-derived INLINE (the oracle's own f text) from the a1 memo, then
    * the sampled fine assignment recomputed plain and compared. */
  private lazy val hierA2Check: String =
    s"""WITH $hierEN
       |a1 AS ($hierA1Rd),
       |${hierF.stripSuffix(",")},
       |samp AS (SELECT a1.vec_id, a1.coarse_id, n.v
       |  FROM a1 JOIN n USING (vec_id)
       |  WHERE md5(CAST(a1.vec_id AS VARCHAR)) LIKE '00%'),
       |plain AS (SELECT vec_id, fcid FROM (
       |    SELECT samp.vec_id, f.fcid,
       |      ROW_NUMBER() OVER (PARTITION BY samp.vec_id ORDER BY
       |        ${Similarity.duckL2("samp.v", "nf.v")}, f.fcid) AS rn
       |    FROM samp JOIN f ON f.coarse_id = samp.coarse_id
       |    JOIN n nf ON nf.vec_id = f.fcid) WHERE rn = 1)
       |SELECT COUNT(*) AS sampled,
       |  SUM(CASE WHEN m.fine_id = plain.fcid THEN 1 ELSE 0 END) AS n_match
       |FROM plain JOIN read_parquet('$dirToken/hier_a2.parquet/*.parquet') m
       |  ON m.vec_id = plain.vec_id""".stripMargin

  // ---- scrub-chain memo (ta_pipeline_full) -----------------------------
  //
  // ta_pipeline_full's oracle references `scrubbed` from FIVE downstream
  // CTE families (gopher metrics, exact-dedup hash, the 8-gram shingle
  // stage, the bench set, the final accounting join) and DuckDB re-inlines
  // the full 3-stage scrub chain per reference — 51 GiB of spill at sf10.
  // The memo is the chain's own text verbatim (TextOps2.scrubSqlCtes, the
  // exact SQL ta_pipeline_scrub's PASSING sf10 row runs — that row stays
  // unswapped, so each sweep still certifies the memo's formulation
  // against Spark's scrub output end to end); the chain is corpus-level
  // (line dedup crosses documents), so it builds as ONE sql memo, not
  // chunked.
  private lazy val scrubCleanBuild: String =
    s"""WITH ${TextOps2.scrubSqlCtes}
       |SELECT doc_id, source, n_pii, n_seg_removed, n_span_removed,
       |  n_toks_final, clean_text FROM scrubbed""".stripMargin

  private val scrubbedM =
    s"scrubbed AS (SELECT doc_id, source, n_pii, n_seg_removed, " +
      s"n_span_removed, n_toks_final, clean_text " +
      s"FROM read_parquet('$dirToken/scrub_clean.parquet')),"

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
    ("phash_ph", "sql_chunked:16", phashPhBuild),
    ("phash_pairs", "sql", phashPairsFromPh),
    ("cc_mh5", "unionfind", "mh5_p"),
    ("cc_phash", "unionfind", "phash_pairs"),
    ("ivf_cents", "sql", ivfCentsBuild),
    ("ivf_asg", "sql_chunked:8", ivfAsgBuild),
    ("ivf_asg_check", "check", ivfAsgCheck),
    ("pq_sub", "sql", pqSubBuild),
    ("pq_codes", "sql_chunked:8", pqCodesBuild),
    ("pq_codes_check", "check", pqCodesCheck),
    ("cdc_ch", "sql_chunked:16", cdcChBuild),
    ("sh_fp", "sql_chunked:16", shFpBuild),
    ("hier_c1", "sql", hierC1Build),
    ("hier_a1", "sql_chunked:4", hierA1Build),
    ("hier_a1_check", "check", hierA1Check),
    ("hier_f", "sql", hierFBuild),
    ("hier_a2", "sql_chunked:4", hierA2Build),
    ("hier_a2_check", "check", hierA2Check),
    ("scrub_clean", "sql", scrubCleanBuild))

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
      // ta_pipeline_full: the grand capstone references `scrubbed` from
      // five CTE families and the pair chain once — swap the WHOLE pair
      // chain for the mh5_p memo (the dd_rep_rank discipline) and the
      // scrub chain for the scrub_clean memo; every selection-side stage
      // (gopher, prune, dedup, decontamination, DSIR, mixing, packing,
      // split) runs in DuckDB unchanged
      q("ta_pipeline_full",
        Similarity.minhashPairsSql.stripPrefix("WITH ") ->
          (s"p AS (SELECT ia, ib, jacc " +
            s"FROM read_parquet('$dirToken/mh5_p.parquet'))"),
        s"${TextOps2.scrubSqlCtes}," -> scrubbedM),
      q("dd_ngram_jaccard", s3 -> s3m),
      q("dd_pipeline", sk -> skm),
      q("dd_source_overlap", ss -> ssm),
      // component-closure class: signature memo + union-find replay
      q("dd_cluster", s5 -> s5m, ccMh5Cluster),
      q("dd_canonical", s5 -> s5m, ccMh5Label),
      // dd_rep_rank: the unrolled PageRank rounds reference the pair CTE
      // through `ed` in EVERY round, and DuckDB re-inlines the whole
      // banding+verify chain per reference (54 GiB spill at sf10) — swap
      // the entire chain for the standing mh5_p pair memo, keeping the
      // rounds and the rank/representative tail in DuckDB unchanged
      q("dd_rep_rank",
        Similarity.minhashPairsSql.replaceFirst("WITH ", "WITH RECURSIVE ") ->
          (s"WITH RECURSIVE p AS (SELECT ia, ib, jacc " +
            s"FROM read_parquet('$dirToken/mh5_p.parquet'))"),
        ccMh5Rank),
      q("mm_phash_cluster", ccPhashCluster),
      q("mm_pipeline_curate", ccPhashLabel),
      q("mm_pipeline_paired", ccPhashLabel),
      q("mm_pipeline_full", ccPhashLabel),
      // ANN assignment-memo class: each swap replaces exactly the
      // centroid + N×K-assignment CTEs (sliced between CTE markers from
      // the oracle's own text) with memo reads; every downstream stage —
      // probes, candidate ranking, pairwise verify, Lloyd fold — runs in
      // DuckDB unchanged, so these remain FULL exact verdicts
      annQ("ann_ivf", "probes AS (" -> ivfAsgM),
      annQ("emb_recall_eval", "probes AS (" -> ivfAsgM),
      annQ("ann_kmeans_refine", "g AS (" -> kmAsgM),
      annQ("dd_semantic", "j AS (" -> semAsgM),
      annQ("ann_ivf_pq", "idx AS (" -> pqAsgM, "dists AS (" -> codesM),
      annQ("emb_pq_recall_eval", "idx AS (" -> pqAsgM, "dists AS (" -> codesM),
      q("dd_chunk_dedup", cdcChainSlice -> cdcChM),
      q("dd_simhash", shFpSlice -> shFpM),
      q("mm_phash", Multimodal.phashPairsSql -> phashPairsM),
      // dd_semantic_hier: swap the whole c1→a1→f→a2 block (both
      // re-inlined assignment windows) for the chunked a2 memo; the
      // within-cell pairwise verify (j) and n stay in DuckDB
      q("dd_semantic_hier",
        slice("dd_semantic_hier", hierSql, "\nc1 AS (", "\nj AS (") ->
          (s"\na2 AS (SELECT vec_id, coarse_id, fine_id " +
            s"FROM read_parquet('$dirToken/hier_a2.parquet/*.parquet')),")))
  }

  /** ANN-class swap: for each (untilMarker, replacement), slice the
    * fragment starting at its opening CTE out of the oracle text and swap
    * in the memo read. The codes fragment opens at "dists AS ("; the
    * assignment fragments all open at "c AS (". ALL markers are matched
    * NEWLINE-ANCHORED — bare "c AS (" / "g AS (" are substrings of
    * "pq_adc AS (" / "asg AS (" and a mid-token match silently slices the
    * wrong span (the r13 duplicate-CTE bug). */
  private def annQ(name: String,
      swaps: (String, String)*): (String, String) = {
    val sql0 = allOracles(name)
    def anchored(m: String) = "\n" + m
    val subs = swaps.map { case (until, repl) =>
      val from = if (until == "dists AS (") "dists AS (" else "c AS ("
      // the codes fragment is sliced from "dists AS (" to the CTE that
      // follows pqCodesSqlCtes in THIS oracle ("ct AS (" in the pq chain,
      // "c AS (" in ann_ivf_pq's layout)
      val untilM =
        if (from == "dists AS (") {
          val d = sql0.indexOf(anchored("dists AS ("))
          if (sql0.indexOf(anchored("ct AS ("), d) >= 0) "ct AS (" else "c AS ("
        } else until
      // keep the leading newline of the slice and prepend one to the
      // replacement so the joined text stays line-aligned
      slice(name, sql0, anchored(from), anchored(untilM)) -> ("\n" + repl)
    }
    q(name, subs: _*)
  }
}
