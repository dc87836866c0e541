package graft.operators

/** DuckDB SQL macro builders that recompute graft's md5-based sketch
  * signatures (graft.functions.HashOps) in plain SQL, so the driver's
  * oracle can check MinHash/LSH pipelines EXACTLY — banding, prefilter and
  * verify included — instead of settling for rows-only checks.
  *
  * Correspondence (HashOps.minhashSig):
  *   h1 = first 8 bytes of md5(s) (big-endian)  ↔ hex digit fold of md5()[1..16]
  *   h2 = (second 8 bytes | 1)                  ↔ fold of md5()[17..32], forced odd
  *   both masked to 63 bits (mod 2^63)          ↔ % 9223372036854775808
  *   sig[j] = min over shingles of (h1 + j*h2) mod 2^63
  * 63-bit masking keeps every value non-negative, so signed BIGINT `<` and
  * Java long `<` order identically (no u64 needed on either side). */
object DuckSql {
  private val M = "9223372036854775808" // 2^63 (HUGEINT literal)

  /** HUGEINT from 16 hex chars m[off..off+16) of an md5() hex string `m`. */
  private def hex16(off: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
      s"list_transform(range($off, ${off + 16}), " +
      s"i -> CAST(strpos('0123456789abcdef', substr(m, CAST(i AS INTEGER), 1)) - 1 AS HUGEINT))), " +
      s"(a, x) -> a * 16 + x)"

  /** Distinct char n-gram shingle sets: CTE body for `d(<id>, sh)`.
    * Mirrors HashOps.charShingles (first-occurrence distinct). */
  def shingles(src: String, id: String, n: Int): String =
    s"SELECT $id, list_distinct(list_transform(range(1, length(text) - ${n - 2}), " +
      s"i -> substr(text, i, $n))) AS sh FROM $src"

  /** CTE chain `sng, hsh, hs2, sigs, sl` computing per-$id MinHash
    * signature lists from a CTE `d($id, sh)`; `sl` = ($id, sig: BIGINT[64]). */
  def sigCtes(id: String): String =
    s"""sng AS (SELECT $id, unnest(sh) AS s FROM d),
       |hsh AS (SELECT $id, ${hex16(1)} % $M AS h1, ${hex16(17)} % $M AS h2r
       |  FROM (SELECT $id, md5(s) AS m FROM sng)),
       |hs2 AS (SELECT $id, h1, h2r - (h2r % 2) + 1 AS h2 FROM hsh),
       |sigs AS (SELECT $id, j, CAST(MIN((h1 + j * h2) % $M) AS BIGINT) AS sig
       |  FROM hs2, range(0, 64) r(j) GROUP BY $id, j),
       |sl AS (SELECT $id, list(sig ORDER BY j) AS sig FROM sigs GROUP BY $id)""".stripMargin

  /** CTE chain `bands, cand` for `nBands`-band × `nRows`-row LSH banding
    * over `sl`; `cand` = (ia, ib) with ia < ib sharing at least one band.
    * Mirrors Similarity.bandCandidates (band slice as the join key). */
  def bandCtes(id: String, nBands: Int, nRows: Int): String =
    s"""bands AS (SELECT $id, b, list_slice(sig, $nRows*b+1, $nRows*b+$nRows) AS bk
       |  FROM sl, range(0, $nBands) r(b)),
       |cand AS (SELECT DISTINCT a.$id AS ia, bb.$id AS ib
       |  FROM bands a JOIN bands bb ON a.b = bb.b AND a.bk = bb.bk
       |    AND a.$id < bb.$id)""".stripMargin

  /** Exact shingle-set Jaccard between two `sh` columns (same rational as
    * graft.functions.VectorMath.jaccard: ints → one double division). */
  def jacc(a: String, b: String): String =
    s"CAST(len(list_distinct(list_intersect($a, $b))) AS DOUBLE)" +
      s" / len(list_distinct(list_concat($a, $b)))"

  /** Signature-agreement estimate between two 64-long sig lists (matches
    * the Spark-side zip_with/aggregate prefilter bit for bit). */
  def sigAgree(a: String, b: String): String =
    s"len(list_filter(range(1, 65), i -> $a[i] = $b[i])) / CAST(64 AS DOUBLE)"

  /** MinHash signature memo BUILD for the sf1+ oracle sweep: same md5
    * hash family and 63-bit arithmetic as sigCtes, but the per-doc 64-way
    * min folds over a per-doc hash LIST instead of exploding every
    * (shingle, j) row through a corpus×64 GROUP BY — 4.3× faster in DuckDB
    * at sf1 (157 s vs 682 s) with bit-identical output (list(struct) keeps
    * the (h1, h2) draw pairs aligned by construction; min is
    * order-independent). slCheck below re-derives a doc sample through the
    * UNSWAPPED sigCtes text every sweep, so the two formulations can never
    * drift silently. */
  def slBuild(src: String, id: String, n: Int): String =
    s"""WITH d AS (${shingles(src, id, n)}),
       |sng AS (SELECT $id, unnest(sh) AS s FROM d),
       |hsh AS (SELECT $id, ${hex16(1)} % $M AS h1, ${hex16(17)} % $M AS h2r
       |  FROM (SELECT $id, md5(s) AS m FROM sng)),
       |hs2 AS (SELECT $id, h1, h2r - (h2r % 2) + 1 AS h2 FROM hsh),
       |hl AS (SELECT $id, list(struct_pack(h1 := h1, h2 := h2)) AS hs
       |  FROM hs2 GROUP BY $id),
       |sl AS (SELECT $id, list_transform(range(0, 64), j ->
       |    CAST(list_min(list_transform(hs, h -> (h.h1 + j * h.h2) % $M)) AS BIGINT)) AS sig
       |  FROM hl)
       |SELECT $id, sig FROM sl""".stripMargin

  /** Per-sweep equivalence check of a signature memo parquet against the
    * plain sigCtes chain on a deterministic doc sample: returns one row
    * (n_sampled, n_match); the sweep requires n_sampled = n_match > 0.
    * n_sampled counts the freshly-derived sample and the join is LEFT —
    * a memo missing docs (stale tile, partial write) shows up as
    * n_match < n_sampled instead of shrinking both counts in lockstep. */
  def slCheck(memoFile: String, n: Int, sampleMod: Int): String =
    s"""WITH d AS (SELECT * FROM (${shingles("documents", "doc_id", n)})
       |  WHERE doc_id % $sampleMod = 0),
       |${sigCtes("doc_id")}
       |SELECT COUNT(*) AS n_sampled,
       |  SUM(CASE WHEN m.sig = sl.sig THEN 1 ELSE 0 END) AS n_match
       |FROM sl LEFT JOIN read_parquet('${OracleMemo.dirToken}/$memoFile.parquet') m
       |  USING (doc_id)""".stripMargin

  /** Recursive component-closure block `e, reach, cc` over a pair CTE
    * `src(ia, ib)`: cc = ($idName, $labelName) with label = MIN id
    * reachable in the undirected pair graph (only nodes that appear in a
    * pair — singletons are handled by each consumer's LEFT JOIN/COALESCE).
    * Single-sourced so every component consumer (dd_cluster, dd_canonical,
    * dd_rep_rank, mm_phash_cluster, the mm pipelines) shares one text and
    * OracleMemo's union-find replay swap (reachCcReplay) can never drift
    * from it. The enclosing WITH must be RECURSIVE. */
  def reachCc(src: String, idName: String, labelName: String): String =
    s"""e AS (SELECT ia AS a, ib AS b FROM $src UNION ALL SELECT ib, ia FROM $src),
       |reach(rn, rm) AS (
       |  SELECT a, a FROM e GROUP BY a
       |  UNION
       |  SELECT r.rn, e.b FROM reach r JOIN e ON e.a = r.rm),
       |cc AS (SELECT rn AS $idName, MIN(rm) AS $labelName FROM reach GROUP BY rn)""".stripMargin

  /** The sf1+-sweep replay replacement for reachCc: components come from a
    * Python union-find over the DuckDB-materialized pair memo (transitive
    * closure is the one step DuckDB's recursive UNION cannot spill on a
    * corpus-scale graph; min-label components are a deterministic function
    * of the pair set, so pairs-exact + replay pins the closure). The memo
    * parquet always has generic (id, label) columns. */
  def reachCcReplay(memoFile: String, idName: String, labelName: String): String =
    s"""cc AS (SELECT id AS $idName, label AS $labelName
       |  FROM read_parquet('${OracleMemo.dirToken}/$memoFile.parquet'))""".stripMargin
}
