package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.F
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.3 — third batch of similarity operators: incremental near-dup
  * (new batch vs existing index) and product-quantization ANN.
  *
  * Scale posture: dd_incremental is THE production dedup shape — a daily
  * crawl delta is banded against the persisted corpus signature index, so
  * per-run cost is O(delta) band probes instead of re-deduping the corpus;
  * candidates stay bucket-bounded and only bare id pairs cross the
  * distinct. ann_pq trades the full-vector scan for 8-bit codes: the
  * codebook broadcasts, the code table is 8 bytes/vector (64× smaller than
  * the float vectors), and only the top-N approximate matches re-read real
  * vectors for the exact re-rank. */
object Similarity2 {

  private def docs(s: SparkSession, d: String) = Tables.widened(s, d, "documents")

  /** Per-side banded signature view: (id, band, bk). */
  private def banded(sigs: DataFrame, bands: Int, rows: Int): DataFrame =
    sigs.select(col("doc_id"), posexplode(expr(
      s"transform(sequence(0, ${bands - 1}), b -> slice(sig, $rows * b + 1, $rows))"))
      .as(Seq("band", "bk")))

  val defs: Seq[GraftQuery] = Seq(

    // 42d. incremental near-dup: the "new batch" (doc_id % 10 == 0 — the
    // daily delta) is checked against the "existing index" (the rest of the
    // corpus, whose signatures are the persisted artifact of a previous
    // dedup run). Band equijoin new×index only — never index×index, so a
    // daily run scales with the delta, not the corpus. Same md5 MinHash
    // family as dd_minhash_lsh → the oracle recomputes banding, prefilter
    // and Jaccard verify bit-exactly.
    GraftQuery("dd_incremental", (s, d) => {
      F.register(s)
      val sh = docs(s, d).select(col("doc_id"),
        expr("char_shingles(text, 5)").as("sh"))
      val sigs = sh.withColumn("sig", expr("minhash_sig(sh)"))
        .select("doc_id", "sig").persist()
      val newB = banded(sigs.filter(col("doc_id") % 10 === 0), 16, 4)
        .toDF("nid", "band", "bk")
      val idxB = banded(sigs.filter(col("doc_id") % 10 =!= 0), 16, 4)
        .toDF("oid", "band", "bk")
      val cand = newB.join(idxB, Seq("band", "bk"))
        .select("nid", "oid").distinct()
      val pre = cand
        .join(sigs.select(col("doc_id").as("nid"), col("sig").as("sa")), "nid")
        .join(sigs.select(col("doc_id").as("oid"), col("sig").as("sb")), "oid")
        .withColumn("est", expr(
          "aggregate(zip_with(sa, sb, (x, y) -> IF(x = y, 1, 0)), 0, (s, x) -> s + x) / CAST(64 AS DOUBLE)"))
        .filter(col("est") >= 0.55)
        .select("nid", "oid")
      pre
        .join(sh.select(col("doc_id").as("nid"), col("sh").as("sha")), "nid")
        .join(sh.select(col("doc_id").as("oid"), col("sh").as("shb")), "oid")
        .withColumn("jacc", expr("jaccard_sim(sha, shb)"))
        .filter(col("jacc") >= 0.7)
        .select("nid", "oid", "jacc")
    },
      Some(s"""WITH d AS (${DuckSql.shingles("documents", "doc_id", 5)}),
             |${DuckSql.sigCtes("doc_id")},
             |bands AS (SELECT doc_id, b, list_slice(sig, 4*b+1, 4*b+4) AS bk
             |  FROM sl, range(0, 16) r(b)),
             |cand AS (SELECT DISTINCT a.doc_id AS nid, bb.doc_id AS oid
             |  FROM bands a JOIN bands bb ON a.b = bb.b AND a.bk = bb.bk
             |  WHERE a.doc_id % 10 = 0 AND bb.doc_id % 10 <> 0),
             |pre AS (SELECT nid, oid FROM cand
             |  JOIN sl sa ON sa.doc_id = cand.nid
             |  JOIN sl sb ON sb.doc_id = cand.oid
             |  WHERE ${DuckSql.sigAgree("sa.sig", "sb.sig")} >= 0.55),
             |v AS (SELECT nid, oid, ${DuckSql.jacc("da.sh", "db.sh")} AS jacc
             |  FROM pre JOIN d da ON da.doc_id = pre.nid
             |  JOIN d db ON db.doc_id = pre.oid)
             |SELECT nid, oid, jacc FROM v WHERE jacc >= 0.7""".stripMargin))
  )
}
