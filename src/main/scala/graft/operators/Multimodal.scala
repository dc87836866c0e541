package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SURVEY §2.3 mm_decode — multimodal column plumbing.
  *
  * Media are opaque binary columns + typed metadata; decode/feature-extract
  * runs partition-batched close to the data (mapPartitions), which is the
  * Scala analog of arrow-batched Pandas UDFs: at 100 TB the decode step is
  * embarrassingly parallel and shuffles nothing.
  *
  * STUB: this container ships no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake (byte-histogram moments standing in
  * for pixels/spectrograms). The Spark-side contract — binary payload
  * column, metadata struct, fixed-shape float feature vector, per-partition
  * batching — is real and spec-tested; swap `decodeStub` for a codec
  * (e.g. javax.imageio / ffmpeg bindings) to productionize. */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte], format: String)
  /** Feature vector surfaced as fixed scalar columns (f0..f7) rather than
    * array<float>: the shape is static (8-dim stub embedding), and scalar
    * columns keep the output sortable/hashable by any downstream consumer
    * (array columns are opaque to most tabular tooling). */
  final case class FeatureRow(doc_id: Long, format: String, n_bytes: Long,
      f0: Float, f1: Float, f2: Float, f3: Float,
      f4: Float, f5: Float, f6: Float, f7: Float)

  /** STUB decoder: deterministic 8-dim "embedding" from the byte stream.
    * Replace with a real codec for images/audio/video. */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      f(i & 7) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    if (payload.length > 0) { var k = 0; while (k < 8) { f(k) /= payload.length; k += 1 } }
    f
  }

  val defs: Seq[GraftQuery] = Seq(
    // 52. binary column + metadata in, fixed-shape features out, batched
    // per partition. Rows-only oracle (binary features aren't SQL).
    GraftQuery("mm_decode", (s, d) => {
      import s.implicits._
      val media = Tables.t(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
          lit("text/plain").as("format"))
        .as[MediaRow]
      media.mapPartitions { batch =>
        // one JVM-side "codec context" per partition (the expensive init a
        // real decoder amortizes across its arrow batch)
        batch.map { m =>
          val f = decodeStub(m.payload)
          FeatureRow(m.doc_id, m.format, m.payload.length.toLong,
            f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
        }
      }.toDF()
    }, None)
  )
}
