package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Distributed MinHash *union* sketch: elementwise minimum of per-document
  * MinHash signatures. The union sketch of a group estimates the Jaccard
  * similarity between whole document collections (e.g. crawl sources or
  * shards) without ever materializing their shingle sets — the map-side
  * partial aggregation makes this one cheap shuffle of 64 longs per group
  * at any scale. TypedImperativeAggregate = mutable sketch buffer, the
  * Spark-native pattern for HLL/sketch aggregates. */
case class MinHashUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val numHashes = 64

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_union"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(numHashes, arr.numElements())
      var i = 0
      while (i < n) { val h = arr.getLong(i); if (h < buf(i)) buf(i) = h; i += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numHashes * 8)
    var i = 0
    while (i < numHashes) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MinHashUnionAgg =
    copy(child = c)
}

/** KMV (k-minimum-values) distinct-count sketch over a 63-bit hash column:
  * keeps the k smallest DISTINCT hash values per group. Estimator:
  * |D| ≈ (k-1) * 2^63 / h_(k) when ≥ k values were seen, else the sketch IS
  * the distinct set and the count is exact. Unlike HLL implementations
  * (whose register layout differs per engine), KMV over a shared hash
  * function is reproducible in plain SQL — the DuckDB oracle recomputes the
  * same k-th minimum, so the approximate answer is bit-exact checkable.
  * Shuffle cost: ≤ k longs per group (map-side partial merge), the right
  * shape for 100 TB distinct counts. */
case class KmvSketchAgg(
    child: Expression,
    k: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  override def dataType: DataType = StructType(Seq(
    StructField("n_kept", LongType, nullable = false),
    StructField("kth", LongType, nullable = true)))
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) { if (buf.add(h)) { buf.pollLast(); () } }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    InternalRow(buf.size.toLong,
      if (buf.size == k) buf.last(): Any else null)

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong()); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvSketchAgg =
    copy(child = c)
}

/** Space-Saving heavy-hitters sketch (Metwally et al. 2005) over a string
  * column: at most `capacity` monitored items per group; on overflow the
  * minimum-count item is evicted and the newcomer inherits its count as
  * error bound. Guarantees: any item with true count > n/capacity is
  * retained, and reported count overestimates by at most its `err`.
  * Merge folds each incoming partial's entries through the same
  * Space-Saving insert (an already-monitored item adds counts/errors
  * pointwise; a newcomer to a full summary evicts the min-count entry and
  * inherits its count as error) — per-entry insertion rather than the
  * pointwise-add-then-re-truncate union of Agarwal et al. 2012, but the
  * same O(n/capacity) error bound holds, and it keeps the
  * map-side-combinable shape heavy hitters need at 100 TB (shuffle is
  * `capacity` entries per group, not the corpus).
  *
  * Determinism contract: when distinct(group) ≤ capacity no eviction ever
  * fires, counts are exact and err = 0 regardless of partitioning/merge
  * order — the oracle-checked regime. Above capacity the top set is still
  * guaranteed but per-item err depends on arrival order (spec-tested
  * bound, not oracle-checked). */
case class TopKFreqAgg(
    child: Expression,
    capacity: Int = 256,
    k: Int = 20,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Array[Long]]]
    with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "approx_topk"

  override def createAggregationBuffer(): java.util.HashMap[String, Array[Long]] =
    new java.util.HashMap[String, Array[Long]]()

  /** Add `cnt` observations of `tok` (err `e`), evicting min if over cap. */
  private def add(buf: java.util.HashMap[String, Array[Long]],
      tok: String, cnt: Long, e: Long): Unit = {
    val cur = buf.get(tok)
    if (cur != null) { cur(0) += cnt; cur(1) += e }
    else if (buf.size < capacity) buf.put(tok, Array(cnt, e))
    else {
      // evict the (min count, max token) entry — the deterministic choice
      var minTok: String = null
      var minCnt = Long.MaxValue
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val en = it.next()
        val c = en.getValue()(0)
        if (c < minCnt || (c == minCnt && (minTok == null || en.getKey > minTok))) {
          minCnt = c; minTok = en.getKey
        }
      }
      buf.remove(minTok)
      buf.put(tok, Array(minCnt + cnt, minCnt + e))
    }
  }

  override def update(buf: java.util.HashMap[String, Array[Long]],
      input: InternalRow): java.util.HashMap[String, Array[Long]] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.toString, 1L, 0L)
    buf
  }

  override def merge(a: java.util.HashMap[String, Array[Long]],
      b: java.util.HashMap[String, Array[Long]]): java.util.HashMap[String, Array[Long]] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val en = it.next()
      add(a, en.getKey, en.getValue()(0), en.getValue()(1))
    }
    a
  }

  override def eval(buf: java.util.HashMap[String, Array[Long]]): Any = {
    val entries = new Array[(String, Long, Long)](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val en = it.next()
      entries(i) = (en.getKey, en.getValue()(0), en.getValue()(1))
      i += 1
    }
    val top = entries.sortBy { case (t, c, _) => (-c, t) }.take(k)
    new GenericArrayData(top.map { case (t, c, e) =>
      InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(t), c, e)
    })
  }

  override def serialize(buf: java.util.HashMap[String, Array[Long]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val en = it.next()
      out.writeUTF(en.getKey)
      out.writeLong(en.getValue()(0))
      out.writeLong(en.getValue()(1))
    }
    bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Array[Long]] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, Array[Long]]()
    var i = 0
    while (i < n) { m.put(in.readUTF(), Array(in.readLong(), in.readLong())); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKFreqAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKFreqAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TopKFreqAgg =
    copy(child = c)
}
