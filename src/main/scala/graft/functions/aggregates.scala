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

/** Bottom-k TUPLE sample: keeps the k lexicographically smallest
  * (hk, id, v) triples per group, WITH multiplicity (a bounded max-heap,
  * not a set — the generator emits duplicate-PK rows, so exact duplicate
  * triples must survive exactly like the TopKPerGroup bounded-heap
  * operator keeps duplicate rows). With hk a uniform hash rank this is
  * q_quantile_sketch's deterministic mergeable quantile sample as an
  * AGGREGATE: min-k of a union is the min-k of the merged min-k's, so the
  * result is a function of the data multiset alone — independent of
  * partitioning, merge-tree shape, and (the reason this exists) the
  * micro-batch boundaries of a STREAM. Streaming complete-mode state is
  * the serialized heap: ≤ k triples per group at any rate, the bounded
  * shape live quantile monitoring needs. Batch analog + error pricing:
  * Relational3.q_quantile_sketch; streaming consumer: Streams.st_quantile. */
case class BottomKTupleAgg(
    first: Expression,
    second: Expression,
    third: Expression,
    k: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[Array[Long]]]
    with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("hk", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("v", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottomk_sample"

  private def revLex = BottomKTupleAgg.RevLex

  override def createAggregationBuffer(): java.util.PriorityQueue[Array[Long]] =
    new java.util.PriorityQueue[Array[Long]](revLex)

  private def add(buf: java.util.PriorityQueue[Array[Long]],
      t: Array[Long]): Unit = {
    if (buf.size < k) { buf.add(t); () }
    else if (revLex.compare(t, buf.peek()) > 0) { buf.poll(); buf.add(t); () }
  }

  override def update(buf: java.util.PriorityQueue[Array[Long]],
      input: InternalRow): java.util.PriorityQueue[Array[Long]] = {
    val a = first.eval(input); val b = second.eval(input); val c = third.eval(input)
    if (a != null && b != null && c != null)
      add(buf, Array(a.asInstanceOf[Long], b.asInstanceOf[Long], c.asInstanceOf[Long]))
    buf
  }

  override def merge(a: java.util.PriorityQueue[Array[Long]],
      b: java.util.PriorityQueue[Array[Long]]): java.util.PriorityQueue[Array[Long]] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.PriorityQueue[Array[Long]]): Any = {
    val arr = buf.toArray(new Array[Array[Long]](buf.size))
    java.util.Arrays.sort(arr, revLex.reversed())
    new GenericArrayData(arr.map(t => InternalRow(t(0), t(1), t(2))))
  }

  override def serialize(buf: java.util.PriorityQueue[Array[Long]]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 24)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val t = it.next(); bb.putLong(t(0)); bb.putLong(t(1)); bb.putLong(t(2)) }
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Array[Long]] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = new java.util.PriorityQueue[Array[Long]](revLex)
    var i = 0
    while (i < n) { q.add(Array(bb.getLong(), bb.getLong(), bb.getLong())); i += 1 }
    q
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKTupleAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKTupleAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): BottomKTupleAgg = copy(first = f, second = s, third = t)
}

object BottomKTupleAgg {
  /** Max-heap comparator on the (hk, id, v) lexicographic order: head =
    * current worst kept triple, evicted when a smaller one arrives.
    * A top-level serializable object, NOT an instance field — a streaming
    * aggregation serializes the expression (and anything it references)
    * into the state-store task closure, and an anonymous inner comparator
    * capturing the expression's outer scope fails that serialization. */
  object RevLex extends java.util.Comparator[Array[Long]] with Serializable {
    def compare(a: Array[Long], b: Array[Long]): Int = {
      var i = 0
      while (i < 3) {
        val c = java.lang.Long.compare(b(i), a(i))
        if (c != 0) return c
        i += 1
      }
      0
    }
  }
}
