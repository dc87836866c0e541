package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the per-row hot loops of the dedup /
  * similarity operators (SURVEY §2.3). Higher-order-function lambdas are
  * interpreted per element; these evaluate one tight JVM loop per row
  * (~100× faster for 64-hash signatures) while remaining deterministic and
  * distributable. Each is a scalar expression, so Catalyst still prunes /
  * pushes down around them. */

/** MinHash signature of a shingle set: sig[j] = min over shingles of
  * (h1(s) + j * h2(s)) — the standard 2-hash affine family, base hashes
  * from Spark's XXH64. Input array<string>, output array<long>(64). */
case class MinHashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  private val numHashes = 64

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 1L)
      val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 2L) | 1L
      var j = 0
      var h = h1
      while (j < numHashes) {
        if (h < sig(j)) sig(j) = h
        h += h2 // h1 + j*h2 built incrementally
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(c)
}

/** SimHash-64 of a token list: per-token XXH64, ±1 votes per bit. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0L)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
        k += 1
      }
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < 64) { if (votes(k) >= 0) fp |= (1L << k); k += 1 }
    java.lang.Long.valueOf(fp)
  }
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

/** Strict left-fold dot product of two double arrays — same accumulation
  * order as DuckDB's list_reduce, so results are bit-identical across
  * engines (SURVEY §6). Generates a static call so parent operators stay
  * inside whole-stage codegen (CodegenFallback would break the span). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(VectorMath.dot(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorMath.dot($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Sign-LSH signatures: one small-int signature per hash table, from
  * seeded deterministic Gaussian hyperplanes (data-independent, identical
  * on every executor). Input array<double>(64) → array<int>(numTables). */
case class LshSigs(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_sigs"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toDoubleArray()
    val planes = LshSigs.planes
    val sigs = new Array[Int](LshSigs.numTables)
    var t = 0
    while (t < LshSigs.numTables) {
      var sig = 0
      var p = 0
      while (p < LshSigs.planesPerTable) {
        val plane = planes(t * LshSigs.planesPerTable + p)
        var dot = 0.0
        var i = 0
        val n = math.min(v.length, plane.length)
        while (i < n) { dot += v(i) * plane(i); i += 1 }
        if (dot >= 0) sig |= (1 << p)
        p += 1
      }
      sigs(t) = sig
      t += 1
    }
    new GenericArrayData(sigs)
  }
  override protected def withNewChildInternal(c: Expression): LshSigs = copy(c)
}

object LshSigs {
  val numTables = 3
  val planesPerTable = 8
  val dims = 64
  /** Seeded once; identical on driver and executors. */
  lazy val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(numTables * planesPerTable)(Array.fill(dims)(rnd.nextGaussian()))
  }
}

/** Distinct character n-gram shingles in one pass (equivalent to
  * array_distinct(transform(sequence(...), i -> substring(text, i, n)))
  * but ~50× cheaper than the interpreted lambda chain). First-occurrence
  * order, matching array_distinct semantics. */
case class CharShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    val last = s.length - n
    while (i <= last) { seen.add(s.substring(i, i + n)); i += 1 }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): CharShingles = copy(child = c)
}

/** Jaccard similarity of two distinct-element string arrays:
  * |A∩B| / |A∪B| via one hash set (same rational as the
  * array_intersect/array_union formulation, so oracle-exact).
  * Codegen'd via a static call, like DotProduct. */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(VectorMath.jaccard(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorMath.jaccard($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
}

/** Static helpers shared by interpreted eval and generated code. */
object VectorMath {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val x = a.toDoubleArray()
    val y = b.toDoubleArray()
    val n = math.min(x.length, y.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x(i) * y(i); i += 1 }
    acc
  }
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val set = new java.util.HashSet[UTF8String](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) { set.add(a.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < b.numElements()) { if (set.contains(b.getUTF8String(i))) inter += 1; i += 1 }
    val union = a.numElements() + b.numElements() - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}

/** Session registration so query plans can reference these via expr("..."). */
object F {
  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    ("minhash_sig", (es: Seq[Expression]) => MinHashSig(es.head)),
    ("simhash64", (es: Seq[Expression]) => SimHash64(es.head)),
    ("dot_product", (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("lsh_sigs", (es: Seq[Expression]) => LshSigs(es.head)),
    ("char_shingles", (es: Seq[Expression]) => CharShingles(es(0),
      es(1).eval().asInstanceOf[Int])),
    ("jaccard_sim", (es: Seq[Expression]) => JaccardSim(es(0), es(1))),
    ("ip_to_long", (es: Seq[Expression]) => IpToLong(es.head)),
    ("cidr_contains", (es: Seq[Expression]) => CidrContains(es(0), es(1))),
    ("minhash_union", (es: Seq[Expression]) =>
      MinHashUnionAgg(es.head).toAggregateExpression()))

  def register(spark: SparkSession): Unit = fns.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name),
      builder)
  }
}
