package graft.sources.api

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Built-in demo plugin: a deterministic functional "API" (every row is a
  * pure function of its key), so DuckDB oracles can reproduce the data via
  * range(). Mirrors the reference's plugin surface: a paginated list table
  * (`numbers`, key-range pushdown) and a required-key get table (`kv`,
  * reference table.go:180-215 required key columns).
  *
  * Exercises the full reference type surface (mapping.go:66-84): BOOL, INT,
  * DOUBLE, STRING, TIMESTAMP (NTZ micros), JSON, IPADDR, CIDR, LTREE. */
object SeqPlugin extends Plugin {
  override def name: String = "seq"
  override def tables: Seq[ApiTable] = Seq(NumbersTable, KvTable, FlakyTable)
}

/** A table whose first scan attempt of every (split, query) FAILS with a
  * transient error — the rate-limited/5xx API every production connector
  * meets. Proves the scan layer's split-granularity retry: results stay
  * complete and deterministic, failures visible only in ScanLedger.retries. */
object FlakyTable extends ApiTable {
  override def name: String = "flaky"
  override def schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("x", LongType, nullable = false)))

  private val attempts = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Re-arm the one-failure-per-split simulation. Called from
    * ScanLedger.reset() so each spec/bench run observes the same retry
    * count — otherwise a key fails only once per JVM and a second
    * identical scan exercises no retries. */
  def resetAttempts(): Unit = attempts.clear()

  override def splits(qc: QueryContext, config: PluginConfig): Seq[ApiSplit] =
    (0L until config.n by config.pageSize)
      .map(s => RangeSplit(s, math.min(s + config.pageSize, config.n)))

  override def scan(split: ApiSplit, qc: QueryContext, config: PluginConfig): Iterator[Array[Any]] = {
    val RangeSplit(lo, hi, _) = split: @unchecked
    val key = s"$lo-$hi/${qc.columns.mkString(",")}/${qc.quals.mkString(",")}"
    if (attempts.putIfAbsent(key, java.lang.Boolean.TRUE) == null)
      throw new TransientApiError(s"simulated rate limit on split [$lo, $hi)")
    Iterator.range(lo, hi).map { i =>
      val row = Map[String, Any]("id" -> i, "x" -> (i * 13) % 101)
      qc.columns.map(row).toArray
    }
  }
}

final case class RangeSplit(start: Long, end: Long, desc: Boolean = false)
    extends ApiSplit

object NumbersTable extends ApiTable {
  override def name: String = "numbers"
  /** epoch micros of 2024-01-01T00:00:00Z */
  private val baseTs = 1704067200000000L

  override def schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),        // INT
    StructField("x", LongType, nullable = false),         // INT (derived)
    StructField("s", StringType, nullable = false),       // STRING
    StructField("flag", BooleanType, nullable = false),   // BOOL
    StructField("ratio", DoubleType, nullable = false),   // DOUBLE
    StructField("ts", TimestampNTZType, nullable = false),// TIMESTAMP
    StructField("j", StringType, nullable = false),       // JSON
    StructField("ip", StringType, nullable = false),      // IPADDR
    StructField("cidr", StringType, nullable = false),    // CIDR
    StructField("path", StringType, nullable = false)))   // LTREE

  override def keyColumns: Seq[KeyColumn] = Seq(
    KeyColumn("id", required = false, operators = Seq("=", ">", ">=", "<", "<=", "in")),
    KeyColumn("ts", required = false, operators = Seq("=", ">", ">=", "<", "<=")))

  /** id and ts quals are enforced exactly by key narrowing in splits():
    * range quals shrink [lo, hi), IN lists become one probe split per value
    * (the SQLite `=`-probe decomposition, reference table.go:127-151), and
    * ts quals convert to id bounds through the exact minute-grid inverse. */
  override def exactlyHandled(q: Qual): Boolean = q.field match {
    case "id" =>
      (Seq("=", ">", ">=", "<", "<=").contains(q.op) && q.value.isInstanceOf[Long]) ||
        (q.op == "in" && (q.value match {
          case vs: Seq[_] => vs.forall(_.isInstanceOf[Long])
          case _ => false
        }))
    case "ts" => Seq(">", ">=", "<", "<=").contains(q.op) && q.value.isInstanceOf[Long]
    // s = 'row_<id>' embeds the key, so any LIKE-prefix inverts to EXACT
    // key ranges (empty, full, or one range per decimal magnitude)
    case "s" => q.op == "starts_with" && q.value.isInstanceOf[String]
    case _ => false
  }

  /** Key ranges whose rows' `s` column starts with `p`: ids have no
    * leading zeros, so a digit prefix d matches [d·10^k, (d+1)·10^k) for
    * every magnitude k (d = 0 matches only id 0). */
  private def prefixRanges(p: String, n: Long): Seq[(Long, Long)] = {
    val base = "row_"
    if (p.length <= base.length) {
      if (base.startsWith(p)) Seq((0L, n)) else Seq.empty
    } else if (!p.startsWith(base)) Seq.empty
    else {
      val rest = p.substring(base.length)
      if (!rest.forall(_.isDigit)) Seq.empty
      else if (rest == "0") Seq((0L, 1L))
      else if (rest.head == '0') Seq.empty
      else {
        val d = rest.toLong
        Iterator.iterate(1L)(_ * 10)
          .takeWhile(m => m <= n && d <= n / m)
          .map(m => (d * m, math.min(Math.addExact(d, 1) * m, n)))
          .filter { case (l, h) => l < h }
          .toSeq
      }
    }
  }

  /** Intersection of all pushed prefix quals' range sets (None = no
    * prefix qual pushed). */
  private def prefixNarrowed(qc: QueryContext, config: PluginConfig): Option[Seq[(Long, Long)]] = {
    val ps = qc.quals.collect { case Qual("s", "starts_with", p: String) => p }
    if (ps.isEmpty) None
    else Some(ps.map(p => prefixRanges(p, config.n)).reduce { (a, b) =>
      for {
        (al, ah) <- a; (bl, bh) <- b
        l = math.max(al, bl); h = math.min(ah, bh); if l < h
      } yield (l, h)
    })
  }

  private def ceilDiv(a: Long, b: Long): Long = Math.floorDiv(a + b - 1, b)
  private val tickUs = 60000000L // one row per minute

  override def estimatedRows(qc: QueryContext, config: PluginConfig): Option[Long] = {
    val (lo, hi, inIds) = narrowed(qc, config)
    val pr = prefixNarrowed(qc, config)
    Some(inIds
      .map(_.count(v => v >= lo && v < hi &&
        pr.forall(_.exists(r => v >= r._1 && v < r._2))).toLong)
      .getOrElse(pr match {
        case Some(rs) => rs.map { case (l, h) =>
          math.max(0L, math.min(h, hi) - math.max(l, lo))
        }.sum
        case None => math.max(0L, hi - lo)
      }))
  }

  /** Narrow the key range with the pushed id AND ts quals (the reference's
    * xBestIndex cost model made key-column quals cheap for the same
    * reason: they shrink what the plugin must fetch), then page it — or
    * emit one probe split per IN value. */
  override def splits(qc: QueryContext, config: PluginConfig): Seq[ApiSplit] = {
    val (lo, hi, inIds) = narrowed(qc, config)
    if (qc.orderBy.nonEmpty) {
      // accepted ordered page (supportsOrderedPage): both sortable columns
      // (id, ts) are monotone in the key, so ORDER BY + OFFSET + LIMIT is
      // a closed-form key slice — ONE split, already in order
      val desc = qc.orderBy.head.descending
      val (lo2, hi2) =
        if (desc) {
          val h = hi - qc.offset
          (qc.limit.fold(lo)(l => math.max(lo, h - l)), math.max(lo, h))
        } else {
          val l2 = lo + qc.offset
          (math.min(l2, hi), qc.limit.fold(hi)(l => math.min(hi, l2 + l)))
        }
      if (lo2 >= hi2) Seq.empty else Seq(RangeSplit(lo2, hi2, desc))
    } else inIds match {
      case Some(ids) =>
        // exactlyHandled drops Spark's residual LIKE, so the IN probes must
        // also respect any pushed starts_with prefix ranges — without this
        // intersection `id IN (...) AND s LIKE 'row_p%'` leaks non-matches
        val pr = prefixNarrowed(qc, config)
        ids.filter(v => v >= lo && v < hi &&
            pr.forall(_.exists(r => v >= r._1 && v < r._2)))
          .distinct.sorted
          .map(v => RangeSplit(v, v + 1))
      case None => prefixNarrowed(qc, config) match {
        case Some(ranges) =>
          // one page-bounded split per (prefix range ∩ key bounds)
          ranges.flatMap { case (l0, h0) =>
            val l = math.max(l0, lo)
            val h = math.min(h0, hi)
            (l until h by config.pageSize)
              .map(s => RangeSplit(s, math.min(s + config.pageSize, h)))
          }
        case None =>
          (lo until hi by config.pageSize)
            .map(s => RangeSplit(s, math.min(s + config.pageSize, hi)))
      }
    }
  }

  /** ORDER BY id|ts [DESC] LIMIT/OFFSET is answerable in closed form: both
    * columns are strictly monotone in the key, every supported qual is
    * exact key narrowing, and the page is one contiguous slice. IN probes
    * are excluded (they fan into per-value splits, breaking the one-split
    * ordering contract). */
  override def supportsOrderedPage(qc: QueryContext, config: PluginConfig): Boolean =
    qc.orderBy.length == 1 && Seq("id", "ts").contains(qc.orderBy.head.field) &&
      qc.quals.forall(exactlyHandled) &&
      !qc.quals.exists(q => q.op == "in" || q.op == "starts_with")

  private def narrowed(qc: QueryContext, config: PluginConfig): (Long, Long, Option[Seq[Long]]) = {
    var lo = 0L
    var hi = config.n // exclusive
    var inIds: Option[Seq[Long]] = None
    qc.quals.filter(_.field == "id").foreach { q =>
      (q.op, q.value) match {
        case ("in", vs: Seq[_]) =>
          val longs = vs.collect { case l: Long => l }
          inIds = Some(inIds.map(_.intersect(longs)).getOrElse(longs))
        case (op, v: Long) => op match {
          case "=" => lo = math.max(lo, v); hi = math.min(hi, v + 1)
          case ">" => lo = math.max(lo, v + 1)
          case ">=" => lo = math.max(lo, v)
          case "<" => hi = math.min(hi, v)
          case "<=" => hi = math.min(hi, v + 1)
          case _ =>
        }
        case _ =>
      }
    }
    // ts sits on an exact minute grid (ts = baseTs + id * tickUs), so
    // timestamp ranges invert to id ranges without rounding error
    qc.quals.filter(_.field == "ts").foreach { q =>
      q.value match {
        case v: Long =>
          val delta = v - baseTs
          q.op match {
            case ">=" => lo = math.max(lo, ceilDiv(delta, tickUs))
            case ">" => lo = math.max(lo, Math.floorDiv(delta, tickUs) + 1)
            case "<" => hi = math.min(hi, ceilDiv(delta, tickUs))
            case "<=" => hi = math.min(hi, Math.floorDiv(delta, tickUs) + 1)
            case "=" =>
              if (delta >= 0 && delta % tickUs == 0) {
                lo = math.max(lo, delta / tickUs); hi = math.min(hi, delta / tickUs + 1)
              } else hi = lo // off-grid equality matches nothing
            case _ =>
          }
        case _ =>
      }
    }
    (lo, hi, inIds)
  }

  override def latestKey(config: PluginConfig): Option[Long] = Some(config.n)

  /** Closed-form partial aggregates over a key-range split — the API
    * analog of a count endpoint: id is the key itself and ts sits on the
    * exact minute grid, so COUNT/MIN/MAX need no row enumeration at all. */
  override def aggregateSplit(split: ApiSplit, qc: QueryContext,
      config: PluginConfig, aggs: Seq[AggSpec]): Option[Array[Any]] = {
    val RangeSplit(lo, hi, _) = split: @unchecked
    val vals = aggs.map {
      case AggSpec("count_star", _) => Some(hi - lo)
      case AggSpec("min", Some("id")) => Some(lo)
      case AggSpec("max", Some("id")) => Some(hi - 1)
      case AggSpec("min", Some("ts")) => Some(baseTs + lo * tickUs)
      case AggSpec("max", Some("ts")) => Some(baseTs + (hi - 1) * tickUs)
      case _ => None
    }
    if (vals.exists(_.isEmpty)) None
    else Some(vals.flatten.map(_.asInstanceOf[Any]).toArray)
  }

  override def scan(split: ApiSplit, qc: QueryContext, config: PluginConfig): Iterator[Array[Any]] = {
    val RangeSplit(lo, hi, desc) = split: @unchecked
    val residual = qc.quals.filterNot(_.field == "id") // id handled by range
    val limit = qc.limit.getOrElse(Long.MaxValue)
    (if (desc) Iterator.range(hi - 1, lo - 1, -1L) else Iterator.range(lo, hi))
      .map(row)
      .filter(r => residual.forall(q => satisfies(r, q)))
      .take(if (limit > Int.MaxValue) Int.MaxValue else limit.toInt)
      .map(r => qc.columns.map(c => r(colIdx(c))).toArray)
  }

  private val colIdx: Map[String, Int] = schema.fieldNames.zipWithIndex.toMap

  /** The row generator — the "API response" for one key. */
  private def row(i: Long): Array[Any] = Array[Any](
    i,
    (i * 7) % 97,
    UTF8String.fromString(s"row_$i"),
    i % 2 == 0,
    i / 100.0,
    baseTs + i * 60000000L,
    UTF8String.fromString(s"""{"k":${i % 10}}"""),
    UTF8String.fromString(s"10.${(i / 65536) % 256}.${(i / 256) % 256}.${i % 256}"),
    UTF8String.fromString(s"192.168.${i % 256}.0/24"),
    UTF8String.fromString(s"root.n${i % 10}.leaf"))

  private def satisfies(r: Array[Any], q: Qual): Boolean = {
    val v = r(colIdx(q.field))
    (v, q.value) match {
      case (a: Long, b: Long) => cmp(java.lang.Long.compare(a, b), q.op)
      case (a: Double, b: Double) => cmp(java.lang.Double.compare(a, b), q.op)
      case (a: Boolean, b: Boolean) => q.op == "=" && a == b
      case (a: UTF8String, b) => cmp(a.toString.compareTo(b.toString), q.op)
      case _ => true // unknown comparison: let Spark's residual filter decide
    }
  }
  private def cmp(c: Int, op: String): Boolean = op match {
    case "=" => c == 0
    case ">" => c > 0
    case ">=" => c >= 0
    case "<" => c < 0
    case "<=" => c <= 0
    case _ => true
  }
}

/** A "get" table: the required key column MUST be constrained, like an API
  * that can only GET by id (reference table.go:allRequiredKeyColsInConstraints). */
object KvTable extends ApiTable {
  override def name: String = "kv"
  override def schema: StructType = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("val", StringType, nullable = false),
    StructField("k2", LongType, nullable = false)))
  override def keyColumns: Seq[KeyColumn] =
    Seq(KeyColumn("k", required = true, operators = Seq("=", "in")))

  final case class KeySplit(k: Long) extends ApiSplit

  /** `k = v` and `k IN (...)` both satisfy the required key: IN expands to
    * one GET split per value, the API analog of SQLite's `=`-probe
    * decomposition (reference table.go:127-151). */
  override def splits(qc: QueryContext, config: PluginConfig): Seq[ApiSplit] =
    qc.quals.flatMap {
      case Qual("k", "=", v: Long) => Seq(v)
      case Qual("k", "in", vs: Seq[_]) => vs.collect { case l: Long => l }
      case _ => Nil
    }.distinct.sorted.map(KeySplit)

  override def scan(split: ApiSplit, qc: QueryContext, config: PluginConfig): Iterator[Array[Any]] = {
    val KeySplit(k) = split: @unchecked
    val full = Map[String, Any]("k" -> k,
      "val" -> UTF8String.fromString(s"v$k"), "k2" -> k * k)
    Iterator.single(qc.columns.map(full).toArray)
  }
}
