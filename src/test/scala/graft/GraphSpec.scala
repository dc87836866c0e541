package graft

/** Crafted-graph pins for the §2.1 graph-analytics legs: the distributed
  * join-agg implementations must reproduce a dense driver-side replay of
  * the SAME fixed-point arithmetic (q_pagerank) and hand-counted census
  * numbers (q_triangles) on graphs small enough to verify by eye. */
class GraphSpec extends SparkSpec {

  test("q_pagerank matches a dense fixed-point replay on a crafted graph") {
    import spark.implicits._
    val dir = specTempDir("prgraph")
    // trade graph: c1-{s1,s2}, c2-{s1} → s1 is the hub.
    // orders: o1(c1), o2(c2); lineitem: o1→s1, o1→s2, o2→s1 (duplicate
    // o2→s1 line exercises the distinct)
    Seq((1L, 1L), (2L, 2L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 1L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // dense replay of the operator's integer arithmetic (5 iterations,
    // scale 1e9, damping 85/100) over the namespaced node ids
    val edges = Seq( // (src, dst), both directions
      (2L, 3L), (2L, 5L), (4L, 3L), (3L, 2L), (5L, 2L), (3L, 4L))
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    var rank = deg.keys.map(_ -> 1000000000L).toMap
    for (_ <- 1 to 5) {
      val sums = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / deg(src) }.sum
      }
      rank = sums.map { case (id, s) => id -> (150000000L + 85L * s / 100L) }
    }
    val got = SparkEntry.queries("q_pagerank")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == rank, s"pagerank diverged: got $got expected $rank")
    // the hub (s1 = node 3) must outrank everything else
    assert(got(3L) == got.values.max)
  }

  test("q_pagerank conserves rank mass to within per-node truncation") {
    // integer floor division leaks < 1 unit per (edge, iteration) plus
    // < 1 per (node, iteration) from the damping division — mass must
    // stay within that envelope of n·SCALE (a wrong-graph or dropped-node
    // bug loses mass in whole node units, far outside it)
    val df = SparkEntry.queries("q_pagerank")(spark, sf).collect()
    val n = df.length.toLong
    val total = df.map(_.getLong(1)).sum
    val budget = 6L * 50000L * n // generous: iters · (avg deg+1) · n
    assert(math.abs(total - n * 1000000000L) <= budget,
      s"mass off: n=$n total=$total")
  }

  test("q_triangles counts a hand-verifiable census") {
    import spark.implicits._
    val dir = specTempDir("trigraph")
    // order 1 buys parts {1,2,3} (one triangle), order 2 buys {3,4}
    // (pendant edge), order 3 re-buys {1,2} (duplicate edge must not
    // double-count). Degrees: 1:2, 2:2, 3:3, 4:1 → wedges 1+1+3+0 = 5;
    // triangles = 1; cc = 3/5.
    Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 1L), (3L, 2L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("q_triangles")(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 1L, s"triangles: ${r(0)}")
    assert(r(0).getLong(1) == 5L, s"wedges: ${r(0)}")
    assert(r(0).getDouble(2) == 0.6, s"cc: ${r(0)}")
  }

  test("q_triangles: degree orientation emits each triangle exactly once") {
    import spark.implicits._
    val dir = specTempDir("trik4")
    // K4 in one order: C(4,3) = 4 triangles, all degrees 3,
    // wedges = 4·3 = 12, cc = 12/12 = 1.0 (complete graph)
    Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("q_triangles")(spark, dir).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 12L && r.getDouble(2) == 1.0,
      s"K4 census wrong: $r")
  }
}
