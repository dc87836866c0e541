package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property-based checks over the native expressions (ScalaCheck
  * generators, seeded deterministic sampling): invariants that must hold
  * for ANY input, not just the test corpus. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** deterministic forAll: n seeded samples from the generator */
  private def forAll[A](gen: Gen[A], n: Int = 25)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private lazy val registered = { Graft.init(spark); true }

  private val strList = Gen.listOfN(30, Gen.alphaLowerStr.suchThat(_.nonEmpty)).map(_.distinct)

  test("jaccard_sim ∈ [0,1], symmetric, 1 on self") {
    assert(registered)
    forAll(Gen.zip(strList, strList)) { case (a, b) =>
      if (a.nonEmpty && b.nonEmpty) {
        val df = Seq((a, b)).toDF("a", "b")
        val j1 = df.select(expr("jaccard_sim(a, b)")).head.getDouble(0)
        val j2 = df.select(expr("jaccard_sim(b, a)")).head.getDouble(0)
        assert(j1 >= 0.0 && j1 <= 1.0 && j1 == j2)
        val self = Seq((a, a)).toDF("a", "b")
          .select(expr("jaccard_sim(a, b)")).head.getDouble(0)
        assert(self == 1.0)
      }
    }
  }

  test("minhash signature agreement tracks exact Jaccard within ±0.25") {
    assert(registered)
    val gen = for {
      base <- Gen.listOfN(80, Gen.identifier.suchThat(_.nonEmpty)).map(_.distinct)
      keep <- Gen.choose(0, base.length)
    } yield (base, base.take(keep) ++ (1 to (base.length - keep)).map("x" + _))
    forAll(gen, 15) { case (a, b) =>
      if (a.nonEmpty && b.nonEmpty) {
        val exact = a.toSet.intersect(b.toSet).size.toDouble / a.toSet.union(b.toSet).size
        val df = Seq((a, b)).toDF("a", "b")
          .select(expr("minhash_sig(a)").as("sa"), expr("minhash_sig(b)").as("sb"))
          .select(expr("aggregate(zip_with(sa, sb, (x, y) -> IF(x = y, 1, 0)), 0, (s, x) -> s + x) / CAST(64 AS DOUBLE)"))
        val est = df.head.getDouble(0)
        assert(math.abs(est - exact) <= 0.25, s"exact=$exact est=$est")
      }
    }
  }

  test("cidr_contains agrees with arithmetic model for random ips/prefixes") {
    assert(registered)
    val ipGen = Gen.listOfN(4, Gen.choose(0, 255)).map(_.mkString("."))
    val cidrGen = for { ip <- ipGen; len <- Gen.choose(0, 32) } yield s"$ip/$len"
    forAll(Gen.zip(ipGen, cidrGen), 40) { case (ip, cidr) =>
      val got = Seq((cidr, ip)).toDF("c", "i")
        .select(expr("cidr_contains(c, i)")).head.getBoolean(0)
      def toLong(s: String) = s.split('.').map(_.toLong).reduce((a, b) => (a << 8) | b)
      val Array(net, len) = cidr.split('/')
      val shift = 32 - len.toInt
      val want = (toLong(ip) >>> shift) == (toLong(net) >>> shift)
      assert(got == want, s"$cidr contains $ip: got=$got want=$want")
    }
  }

  test("custom top-k equals sort-take on random data") {
    assert(registered)
    val rows = Gen.listOfN(200, for {
      g <- Gen.choose(0, 4); v <- Gen.choose(-1000, 1000); id <- Gen.choose(0, 100000)
    } yield (g.toLong, v.toLong, id.toLong))
    forAll(rows, 8) { data =>
      if (data.nonEmpty) {
        val dedup = data.distinct
        val df = dedup.toDF("g", "v", "id")
        val got = plans.GraftOps.topKPerGroup(spark, df, Seq("g"),
          Seq(("v", true), ("id", true)), 3, "rk")
          .select("g", "v", "id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val want = dedup.groupBy(_._1).flatMap { case (_, rs) =>
          rs.sortBy(t => (t._2, t._3)).take(3)
        }.toSet
        assert(got == want)
      }
    }
  }
}
