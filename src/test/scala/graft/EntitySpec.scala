package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the entity-resolution family (SURVEY §2.3 #200-201).
  * The driver's oracle gate proves Spark-vs-DuckDB agreement on the real
  * part table; these tests run on a CRAFTED catalog where every match,
  * every blocking miss, and every survivorship policy has a known answer
  * — so a threshold, a normalization step, or a merge rule that silently
  * changed cannot stay green. */
class EntitySpec extends SparkSpec {

  private def run(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir)

  /** A catalog with: a true near-dup pair sharing a token ("acme widget"
    * / "acmee widget", dist 1); a near-dup pair sharing NO token ("abc" /
    * "abd", dist 1 — blocked apart by design); a far pair sharing a token
    * ("red widget" / "enormous widget", dist > 3); and a case/space
    * variant pair ("RED WIDGET  " / "red widget") that exact
    * normalization must consolidate BEFORE matching. */
  private lazy val craftedDir: String = {
    import spark.implicits._
    val dir = specTempDir("erspec")
    Seq(
      (1L, "acme widget", "Brand#1", 10, 5.0),
      (2L, "acmee widget", "Brand#2", 20, 7.0),
      (3L, "abc", "Brand#1", 1, 1.0),
      (4L, "abd", "Brand#1", 1, 1.0),
      (5L, "red widget", "Brand#1", 30, 9.0),
      (6L, "RED WIDGET  ", "Brand#3", 40, 11.0),
      (7L, "enormous widget", "Brand#1", 50, 2.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    dir
  }

  test("er_blocked_match: token blocking + edit-distance verify, exact pair set") {
    val pairs = run("er_blocked_match", craftedDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // "acme widget" ~ "acmee widget" (share "widget", dist 1) and the
    // normalized "red widget" ~ "acme(e) widget" are dist 4/5 -> out;
    // "enormous widget" is dist > 3 to everything -> out;
    // "abc" ~ "abd" share no token -> blocked apart (the documented
    // recall boundary of token blocking — pinned absent, not forgotten)
    assert(pairs.toSet == Set(("acme widget", "acmee widget", 1L, 1L, 1L)),
      s"got ${pairs.mkString(";")}")
  }

  test("er_blocked_match: normalization consolidates case/space variants before matching") {
    // "RED WIDGET  " folds into "red widget" -> ONE dictionary entry with
    // n_rows 2; it must not surface as a self-match pair
    val surv = run("er_survivor", craftedDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(surv("red widget").getLong(2) == 2L, "both case variants consolidated")
    val pairs = run("er_blocked_match", craftedDir).collect()
    assert(!pairs.exists(r => r.getString(0) == r.getString(1)), "no self-pairs")
  }

  test("er_survivor: every merge policy pinned on a known group") {
    val byName = run("er_survivor", craftedDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getLong(5)))).toMap
    // red widget: keys {5,6}, brands {Brand#1,Brand#3}, prices {9,11},
    // sizes {30,40}
    assert(byName("red widget") == ((5L, 2L, 2L, 11.0, 30L)))
    // singleton keeps its own attributes
    assert(byName("enormous widget") == ((7L, 1L, 1L, 2.0, 50L)))
    assert(byName.size == 6, s"6 distinct normalized names, got ${byName.keySet}")
  }

  test("empty catalog: both entries keep their (empty) output contract") {
    val dir = specTempDir("erempty")
    Tables.t(spark, craftedDir, "part").limit(0)
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    assert(run("er_blocked_match", dir).count() == 0L)
    assert(run("er_survivor", dir).count() == 0L)
  }

  test("er_cluster: closure, singletons and canonical policy on the crafted catalog") {
    val ents = run("er_cluster", craftedDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // matches: only (acme widget, acmee widget) -> entity_id = min nid = 1,
    // canonical = tie on n_rows (1 each) -> lexicographically first
    assert(ents(1L) == ((2L, 2L, "acme widget")), s"got ${ents.get(1L)}")
    // "red widget" consolidates both case variants BEFORE clustering:
    // singleton entity with n_rows 2 and its own nid (5)
    assert(ents(5L) == ((1L, 2L, "red widget")))
    // abc/abd share no token -> blocked apart -> two singleton entities
    assert(ents(3L) == ((1L, 1L, "abc")) && ents(4L) == ((1L, 1L, "abd")))
    assert(ents.size == 5, s"5 entities over 6 names, got ${ents.keySet}")
  }

  test("er_cluster: transitive closure chains a~b~c into ONE entity without a direct a~c match") {
    import spark.implicits._
    val dir = specTempDir("erchain")
    // dist(aa, aabb) = 2, dist(aabb, aabbcc) = 2, dist(aa, aabbcc) = 4 —
    // the endpoints match only THROUGH the middle name
    Seq((10L, "widget aa", "B#1", 1, 1.0),
      (11L, "widget aabb", "B#1", 1, 1.0),
      (12L, "widget aabbcc", "B#1", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val pairs = run("er_blocked_match", dir).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("widget aa", "widget aabb"),
      ("widget aabb", "widget aabbcc")), s"endpoint pair must be absent: $pairs")
    val ents = run("er_cluster", dir).collect()
    assert(ents.length == 1 && ents.head.getLong(0) == 10L &&
      ents.head.getLong(1) == 3L, s"one 3-name entity, got ${ents.mkString(";")}")
  }

  test("er_cluster: empty catalog keeps the empty output contract") {
    val dir = specTempDir("ercempty")
    Tables.t(spark, craftedDir, "part").limit(0)
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    assert(run("er_cluster", dir).count() == 0L)
  }

  test("er_cluster on the real catalog: a partition of the dictionary") {
    val names = Tables.t(spark, sf, "part")
      .select(lower(trim(col("p_name"))).as("n")).distinct().count()
    val ents = run("er_cluster", sf).collect()
    assert(ents.map(_.getLong(1)).sum == names,
      "every dictionary name belongs to exactly one entity")
    assert(ents.map(_.getLong(0)).distinct.length == ents.length)
  }

  test("er_multi_block: the prefix pass recovers the token pass's documented recall boundary") {
    val byPass = run("er_multi_block", craftedDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // token: the four widget-sharing names -> C(4,2)=6 candidates, only
    // (acme widget, acmee widget) verifies; prefix2: {ac: acme/acmee,
    // ab: abc/abd} -> 2 candidates, BOTH verify — abc/abd is exactly the
    // pair token blocking is blind to; union: 7 distinct candidates, 2 matches
    assert(byPass("block:token") == ((6L, 1L)), s"got $byPass")
    assert(byPass("block:prefix2") == ((2L, 2L)))
    assert(byPass("union") == ((7L, 2L)),
      "the union pass must recover abc~abd without double-counting acme~acmee")
  }

  test("er_blocked_match on the real catalog: vocabulary-bounded and symmetric-free") {
    val rows = run("er_blocked_match", sf).collect()
    assert(rows.nonEmpty, "the 8x8 name grid has near pairs")
    // pair table is strictly ordered (name_a < name_b): no duplicates,
    // no reversed copies
    assert(rows.forall(r => r.getString(0) < r.getString(1)))
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length == keys.length)
    assert(rows.forall(_.getLong(2) <= 3L))
  }
}
