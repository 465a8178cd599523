package graft

import org.scalatest.funsuite.AnyFunSuite

/** README's query-inventory numbers have drifted twice across rounds when
  * hand-synced; this spec derives every claim from `SparkEntry` itself and
  * fails the build when the README and the code disagree — the inventory
  * section is now generated-by-checking rather than trusted.
  */
class ReadmeCountsSpec extends AnyFunSuite {

  private lazy val readme: String = {
    val p = java.nio.file.Paths.get("README.md")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  /** The `## Query inventory` section, exclusive of the following `## `. */
  private lazy val inventory: String = {
    val start = readme.indexOf("## Query inventory")
    assert(start >= 0, "README must keep a '## Query inventory' section")
    val rest = readme.substring(start)
    val end = rest.indexOf("\n## ", 1)
    if (end < 0) rest else rest.substring(0, end)
  }

  /** The name listing only: the trailing "(* = rows-only …)" prose note
    * re-mentions queries and must not count as inventory entries. */
  private lazy val listing: String = {
    val cut = inventory.indexOf("(* =")
    if (cut < 0) inventory else inventory.substring(0, cut)
  }

  test("header counts match SparkEntry.queries / oracleSql") {
    val h = """SparkEntry\.queries — (\d+) total, (\d+) DuckDB-oracle-checked""".r
    val m = h.findFirstMatchIn(inventory).getOrElse(
      fail("inventory header must state 'N total, M DuckDB-oracle-checked'"))
    assert(m.group(1).toInt == SparkEntry.queries.size,
      s"README total=${m.group(1)} but SparkEntry.queries has ${SparkEntry.queries.size}")
    assert(m.group(2).toInt == SparkEntry.oracleSql.size,
      s"README oracle-checked=${m.group(2)} but SparkEntry.oracleSql has ${SparkEntry.oracleSql.size}")
  }

  test("every query is listed exactly once; stars mark exactly the rows-only set") {
    // names appear as `name` with an optional trailing * for rows-only
    val entry = """`([a-z0-9_]+)`(\*?)""".r
    val listed = entry.findAllMatchIn(listing)
      .map(m => m.group(1) -> (m.group(2) == "*")).toSeq
    val names = listed.map(_._1)
    assert(names.distinct.size == names.size,
      s"duplicated inventory entries: ${names.diff(names.distinct).distinct}")
    assert(names.toSet == SparkEntry.queries.keySet,
      s"missing from README: ${SparkEntry.queries.keySet -- names.toSet}; " +
        s"stale in README: ${names.toSet -- SparkEntry.queries.keySet}")
    val starred = listed.collect { case (n, true) => n }.toSet
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(starred == rowsOnly,
      s"starred-but-oracled: ${starred -- rowsOnly}; rows-only-but-unstarred: ${rowsOnly -- starred}")
  }

  test("per-category counts match the names under each bullet") {
    val cat = """- \*\*[^*]+\*\* \((\d+)\):""".r
    val blocks = cat.findAllMatchIn(listing).toSeq
    assert(blocks.nonEmpty, "inventory must keep '- **Category** (N):' bullets")
    val bounds = blocks.map(_.start) :+ listing.length
    blocks.zipWithIndex.foreach { case (m, i) =>
      val block = listing.substring(bounds(i), bounds(i + 1))
      val n = """`([a-z0-9_]+)`""".r.findAllMatchIn(block).size
      assert(m.group(1).toInt == n,
        s"category claims ${m.group(1)} queries but lists $n:\n$block")
    }
    val claimed = blocks.map(_.group(1).toInt).sum
    assert(claimed == SparkEntry.queries.size,
      s"category counts sum to $claimed, SparkEntry has ${SparkEntry.queries.size}")
  }

  test("every oracle key refers to a query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without a query: $orphans")
  }
}
