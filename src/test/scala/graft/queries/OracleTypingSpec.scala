package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The driver's correctness hash is dtype-sensitive, and DuckDB widens
  * `SUM(BIGINT)` to HUGEINT (float64 after the driver's dataframe
  * conversion) while Spark stays at BIGINT — so an oracle with a bare
  * integer `SUM` hash-mismatches even when every value agrees. That exact
  * bug cost `dwrf_bucket_join` a red CORRECTNESS_r11 row (the engine
  * output was verified bit-exact; the oracle's one un-cast
  * `SUM(n_orders)` was the repo's only deviation from its own
  * `CAST(SUM(x) AS BIGINT)` convention). This spec automates the class
  * away: every `SUM(`/`AVG(` in the OUTERMOST select of a
  * `SparkEntry.oracleSql` query (paren depth 0 — a CTE's or subquery's
  * widened result never reaches the output schema unconverted) must
  * either be wrapped in an explicit `CAST(...)` (optionally through
  * `ROUND`, the `dsum` shape) or take an argument already cast to
  * DECIMAL (exact, so both engines agree after the outer cast).
  */
class OracleTypingSpec extends AnyFunSuite {

  private val agg = "(?i)\\b(SUM|AVG)\\s*\\(".r
  private val wrapped = "(?is).*CAST\\s*\\(\\s*(ROUND\\s*\\(\\s*)?$".r

  /** Paren nesting depth at index `at`. */
  private def depthAt(sql: String, at: Int): Int = {
    var depth = 0
    var i = 0
    while (i < at) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
      }
      i += 1
    }
    depth
  }

  /** Balanced-paren argument of the call opening at `open` (index of
    * the '(' itself). */
  private def argOf(sql: String, open: Int): String = {
    var depth = 0
    var i = open
    while (i < sql.length) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return sql.substring(open + 1, i)
        case _ =>
      }
      i += 1
    }
    sql.substring(open + 1) // unbalanced — let the engines complain
  }

  private def offendersIn(oracles: Seq[(String, String)]): Seq[String] =
    for {
      (name, sql) <- oracles
      m <- agg.findAllMatchIn(sql)
      if depthAt(sql, m.start) == 0
      arg = argOf(sql, sql.indexOf('(', m.start))
      if !arg.toUpperCase.contains("DECIMAL")
      if !wrapped.pattern.matcher(sql.substring(0, m.start)).matches
    } yield s"$name: ...${sql.substring(m.start, math.min(sql.length, m.start + 60)).replaceAll("\\s+", " ")}"

  test("every oracle SUM/AVG is CAST-wrapped or DECIMAL-argumented") {
    val offenders = offendersIn(graft.SparkEntry.oracleSql.toSeq)
    assert(offenders.isEmpty,
      s"bare integer aggregate(s) in oracle SQL — DuckDB widens these " +
        s"and the driver hash will mismatch:\n${offenders.mkString("\n")}")
  }

  test("canary: the rule catches the r11 dwrf_bucket_join bug shape") {
    val bad = "SELECT k, SUM(n_orders) AS n_orders FROM (" +
      "SELECT k, COUNT(*) AS n_orders FROM t GROUP BY k) GROUP BY k"
    assert(offendersIn(Seq("canary" -> bad)).size == 1)
    val fixed = bad.replace("SUM(n_orders) AS",
      "CAST(SUM(n_orders) AS BIGINT) AS")
    assert(offendersIn(Seq("canary" -> fixed)).isEmpty)
    // subquery/CTE aggregates never reach the output dtype — not flagged
    val inner = "SELECT s FROM (SELECT SUM(x) AS s FROM t) WHERE s > 0"
    assert(offendersIn(Seq("canary" -> inner)).isEmpty)
    // the dsum shape is wrapped through ROUND
    val dsumShape = "SELECT CAST(ROUND(SUM(CAST(x AS DECIMAL(18,6))), 2) " +
      "AS DOUBLE) AS v FROM t"
    assert(offendersIn(Seq("canary" -> dsumShape)).isEmpty)
  }
}
