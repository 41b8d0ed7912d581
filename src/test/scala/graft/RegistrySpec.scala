package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver-contract registry: every query is classified as
  * exactly one of DuckDB-oracled or rows-only, and the CLAUDE.md self-check
  * line tracks `oracleSql.size` (it drifted once — round-5 advice — so the
  * count is now test-enforced, not convention-enforced). Pure set algebra,
  * no Spark session.
  */
class RegistrySpec extends AnyFunSuite {

  test("oracleSql and rowsOnly partition the query registry") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val r = SparkEntry.rowsOnly

    val phantomOracles = o -- q
    assert(phantomOracles.isEmpty, s"oracleSql keys without a query: $phantomOracles")
    val phantomRowsOnly = r -- q
    assert(phantomRowsOnly.isEmpty, s"rowsOnly keys without a query: $phantomRowsOnly")
    val doubled = o.intersect(r)
    assert(doubled.isEmpty, s"queries classified as BOTH oracled and rows-only: $doubled")
    val unclassified = q -- o -- r
    assert(unclassified.isEmpty,
      s"queries in neither oracleSql nor rowsOnly (classify each new query): $unclassified")
  }

  test("CLAUDE.md self-check count equals oracleSql.size") {
    val claude = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("CLAUDE.md")), "UTF-8")
    val m = """"(\d+) pass, 0 fail"""".r.findFirstMatchIn(claude)
    assert(m.isDefined, "CLAUDE.md no longer documents the expected oracle pass count")
    assert(m.get.group(1).toInt == SparkEntry.oracleSql.size,
      s"CLAUDE.md says ${m.get.group(1)} oracled queries, registry has ${SparkEntry.oracleSql.size} — " +
        "update the CLAUDE.md self-check line when adding oracles")
  }
}
