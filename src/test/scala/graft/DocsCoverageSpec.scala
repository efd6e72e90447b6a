package graft

import org.scalatest.funsuite.AnyFunSuite

/** Machine-check of README.md's hand-maintained operator-coverage
  * table against the live query registry — the round-9/10 count-sync
  * slips showed that a 219-row table WILL drift without a spec.
  *
  * Contract: every `SparkEntry.queries` key's qNNN id must be cited
  * somewhere in the "## Operator coverage" section (ranges like
  * `q1-q9` expand), and every qNNN the section cites must exist in
  * the registry (catches stale citations after renames/removals).
  * No SparkSession needed — this is a pure doc/registry diff.
  */
class DocsCoverageSpec extends AnyFunSuite {

  private def coverageSection: String = {
    val txt = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val start = txt.indexOf("## Operator coverage")
    val end = txt.indexOf("## Scale design notes")
    assert(start >= 0 && end > start,
      "README.md must keep the '## Operator coverage' and " +
        "'## Scale design notes' section anchors")
    txt.substring(start, end)
  }

  test("README coverage table cites every registry query, and only those") {
    val cov = coverageSection
    val range = """\bq(\d+)(?:-q(\d+))?""".r
    val cited = range.findAllMatchIn(cov).flatMap { m =>
      val a = m.group(1).toInt
      val b = Option(m.group(2)).map(_.toInt).getOrElse(a)
      a to b
    }.toSet
    val registry = SparkEntry.queries.keys.map { k =>
      val qm = """^q(\d+)_.*$""".r
      k match {
        case qm(n) => n.toInt
        case other => fail(s"registry key '$other' is not qNNN_name-shaped")
      }
    }.toSet
    val uncited = registry -- cited
    assert(uncited.isEmpty,
      s"registry queries missing from README coverage rows: " +
        s"${uncited.toSeq.sorted.map("q" + _).mkString(", ")}")
    val stale = cited -- registry
    assert(stale.isEmpty,
      s"README coverage cites query ids not in the registry: " +
        s"${stale.toSeq.sorted.map("q" + _).mkString(", ")}")
  }

  test("README/SURVEY spec-count references match reality is enforced elsewhere") {
    // registry size sanity: oracleSql keys must be a subset of queries
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracleSql keys without a query impl: $extra")
  }
}
