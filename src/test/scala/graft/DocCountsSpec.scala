package graft

import org.scalatest.funsuite.AnyFunSuite

/** Locks the documented query count to the registry so README/SURVEY
  * drift (r8 ADVICE: README said 105 while the registry had 106) cannot
  * recur: the build fails the moment a query lands without the doc edit.
  */
class DocCountsSpec extends AnyFunSuite {

  private val CountRe = """\((\d+) as of round \d+\)""".r

  private def documentedCount(path: String): Option[Int] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try CountRe.findFirstMatchIn(src.mkString).map(_.group(1).toInt)
    finally src.close()
  }

  test("README oracle count matches SparkEntry.queries.size") {
    val doc = documentedCount("README.md")
    assert(doc.nonEmpty, "README.md no longer states the oracle count")
    assert(doc.get === SparkEntry.queries.size)
  }

  test("every query has an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }
}
