package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the Verify/driver contract: every query key must have an oracle and
  * vice versa. A key present on only one side silently drops the query from
  * the driver's correctness compare (round-8 postmortem: broken queries
  * vanished instead of showing red), so drift here is a spec failure, not a
  * stderr line. */
class VerifyParitySpec extends AnyFunSuite {

  test("queries and oracleSql cover exactly the same keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val qOnly = (q -- o).toSeq.sorted
    val oOnly = (o -- q).toSeq.sorted
    assert(qOnly.isEmpty && oOnly.isEmpty,
      s"queries-without-oracle=$qOnly oracle-without-query=$oOnly")
  }

  test("query names are non-empty and filesystem-safe") {
    // names become parquet directory names under the verify outDir
    SparkEntry.queries.keys.foreach { n =>
      assert(n.nonEmpty && n.matches("[A-Za-z0-9_]+"), s"unsafe query name '$n'")
    }
  }

  test("oracle SQL is non-blank for every key") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, s"blank oracle for $k")
    }
  }
}
