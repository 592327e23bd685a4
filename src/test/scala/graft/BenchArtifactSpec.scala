package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact is the cross-round adjudication channel — its JSON
  * must stay parseable exactly when things go wrong (a failed query's
  * exception message is multi-line). */
class BenchArtifactSpec extends AnyFunSuite {

  test("jsonStr escapes control characters so failure messages stay valid JSON") {
    val msg = "AnalysisException: [UNRESOLVED_COLUMN]\nline 2\ttabbed\rcrctl \"quoted\" back\\slash"
    val escaped = Bench.jsonStr(msg)
    // must parse back to the original through a real JSON parser
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val parsed = mapper.readTree(s"""{"m":$escaped}""").get("m").asText
    assert(parsed == msg)
    // and the escaped form itself carries no raw control characters
    assert(!escaped.exists(c => c < 0x20))
  }

  test("jsonStr on null reference renders the string 'null' safely") {
    val escaped = Bench.jsonStr(null)
    assert(escaped == "\"null\"")
  }
}
