package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity — cheap structural guards that became worth
  * pinning once the r14 split moved queries and oracle SQL into
  * separate modules: a query registered without its oracle (or vice
  * versa) would silently weaken the driver's correctness gate, and a
  * null/empty SQL string (the strict-val forward-reference trap
  * OracleSql documents) would fail it confusingly at driver time.
  * Pure map checks — no SparkSession. */
class RegistrySpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries missing oracle SQL: ${q -- o}")
    assert((o -- q).isEmpty, s"oracle SQL without a query: ${o -- q}")
  }

  test("no oracle SQL is null or blank (forward-reference trap)") {
    val bad = SparkEntry.oracleSql.collect {
      case (k, v) if v == null || v.trim.isEmpty => k
    }
    assert(bad.isEmpty, s"null/blank oracle SQL: $bad")
  }

  test("oracle SQL avoids non-portable regex escapes") {
    // Java's \s includes vertical tab, RE2/DuckDB's does not (house
    // rule): oracle-paired expressions must use explicit classes
    val bad = SparkEntry.oracleSql.collect {
      case (k, v) if v.contains("\\s") || v.contains("\\S") => k
    }
    assert(bad.isEmpty, s"\\s/\\S in oracle SQL (vertical-tab " +
      s"divergence hazard): $bad")
  }

  test("the non-BMP probe literal survives source encoding intact") {
    // if a build-encoding change mangled the literal, engine and
    // oracle would BOTH use the mangled bytes (the oracle interpolates
    // the same constant) and the probe would silently stop testing
    // surrogate pairs — pin the exact code points
    val got = graft.registry.QueriesLlm.uniProbeText
      .codePoints().toArray.toSeq
    assert(got === Seq(0x6C49, 0x5B57, 0x20, 0x1F44B, 0x20, 0x20000,
      'x'.toInt, 0x20, 'o'.toInt, 'k'.toInt),
      s"probe text code points drifted: $got")
  }

  test("registry halves do not overlap") {
    val a = graft.registry.QueriesSeries.map.keySet
    val b = graft.registry.QueriesLlm.map.keySet
    assert((a & b).isEmpty, s"duplicate registrations: ${a & b}")
  }
}
