package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.OracleSql

/** Contract of the `AS MATERIALIZED` oracle rewrite ([[OracleSql]]) —
  * the mechanism that keeps the correctness gate's DuckDB side at
  * ~70 s instead of ~15 min (DuckDB re-runs upstream recursions once
  * per recursive step when a CTE is inlined into the step).
  *
  * Two layers: unit pins on the scanner itself (strings, quoted
  * identifiers, comments, WINDOW clauses, stale-name detection), and
  * end-to-end pins that the HEAVY recursive oracles as actually
  * registered in [[SparkEntry.oracleSql]] carry materialized heads —
  * a renamed CTE with an un-updated head list fails materialize's own
  * require at oracle-build time, so these also prove every oracle
  * string still BUILDS. */
class CteHeadsSpec extends AnyFunSuite {

  test("rewrites listed heads only, at identifier boundaries") {
    val sql = "WITH a AS (SELECT 1), ab AS (SELECT 2) SELECT * FROM ab, a"
    val got = OracleSql.materialize(sql, Set("a"))
    assert(got.contains("WITH a AS MATERIALIZED (SELECT 1)"))
    assert(got.contains("ab AS (SELECT 2)"), "must not rewrite 'ab' for 'a'")
  }

  test("lowercase 'as (' heads are harvested and rewritten (ADVICE r14 #3)") {
    val sql = "WITH a as (SELECT 1), b As (SELECT 2) SELECT * FROM a, b"
    val got = OracleSql.materializeAll(sql)
    assert(got.contains("a AS MATERIALIZED (SELECT 1)"))
    assert(got.contains("b AS MATERIALIZED (SELECT 2)"))
  }

  test("materializeAll on head-free SQL fails loudly instead of " +
      "rewriting nothing (ADVICE r14 #3)") {
    intercept[IllegalArgumentException] {
      OracleSql.materializeAll("SELECT 1")
    }
  }

  test("heads inside string literals, quoted identifiers, and comments stay") {
    val sql =
      """WITH x AS (SELECT 'x AS (' AS s, "x" AS q), -- x AS ( in a comment
        |/* x AS ( in a block comment */ y AS (SELECT 1)
        |SELECT * FROM x, y""".stripMargin
    val got = OracleSql.materialize(sql, Set("x", "y"))
    assert(got.contains("WITH x AS MATERIALIZED (SELECT"))
    assert(got.contains("y AS MATERIALIZED (SELECT 1)"))
    assert(got.contains("'x AS ('"), "string literal must be untouched")
    assert(got.contains("-- x AS ( in a comment"), "line comment untouched")
    assert(got.contains("/* x AS ( in a block comment */"), "block comment untouched")
  }

  test("an apostrophe inside a comment does not desync the scanner (ADVICE r13 #2)") {
    val sql =
      """WITH a AS ( -- don't trip the tracker
        |SELECT 1), b AS (SELECT 2) SELECT * FROM a, b""".stripMargin
    val got = OracleSql.materialize(sql, Set("a", "b"))
    assert(got.contains("a AS MATERIALIZED ("))
    assert(got.contains("b AS MATERIALIZED (SELECT 2)"),
      s"scanner desynced after the comment apostrophe:\n$got")
  }

  test("a WINDOW clause's name is rewritten only if listed") {
    val sql = "WITH c AS (SELECT 1) SELECT sum(x) OVER w FROM t " +
      "WINDOW w AS (PARTITION BY k)"
    val got = OracleSql.materialize(sql, Set("c"))
    assert(got.contains("WINDOW w AS (PARTITION BY k)"),
      "unlisted WINDOW name must stay un-rewritten")
    assertThrows[IllegalArgumentException] {
      OracleSql.materializeAll(sql) // blanket rewrite refuses WINDOW SQL
    }
  }

  test("materializeAll ignores heads that exist only inside comments " +
      "or literals (harvest uses the same scanner as apply)") {
    val sql =
      """WITH real AS (SELECT 1) -- legacy: tmp AS (SELECT 2)
        |SELECT 'ghost AS (' FROM real""".stripMargin
    val got = OracleSql.materializeAll(sql) // must not trip the require
    assert(got.contains("real AS MATERIALIZED (SELECT 1)"))
    assert(got.contains("-- legacy: tmp AS (SELECT 2)"))
    assert(got.contains("'ghost AS ('"))
  }

  test("a stale head list fails loudly at rewrite time") {
    val sql = "WITH dxt AS (SELECT 1) SELECT * FROM dxt"
    val e = intercept[IllegalArgumentException] {
      OracleSql.materialize(sql, Set("dxt", "dx")) // 'dx' matches nothing
    }
    assert(e.getMessage.contains("dx"), e.getMessage)
  }

  test("every registered heavy recursive oracle builds and carries " +
      "materialized heads") {
    val oracles = SparkEntry.oracleSql // building this map runs every
    // materialize() call — a stale name list anywhere throws HERE
    val heavy = Seq("q_r7_adx", "q_e1_ohlcv_pipeline", "q_e1b_pipeline_oracle",
      "q_g5_adx_signal", "q_r1_kalman", "q_g3_macd_signal")
    heavy.foreach { name =>
      val sql = oracles.getOrElse(name, fail(s"$name not registered"))
      val n = "AS MATERIALIZED \\(".r.findAllIn(sql).length
      assert(n >= 2,
        s"$name: expected >=2 materialized heads, found $n — the O(L²) " +
          "recursion-inlining cost is back if this regresses")
    }
  }
}
