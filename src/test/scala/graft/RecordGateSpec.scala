package graft

import org.scalatest.funsuite.AnyFunSuite

/** The record gate (VERDICT r17 next #2): a scaled-tier row that ships
  * bare — >2x vs DuckDB, not structurally floored, no named or
  * auto-generated floor note, i.e. `"floor_note_missing":true` — must
  * fail a record run instead of shipping silently (the r17 q_e2 row
  * shipped bare despite its stamp). This spec drives
  * `Bench.gateOffenders` with synthetic tier fragments in the exact
  * shape `scaledProofAt` emits and proves: a bare row is an offender, a
  * noted/floored row is not, and SPARK_GRAFT_WAIVE-style waivers are
  * honored.
  */
class RecordGateSpec extends AnyFunSuite {

  // fragments in the exact on-wire shape of the duckdb_scaled blocks
  private val bareRow =
    """"q_zz_bare":{"spark_exec_sec":0.794,"spark_fresh_sec":0.9,""" +
      """"floor_ratio":1.45,"duck_floor_ratio":0.95,""" +
      """"classification":"plan_fat","floor_note_missing":true,""" +
      """"duck_sec":0.344,"ratio":2.31}"""
  private val notedRow =
    """"q_yy_noted":{"spark_exec_sec":0.632,"spark_fresh_sec":0.7,""" +
      """"floor_ratio":1.93,"duck_floor_ratio":1.33,""" +
      """"classification":"attributed",""" +
      """"floor_note":"two irreducible total data movements (see r15)",""" +
      """"duck_sec":0.245,"ratio":2.58}"""
  private val flooredRow =
    """"q_xx_floored":{"spark_exec_sec":0.31,"spark_fresh_sec":0.4,""" +
      """"floor_ratio":0.95,"duck_floor_ratio":4.87,""" +
      """"structurally_floored":true,""" +
      """"classification":"structurally_floored",""" +
      """"duck_sec":0.067,"ratio":4.63}"""
  private def tier(rows: String*): String =
    s""""duckdb_scaled":{"scale_mult":5,"steal_pct":0.03,""" +
      s""""per_query_exec":{${rows.mkString(",")}}}"""

  test("a synthetic bare row fails the gate") {
    val offenders =
      Bench.gateOffenders(Seq(tier(bareRow, notedRow, flooredRow)), Set.empty)
    assert(offenders === Seq("q_zz_bare"))
  }

  test("noted and structurally-floored rows pass") {
    assert(Bench.gateOffenders(Seq(tier(notedRow, flooredRow)), Set.empty).isEmpty)
  }

  test("an explicit waiver clears a bare row") {
    assert(Bench.gateOffenders(
      Seq(tier(bareRow)), Set("q_zz_bare")).isEmpty)
  }

  test("the same bare name across two tiers reports once") {
    val x10 = tier(bareRow).replace("\"duckdb_scaled\":", "\"duckdb_scaled_x10\":")
    assert(Bench.gateOffenders(Seq(tier(bareRow), x10), Set.empty) ===
      Seq("q_zz_bare"))
  }

  test("a preceding noted row does not shadow a later bare row") {
    // regression guard for the regex: the [^{}] body must not let a
    // match start in one row and claim the flag of the next
    val offenders = Bench.gateOffenders(Seq(tier(notedRow, bareRow)), Set.empty)
    assert(offenders === Seq("q_zz_bare"))
  }
}
