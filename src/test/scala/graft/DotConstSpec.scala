package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity of the codegen'd graft_dot against the declarative
  * element_at multiply-add chain (same left-to-right fold from 0.0). */
class DotConstSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)

  test("graft_dot equals the declarative chain bit-exactly (64-d)") {
    val dim = 64
    val qv = graft.operators.VectorOps.hyperplanes(1, dim, seed = 99L).head
    val vecs = spark.range(500)
      .select(col("id"),
        array((0 until dim).map(d =>
          sin(col("id").cast("double") * (d + 1) * 1e-3)): _*).as("v"))
    val chain = (0 until dim).map(d =>
      element_at(col("v"), d + 1) * lit(qv(d))).reduce(_ + _)
    val rows = vecs
      .select(
        call_function("graft_dot", col("v"), array(qv.map(lit): _*)).as("fast"),
        chain.as("ref"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_dot handles 768-d without plan-time failure") {
    val dim = 768
    val qv = graft.operators.VectorOps.hyperplanes(1, dim, seed = 13L).head
    val vecs = spark.range(100)
      .select(array((0 until dim).map(d =>
        sin(col("id").cast("double") * (d + 1) * 1e-4)): _*).as("v"))
    val out = vecs
      .select(call_function("graft_dot", col("v"), array(qv.map(lit): _*)).as("s"))
      .collect()
    assert(out.length === 100)
    assert(out.forall(r => !r.isNullAt(0)))
  }

  test("graft_dot rejects a non-foldable query vector") {
    val e = intercept[Exception] {
      spark.range(1)
        .select(array(lit(1.0)).as("v"))
        .select(call_function("graft_dot", col("v"), col("v")))
        .collect()
    }
    assert(e.getMessage.contains("foldable"))
  }
}
