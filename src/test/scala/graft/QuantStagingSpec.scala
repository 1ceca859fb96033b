package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndex, NswIndex}

/** Optimizer-proof guard for the staged quantization scale (ADVICE r10
  * #4): [[NswIndex.withQuant]] / [[IvfIndex.quantizeCells]] stage the
  * O(dim) absmax `aggregate` as its own bound column so the per-element
  * `transform` lambdas reference an attribute, keeping the quantize
  * pass O(dim) per row. That staging survives only as long as
  * Catalyst's CollapseProject cost heuristic declines to re-inline the
  * aggregate into the lambda bodies — a Spark upgrade changing that
  * heuristic would silently reintroduce the O(dim²) build (282 s vs
  * 5 s at 768 dims × 1e5 rows when it happened in r10) with every
  * functional test still green, because NswQuantSpec pins parity, not
  * cost.
  *
  * The guard is a deterministic PLAN-SHAPE assertion, not a timing
  * test: in the optimized plan the absmax aggregate must appear exactly
  * as often as the staged scale expression references it (twice — the
  * `when` guard and the division). Re-inlining multiplies it into both
  * per-element lambdas, so any count above the staged baseline fails
  * loudly and names the regression.
  */
class QuantStagingSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)

  private def aggCount(plan: String): Int =
    "aggregate\\(".r.findAllIn(plan.toLowerCase).length

  test("NswIndex.withQuant keeps the absmax aggregate staged (O(dim) per row)") {
    val ided = spark.range(64).select(col("id").as("vec_id"),
      array((0 until 8).map(d => (col("id") + d).cast("double")): _*).as("v"))
    val plan = NswIndex.withQuant(ided)
      .queryExecution.optimizedPlan.toString
    val n = aggCount(plan)
    assert(n <= 2,
      s"absmax aggregate appears $n times in the optimized plan — " +
        s"CollapseProject re-inlined the scale into the per-element " +
        s"lambdas (O(dim^2) per row):\n$plan")
  }

  test("IvfIndex.quantizeCells keeps the absmax aggregate staged") {
    val assigned = spark.range(64).select(col("id").as("vec_id"),
      lit("a").as("label"),
      array((0 until 8).map(d => (col("id") + d).cast("double")): _*)
        .as("embedding"),
      (col("id") % 4).cast("int").as("cent_id"))
    val plan = IvfIndex.quantizeCells(assigned)
      .queryExecution.optimizedPlan.toString
    val n = aggCount(plan)
    assert(n <= 2,
      s"absmax aggregate appears $n times in the optimized plan — " +
        s"the quantize scale is no longer staged:\n$plan")
  }
}
