package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Contract for the bucketed interval join (q_j3's operator): boundary
  * semantics `(lTs - W, lTs]`, cross-bucket matches, left-join nulls, and
  * the no-cross-product plan.
  */
class RangeJoinSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)
  private val W = 100L

  test("boundary and cross-bucket semantics match a driver reference") {
    import spark.implicits._
    val left = Seq(
      (1L, 250L, "a"),   // bucket 2; window (150, 250]
      (1L, 300L, "b"),   // bucket 3; window (200, 300]
      (2L, 120L, "c"))   // no errors for user 2
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, 150L),  // == 250-W: excluded for "a" (strict >)
      (1L, 151L),  // in "a" only
      (1L, 250L),  // == lTs: included for "a"; in (200,300] for "b" too
      (1L, 201L),  // in both "a"(no: 201>150 yes, <=250 yes → in) and "b"
      (1L, 301L))  // after both
      .toDF("k", "t")
    val got = RangeJoin
      .leftPairsInWindow(left, right, "k", "t", "t", W, Seq("t"))
      .groupBy("k", "t", "tag").agg(count(col("win_t")).as("n"))
      .orderBy("k", "t")
      .collect().map(r => (r.getString(2), r.getLong(3)))
    // a: 151, 201, 250 → 3;  b: 201, 250 → 2;  c: 0
    assert(got.toSeq == Seq(("a", 3L), ("b", 2L), ("c", 0L)))
  }

  test("plan has no cartesian or nested-loop join") {
    import spark.implicits._
    val left = (1 to 200).map(i => (i.toLong % 5, i.toLong * 7)).toDF("k", "t")
    val right = (1 to 300).map(i => (i.toLong % 5, i.toLong * 4)).toDF("k", "t")
    val plan = RangeJoin
      .leftPairsInWindow(left, right, "k", "t", "t", 50L, Seq("t"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("random data matches the naive O(n*m) reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = Seq.fill(120)((rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong)).distinct
    val right = Seq.fill(200)((rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong))
    val got = RangeJoin
      .leftPairsInWindow(left.toDF("k", "t"), right.toDF("k", "t"),
        "k", "t", "t", W, Seq("t"))
      .groupBy("k", "t").agg(count(col("win_t")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ref = left.distinct.map { case (k, t) =>
      (k, t) -> right.count(r => r._1 == k && r._2 > t - W && r._2 <= t).toLong
    }.toMap
    assert(got == ref)
  }

  // r16: q_j3 became the FUSED one-source range-frame window count; the
  // general operator stays registered as q_j3b. Pin the two shapes
  // row-identical at dev time (both are DuckDB-oracled at the gate, but
  // this catches a divergence without the oracle in the loop) and pin
  // the fused plan's whole point: no join operator, ONE data exchange.
  private val sf = "/root/testdata/sf0.001"

  test("fused q_j3 equals the general interval join row-for-row") {
    val fused = SparkEntry.queries("q_j3_range_count")(spark, sf)
      .collect().toSeq
    val general = SparkEntry.queries("q_j3b_range_join_general")(spark, sf)
      .collect().toSeq
    assert(fused.nonEmpty && fused == general)
  }

  test("fused q_j3 plan: one hash exchange + window, no join operator") {
    // AQE's toString renders the current plan AND "== Initial Plan =="
    // — count operators in the current section only
    val plan = SparkEntry.queries("q_j3_range_count")(spark, sf)
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Join"), s"fused plan contains a join:\n$plan")
    assert(plan.contains("Window"), s"no Window operator in:\n$plan")
    val nHashExch =
      "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(nHashExch == 1,
      s"expected exactly one data exchange, got $nHashExch:\n$plan")
  }
}
