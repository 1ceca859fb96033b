package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

/** Contract for the union+window left as-of join (q_j2's operator). */
class AsofJoinSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)

  test("newest prior-or-equal right row per key; nulls before any right row") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "l10"), (1L, 20L, "l20"), (1L, 30L, "l30"),
      (2L, 15L, "l15"), (3L, 99L, "l99"))
      .toDF("k", "t", "lv")
    val right = Seq(
      (1L, 5L, 0.5), (1L, 20L, 2.0), (1L, 25L, 2.5),
      (2L, 16L, 1.6))
      .toDF("k", "t", "rv")
    val got = AsofJoin.leftAsof(left, right, "k", "t", Seq("t", "rv"))
      .orderBy("k", "t")
      .select("k", "t", "lv", "asof_t", "asof_rv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)), Option(r.get(4))))
    assert(got.toSeq == Seq(
      (1L, 10L, "l10", Some(5L), Some(0.5)),   // strictly prior
      (1L, 20L, "l20", Some(20L), Some(2.0)),  // equal ts matches (>= rule)
      (1L, 30L, "l30", Some(25L), Some(2.5)),  // newest of several
      (2L, 15L, "l15", None, None),            // right exists but later
      (3L, 99L, "l99", None, None)))           // key absent from right
  }

  test("plan is one exchange + one sort — no join fan-out") {
    import spark.implicits._
    val left = (1 to 100).map(i => (i.toLong % 7, i.toLong, i.toDouble))
      .toDF("k", "t", "lv").repartition(5)
    val right = (1 to 50).map(i => (i.toLong % 7, i.toLong * 2, i.toDouble))
      .toDF("k", "t", "rv").repartition(3)
    val joined = AsofJoin.leftAsof(left, right, "k", "t", Seq("rv"))
    val plan = joined.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    // row-level sanity vs a driver-side reference
    val ref = left.collect().map { lr =>
      val (k, t) = (lr.getLong(0), lr.getLong(1))
      val best = right.collect()
        .filter(rr => rr.getLong(0) == k && rr.getLong(1) <= t)
        .sortBy(_.getLong(1)).lastOption.map(_.getDouble(2))
      (k, t, best)
    }.sortBy(r => (r._1, r._2))
    val got = joined.orderBy("k", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == ref.toSeq)
  }
}
