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

  test("one-source variant: row parity with groupBy+leftAsof, incl. " +
      "max-of-ties via rightTie and null tie values") {
    import spark.implicits._
    // deterministic mixed fixture: dup (key, ts) right rows (tie-break
    // must pick max), a null value inside a tie group (nulls-first sort
    // must not win the tie), keys with no right rows at all.
    val rows = (0 until 400).map { i =>
      val k = (i % 7).toLong
      val t = ((i * 37) % 50).toLong
      val side = if (i % 3 == 0) "L" else "R"
      val v: java.lang.Double =
        if (i % 11 == 0) null else ((i * 13) % 29).toDouble
      (i.toLong, k, t, side, v)
    }.toDF("id", "k", "t", "side", "v")
    val fused = graft.operators.AsofJoin.leftAsofOneSource(
      rows.withColumn("pv", col("v")),
      isLeft = col("side") === "L", key = "k", ts = "t",
      leftCols = Seq("id", "k", "t", "v"),
      payload = Seq("t", "pv"), rightTie = Seq("pv"))
    val leftDf = rows.filter(col("side") === "L")
      .select("id", "k", "t", "v")
    val rightAgg = rows.filter(col("side") === "R")
      .groupBy("k", "t").agg(max(col("v")).as("pv"))
    val twoSource = graft.operators.AsofJoin.leftAsof(
      leftDf, rightAgg, "k", "t", Seq("t", "pv"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toSeq
    assert(canon(fused) == canon(twoSource))
  }

  test("one-source variant: a NULL discriminator classifies as RIGHT " +
      "(ADVICE r14 #2)") {
    import spark.implicits._
    // one left row at t=20; a null-side row at t=10 carrying payload 9.0.
    // If the null row classifies as RIGHT (the documented contract), the
    // left row's as-of match is (10, 9.0); if the null row were dropped
    // or mis-classified as left, the match would be empty.
    val rows = Seq(
      (1L, 5L, Some("L"), 1.0),
      (2L, 10L, None: Option[String], 9.0),
      (3L, 20L, Some("L"), 2.0))
      .toDF("id", "k0", "side", "v")
      .select(lit(1L).as("k"), col("id"), col("k0").as("t"),
        col("side"), col("v"))
    val got = graft.operators.AsofJoin.leftAsofOneSource(
      rows.withColumn("pv", col("v")),
      isLeft = col("side") === "L", key = "k", ts = "t",
      leftCols = Seq("id", "k", "t", "v"),
      payload = Seq("t", "pv"))
      .orderBy("id")
      .select("id", "asof_t", "asof_pv")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(got.toSeq == Seq(
      (1L, None, None),              // before the null-side right row
      (3L, Some(10L), Some(9.0))))   // null side served as RIGHT payload
  }

  test("one-source plan: ONE scan, ONE hash exchange, no join") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_asof_one").toString
    import spark.implicits._
    (1 to 200).map(i => (i.toLong, (i % 5).toLong, (i % 40).toLong,
        if (i % 2 == 0) "L" else "R", i.toDouble))
      .toDF("id", "k", "t", "side", "v")
      .write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    val fused = graft.operators.AsofJoin.leftAsofOneSource(
      src, isLeft = col("side") === "L", key = "k", ts = "t",
      leftCols = Seq("id", "k", "t"), payload = Seq("v"),
      rightTie = Seq("v"))
    val plan = fused.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).length == 1,
      s"expected ONE scan:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"expected ONE hash exchange:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
  }
}
