package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.RelationalQueries

/** q_j1b's statistics-driven shape switch (r11, lookup form r12): below
  * [[RelationalQueries.StarMapSideMaxOrders]] the star join runs
  * map-side — a session-broadcast LongDomainMap lookup projected onto
  * the fact scan, so the fact table never shuffles and the only
  * exchange is the 5-group aggregate — and above it the r6
  * pre-aggregate + shuffle-join shape takes over. The two shapes must
  * be bit-identical (decimal partial sums re-sum exactly), and the
  * map-side plan must actually be exchange-free on the fact side: a
  * regression that reintroduces a fact-table exchange (e.g. the lookup
  * degrading to a join or a pre-agg creeping back in) fails here, not
  * in a bench artifact three rounds later.
  */
class StarJoinShapeSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)
  private val sf = "/root/testdata/sf0.001"

  test("map-side and pre-agg shapes are row-identical") {
    val a = RelationalQueries.starJoin(spark, sf, mapSide = true).collect()
    val b = RelationalQueries.starJoin(spark, sf, mapSide = false).collect()
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
  }

  test("map-side plan: no exchange partitioned on the fact join key") {
    val df = RelationalQueries.starJoin(spark, sf, mapSide = true)
    df.collect() // let AQE finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // the fact side must reach its region through the broadcast lookup,
    // never through a hashpartitioning exchange on l_orderkey/o_orderkey
    val badExchange = plan.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") &&
        (l.contains("l_orderkey") || l.contains("o_orderkey")))
    assert(!badExchange,
      s"fact-side exchange found in map-side star plan:\n$plan")
    assert(plan.contains("broadcastlookup"),
      s"BroadcastLookup projection missing from map-side star plan:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"fact-table join crept back into map-side star plan:\n$plan")
  }

  test("pre-agg plan keeps the shared l_orderkey exchange") {
    val df = RelationalQueries.starJoin(spark, sf, mapSide = false)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(l_orderkey"), plan)
  }

  test("registered query picks map-side below the threshold") {
    // every testdata SF has orders far below StarMapSideMaxOrders, so
    // the registered q_j1b must carry the map-side shape: no partial
    // aggregate keyed by l_orderkey anywhere in its plan
    val df = SparkEntry.queries("q_j1b_star_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(l_orderkey"), plan)
  }
}
