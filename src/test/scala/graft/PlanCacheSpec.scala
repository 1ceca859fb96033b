package graft

import org.scalatest.funsuite.AnyFunSuite

/** PlanCache contract (VERDICT r4 next #9): same (session, sfDir, sql)
  * returns the SAME planned DataFrame handle (planning paid once), and
  * the cached handle answers repeated calls much faster than per-call
  * re-planning. */
class PlanCacheSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)
  private val sf = "/root/testdata/sf0.001"
  private val q =
    """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  test("cache returns the identical DataFrame handle for identical keys") {
    PlanCache.clear()
    val a = PlanCache.sql(spark, q, sf)
    val b = PlanCache.sql(spark, q, sf)
    assert(a eq b, "second call must reuse the cached handle")
    assert(PlanCache.entries == 1)
    val c = PlanCache.sql(spark, q + " ", sf) // different text, new plan
    assert(!(a eq c))
    assert(PlanCache.entries == 2)
    assert(a.collect().nonEmpty)
  }

  test("the query surface itself is plan-cached per (session, sfDir)") {
    val a = SparkEntry.queries("q_p1_projection")(spark, sf)
    val b = SparkEntry.queries("q_p1_projection")(spark, sf)
    assert(a eq b, "repeated surface calls must reuse the built handle")
    val c = SparkEntry.freshQueries("q_p1_projection")(spark, sf)
    assert(!(a eq c), "freshQueries must build a new plan every call")
    assert(SparkEntry.queries("q_p1_projection")(spark, sf + "/").ne(a),
      "a different sfDir key must not share the handle")
  }

  test("switching sfDir re-registers views — A/B/A returns A's data (ADVICE r5)") {
    PlanCache.clear()
    val sfB = "/root/testdata/sf0.01"
    val cnt = "SELECT count(*) AS n FROM lineitem"
    val a1 = PlanCache.sql(spark, cnt, sf).collect().head.getLong(0)
    val b  = PlanCache.sql(spark, cnt, sfB).collect().head.getLong(0)
    assert(b > a1, "sf0.01 must be larger than sf0.001")
    // the poisoning shape: sfDir A was seen before, so a once-per-(session,
    // sfDir) registry would skip re-registration and resolve against B.
    PlanCache.clear() // drop the cached handle but not the session views
    val a2 = PlanCache.sql(spark, cnt, sf).collect().head.getLong(0)
    assert(a2 == a1, s"sfDir A after B returned $a2, expected A's count $a1")
    // and cached handles stay bound to the data they were planned against
    val hA = PlanCache.sql(spark, cnt, sf)
    PlanCache.sql(spark, cnt, sfB) // views now point at B
    assert(hA.collect().head.getLong(0) == a1,
      "a cached handle must keep reading the sfDir it was planned for")
  }

  test("cached per-call latency beats fresh re-planning") {
    PlanCache.clear()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val warmup = PlanCache.sql(spark, q, sf).collect() // plan + codegen once
    assert(warmup.nonEmpty)
    val cached = (1 to 3).map(_ => time(PlanCache.sql(spark, q, sf).collect())).min
    val fresh = (1 to 3).map { i =>
      // distinct text defeats the cache -> full analyze/optimize/codegen
      time(spark.sql(s"$q -- fresh$i").collect())
    }.min
    assert(cached < fresh,
      f"cached $cached%.4fs not faster than fresh-planned $fresh%.4fs")
  }
}
