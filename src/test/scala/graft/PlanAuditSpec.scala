package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-surface plan audit: every SparkEntry query must resolve and
  * physical-plan against the sf0.001 tables (catches analysis/plan
  * regressions without executing anything), and no plan may contain an
  * unbroadcast CartesianProduct — the one join shape that cannot
  * survive scale. BroadcastNestedLoopJoin is allowed where a query
  * deliberately crossJoins a broadcast one-row/tiny side (corpus stats,
  * query points); a raw cartesian between two big sides is not.
  */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)
  private val sf = "/root/testdata/sf0.001"

  test("all queries plan; no unbroadcast cartesian anywhere") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, sf).queryExecution.executedPlan.toString
          if (plan.contains("CartesianProduct"))
            Some(s"$name: CartesianProduct in plan")
          else None
        } catch {
          case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
