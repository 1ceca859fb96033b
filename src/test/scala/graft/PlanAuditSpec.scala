package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, GlobalLimit, LocalLimit, LogicalPlan, ResolvedHint, BROADCAST}
import org.scalatest.funsuite.AnyFunSuite

/** Whole-surface plan audit: every SparkEntry query must resolve and
  * physical-plan against the sf0.001 tables (catches analysis/plan
  * regressions without executing anything), and no plan may contain an
  * unbroadcast CartesianProduct — the one join shape that cannot
  * survive scale. BroadcastNestedLoopJoin is allowed where a query
  * deliberately crossJoins a broadcast one-row/tiny side (corpus stats,
  * query points); a raw cartesian between two big sides is not.
  *
  * Second invariant: no query may carry a MANDATORY broadcast hint over
  * an O(corpus) relation. A forced `broadcast(...)` whose subtree scans
  * a fact table un-reduced (no aggregate, no limit, no id-restricted
  * filter) is a guaranteed OOM at 100 TB regardless of what AQE would
  * have chosen — the r4 `broadcast(sigs)` LSH-rejoin hazard class.
  * Hints over aggregates (corpus stats, centroids), limits, local
  * relations, dimension tables, or explicitly id-restricted subsets
  * (eval sets, query points) stay legal: those are small by
  * construction, not by luck.
  */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)
  private val sf = "/root/testdata/sf0.001"

  /** Fact tables whose cardinality scales with the corpus. Dimension
    * tables (region..customer) are broadcast-able by design. */
  private val corpusTables = Seq(
    "documents.parquet", "embeddings.parquet", "events.parquet",
    "lineitem.parquet", "orders.parquet")

  /** Evidence that a broadcast-hinted subtree is small by construction. */
  private def smallByConstruction(p: LogicalPlan): Boolean = {
    val reduced = p.collectFirst {
      case _: Aggregate => (); case _: GlobalLimit => (); case _: LocalLimit => ()
    }.nonEmpty
    if (reduced) return true
    val s = p.toString
    if (!corpusTables.exists(s.contains)) return true // dims / local relations
    // id-restricted subset: a Filter comparing an id/key column to a literal
    p.collectFirst {
      case f: Filter
        if f.condition.references.exists(a =>
             a.name.endsWith("_id") || a.name.endsWith("key")) &&
           f.condition.toString.matches("""(?s).*[<>=]=? -?\d+(\.\d+)?\).*""") => ()
    }.nonEmpty
  }

  test("all queries plan; no unbroadcast cartesian anywhere") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val df = fn(spark, sf)
          val plan = df.queryExecution.executedPlan.toString
          if (plan.contains("CartesianProduct"))
            Some(s"$name: CartesianProduct in plan")
          else None
        } catch {
          case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("no mandatory broadcast of an O(corpus) relation") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val analyzed = fn(spark, sf).queryExecution.analyzed
          analyzed.collect {
            case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) &&
                !smallByConstruction(h.child) =>
              s"$name: forced broadcast of un-reduced corpus-scale subtree:\n" +
                h.child.toString.linesIterator.take(6).mkString("\n")
          }
        } catch {
          case e: Throwable => Seq(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
