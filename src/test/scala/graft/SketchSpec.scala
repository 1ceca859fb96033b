package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mergeable-sketch layer for 100 TB aggregations: HLL++ cardinality
  * (`approx_count_distinct`) and quantile sketch (`percentile_approx`)
  * are partial-aggregating (map-side sketches merge at the reducer — no
  * row shuffle), which is why they replace exact distinct/percentile at
  * scale. Approximations cannot hash-match a DuckDB oracle, so this spec
  * pins their error against the exact answers on the events table, and
  * pins partitioning-independence (the merge path) where the sketch
  * guarantees determinism.
  */
class SketchSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)
  private val sf = "/root/testdata/sf0.01"

  private def ev = graft.sources.Tables.events(spark, sf)

  test("HLL++ distinct users per event_type within 5% of exact") {
    val joined = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (e, a) = (r.getLong(1), r.getLong(2))
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("HLL++ result is partitioning-independent (sketches merge)") {
    def run(parts: Int): Map[String, Long] = ev.repartition(parts)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run(2) == run(17), "HLL merge must not depend on partitioning")
  }

  test("percentile_approx within 2% relative value error of exact percentile") {
    val r = ev.agg(
      percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50a"),
      expr("percentile(value, 0.5)").as("p50e"),
      percentile_approx(col("value"), lit(0.99), lit(10000)).as("p99a"),
      expr("percentile(value, 0.99)").as("p99e"))
      .collect()(0)
    val (p50a, p50e) = (r.getDouble(0), r.getDouble(1))
    val (p99a, p99e) = (r.getDouble(2), r.getDouble(3))
    assert(math.abs(p50a - p50e) / math.abs(p50e) <= 0.02, s"$p50a vs $p50e")
    assert(math.abs(p99a - p99e) / math.abs(p99e) <= 0.02, s"$p99a vs $p99e")
  }
}
