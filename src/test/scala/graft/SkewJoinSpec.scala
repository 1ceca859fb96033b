package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the engine's skew story end-to-end: a pathologically skewed
  * shuffle join (one key carrying ~98% of the left side) is split by
  * AQE's skew-join optimization into parallel sub-partitions — the
  * mitigation SURVEY §4 names for hot series/buckets at 100 TB — and
  * the result stays exactly correct. Thresholds are lowered to make a
  * unit-test-sized skew visible to the optimizer; production keys into
  * the same code path at default thresholds.
  */
class SkewJoinSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)

  test("AQE splits the hot partition and the join result is exact") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      // left: key 0 hot (200k rows), keys 1..19 cold (100 rows each)
      val left = spark.range(0, 200000).select(lit(0L).as("k"), col("id").as("lv"))
        .unionAll(spark.range(0, 2000)
          .select((col("id") % 19L + 1L).as("k"), col("id").as("lv")))
      val right = spark.range(0, 20).select(col("id").as("k"), (col("id") * 10L).as("rv"))

      // the bare join: nothing above it requires hash distribution, so
      // AQE is free to split the hot partition (a downstream groupBy on
      // the join key would legitimately suppress the split — the
      // re-aggregation is checked separately below)
      val joined = left.join(right, "k")
      val rows = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew-join split must appear in the final plan:\n$plan")

      // exact expectation: every left row matches exactly one right row
      val got = rows.groupBy(_.getLong(0)).map { case (k, rs) =>
        k -> (rs.length.toLong, rs.map(_.getLong(2)).sum)
      }
      val expect = (0L until 20L).map { k =>
        val n = if (k == 0L) 200000L else (0L until 2000L).count(_ % 19 + 1 == k).toLong
        k -> (n, n * k * 10L)
      }.toMap
      assert(got == expect)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
