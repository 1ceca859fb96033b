package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.PipelineQueries

/** E3's warmup-padded read-path prune (VERDICT r11 next #1): the
  * dashboard query must answer its 240-hour window from a `ts_ns`-pruned
  * scan — not by aggregating and kerneling all of history — while
  * staying bit-identical to the full-history plan (the registered
  * oracle is shape-blind full-history SQL, so CORRECTNESS gates this at
  * sf0.01 too; these pins make the contract fail fast and locally).
  *
  * Three pins:
  *  1. parity on the real testdata (dense hourly series — the common
  *     case, one probe round);
  *  2. parity on a deliberately SPARSE series (bars every 3 hours, so
  *     the initial 40-hour pad holds < 20 warmup bars and the bound
  *     must widen) plus a short series that starts inside the window
  *     (warmup can never reach 20 — the bound must fall back to the
  *     series' whole history instead of looping);
  *  3. the pruned plan carries the `ts_ns` lower bound as a parquet
  *     PushedFilter (the row-group pruning that makes this matter at
  *     100 TB), and the full-history bar aggregation is gone.
  */
class E3PruneSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString)

  test("pruned and full-history shapes are row-identical on testdata") {
    val pruned = rows(PipelineQueries.signalOverlay(spark, sf, prune = true))
    val full = rows(PipelineQueries.signalOverlay(spark, sf, prune = false))
    assert(pruned.nonEmpty, "parity test is vacuous: no signal rows")
    assert(pruned == full)
  }

  test("parity holds on sparse and mid-window-start series (bound widens)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_e3_sparse").toString
    val hour = 3600L
    val base = java.time.Instant.parse("2024-03-01T00:00:00Z").getEpochSecond
    // user 1: one bar every 3 hours for 1000 hours — 20 warmup bars span
    // 60 hours, so the initial 40-hour pad under-covers and the adaptive
    // bound must double at least once. value wiggles so signals fire.
    val sparse = (0 until 334).map { i =>
      (1L, base + i * 3 * hour,
        math.sin(i * 0.7) * 10.0 + (if (i % 17 == 0) 25.0 else 0.0))
    }
    // user 2: series STARTS inside the 240 h window — warmup can never
    // reach 20 bars; the bound must settle at (or before) the series
    // start, not loop forever.
    val lastTs = base + 333 * 3 * hour
    val short = (0 until 30).map { i =>
      (2L, lastTs - (30 - i) * hour, math.cos(i * 0.9) * 8.0)
    }
    (sparse ++ short).toDF("user_id", "sec", "value")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"),
        col("value"))
      .write.parquet(s"$dir/events.parquet")
    val pruned = rows(PipelineQueries.signalOverlay(spark, dir, prune = true))
    val full = rows(PipelineQueries.signalOverlay(spark, dir, prune = false))
    assert(full.nonEmpty, "sparse fixture produced no signal rows")
    assert(pruned == full)
  }

  test("registered q_e3 plan: ts_ns bound pushed to the scan, no full scan") {
    val df = SparkEntry.queries("q_e3_signal_overlay")(spark, sf)
    df.collect() // finalize the adaptive plan so the scan nodes print
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(ts"),
      s"no pushed ts_ns lower bound in pruned E3 plan:\n$plan")
    // the full-history witness shape carried the broadcast max-bucket
    // crossJoin; the pruned shape must not
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"full-history crossJoin shape leaked into pruned E3 plan:\n$plan")
    // stage-latency-bound plan: ONE data exchange (the user_id
    // repartition; the bar agg and the fused band+signal kernel reuse
    // it) plus the tiny result-order exchange — and no Window operator
    // (the crossover lags are fused into the kernel pass)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val nExchanges = "Exchange ".r.findAllIn(finalPlan).length
    assert(nExchanges <= 2, s"pruned E3 plan grew exchanges ($nExchanges):\n$plan")
    assert(!"\\bWindow\\b".r.findFirstIn(finalPlan).isDefined,
      s"Window operator crept back into pruned E3 plan:\n$plan")
  }
}
