package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.DecFrameKernels.{BollingerCrossKernel, BollingerKernel, SmaDecKernel}
import graft.operators.FrameKernels._
import graft.operators.SeriesKernels
import graft.operators.SeriesKernels.KernelSpec
import graft.sources.Tables

/** Frame-expressible time-series kernels over the per-user `events.value`
  * series (stand-in for the reference's per-instrument Close series):
  * W1 SMA smoothing, W5 lag/shift, W6 Bollinger Bands, G2 band-crossover
  * signals (SURVEY.md §2.5a/§2.5c).
  *
  * Scale: one hash partition by series key, one sort per partition shared
  * by every window expression (Catalyst collapses same-spec windows into a
  * single WindowExec); memory is O(frame). 150 series here, millions on a
  * real cluster — same plan.
  */
object TimeSeriesFrameQueries extends QueryPack {

  private val seriesW = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))

  private val overOrd = "(PARTITION BY user_id ORDER BY ts, event_id)"
  private val frame29 = "(PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)"
  private val frame19 = "(PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)"

  /** Shared inner SQL: per-series row_number + exact-decimal frame moments
    * for the 20-row Bollinger frame. Mirrors [[FrameKernels.bollinger]]
    * operation-for-operation so the IEEE double arithmetic is identical.
    */
  private val bbInnerSql =
    s"""SELECT event_id, user_id, ts, value,
       |       row_number() OVER $overOrd AS rn,
       |       CAST(sum(CAST(value AS DECIMAL(18,6))) OVER $frame19 AS DOUBLE)
       |         / CAST(count(value) OVER $frame19 AS DOUBLE) AS mean,
       |       CAST(sum(CAST(value * value AS DECIMAL(28,10))) OVER $frame19 AS DOUBLE)
       |         / CAST(count(value) OVER $frame19 AS DOUBLE) AS meansq
       |FROM events""".stripMargin

  override def queries: Seq[QueryDef] = Seq(

    // W1 — SMA(30), min_periods=1 (reference smoothers.py:19-24).
    QueryDef(
      "q_w1_sma",
      // executes as the O(1)-per-row decimal ring kernel — WindowExec
      // re-sums the sliding decimal frame per row (DecFrameKernels
      // scaladoc); bit-identical per DecFrameParitySpec, same oracle
      (s, dir) => SeriesKernels.applyKernels(
        Tables.eventsSeries(s, dir), Seq("user_id"), Seq("ts_ns", "event_id"),
        Seq(KernelSpec(Seq("value"), Seq("sma"), () => new SmaDecKernel(30))))
        .select(col("event_id"), round(col("sma"), 6).as("sma30"))
        .orderBy("event_id"),
      Some(s"""SELECT event_id,
              |       round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER $frame29 AS DOUBLE)
              |             / CAST(count(value) OVER $frame29 AS DOUBLE), 6) AS sma30
              |FROM events ORDER BY event_id""".stripMargin)),

    // W5 — lag/shift(1) + first difference (ta_signals.py crossover input).
    QueryDef(
      "q_w5_lag",
      (s, dir) => Tables.events(s, dir)
        .withColumn("prev_value", lag(col("value"), 1).over(seriesW))
        .withColumn("diff", col("value") - col("prev_value"))
        .select(col("event_id"), col("value"), col("prev_value"), col("diff"))
        .orderBy("event_id"),
      Some(s"""SELECT event_id, value,
              |       lag(value, 1) OVER $overOrd AS prev_value,
              |       value - lag(value, 1) OVER $overOrd AS diff
              |FROM events ORDER BY event_id""".stripMargin)),

    // W7 — ranking-function suite over each series (dense_rank on the
    // value, ntile quartiles, percent_rank, cume_dist): the remaining
    // SQL window shapes a reporting layer leans on. One shuffle on
    // user_id, one in-partition sort — identical plan skeleton to W5.
    QueryDef(
      "q_w7_rank_suite",
      (s, dir) => {
        val byValue = Window.partitionBy(col("user_id"))
          .orderBy(col("value"), col("event_id"))
        Tables.events(s, dir)
          .select(
            col("event_id"), col("user_id"),
            dense_rank().over(byValue).as("val_dense_rank"),
            ntile(4).over(byValue).as("quartile"),
            round(percent_rank().over(byValue), 6).as("pct_rank"),
            round(cume_dist().over(byValue), 6).as("cume"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |       CAST(dense_rank() OVER w AS INT) AS val_dense_rank,
             |       CAST(ntile(4) OVER w AS INT) AS quartile,
             |       round(percent_rank() OVER w, 6) AS pct_rank,
             |       round(cume_dist() OVER w, 6) AS cume
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
             |ORDER BY event_id""".stripMargin)),

    // W6 — Bollinger Bands(20, 2, 2, matype=0): SMA middle ± 2·stddev_pop,
    // first 19 rows of each series null (TA-Lib warmup, ta_signals.py:17-25).
    QueryDef(
      "q_w6_bbands",
      // decimal ring kernel execution (bit-identical, DecFrameParitySpec)
      (s, dir) => SeriesKernels.applyKernels(
        Tables.eventsSeries(s, dir), Seq("user_id"), Seq("ts_ns", "event_id"),
        Seq(KernelSpec(Seq("value"), Seq("mid", "up", "lo"),
          () => new BollingerKernel(20, 2.0))))
        .select(
          col("event_id"),
          round(col("mid"), 6).as("bb_mid"),
          round(col("up"), 6).as("bb_up"),
          round(col("lo"), 6).as("bb_lo"))
        .orderBy("event_id"),
      Some(s"""SELECT event_id,
              |       round(CASE WHEN rn >= 20 THEN mean END, 6) AS bb_mid,
              |       round(CASE WHEN rn >= 20 THEN mean + 2.0 * sqrt(meansq - mean * mean) END, 6) AS bb_up,
              |       round(CASE WHEN rn >= 20 THEN mean - 2.0 * sqrt(meansq - mean * mean) END, 6) AS bb_lo
              |FROM ($bbInnerSql) t ORDER BY event_id""".stripMargin)),

    // G2 — BBANDS crossover signals (ta_signals.py:22-23): buy when the
    // series crosses below the lower band, sell when it crosses above the
    // upper; warmup rows are false (pandas NaN-compare semantics).
    QueryDef(
      "q_g2_bbands_signal",
      // fully fused: bands AND the lag-1 crossover algebra run in ONE
      // sorted mapPartitions pass (BollingerCrossKernel, the E3/X2
      // precedent). The previous shape kept the crossover lags windowed,
      // which forced a second exchange + sort + WindowExec over the
      // kernel's opaque mapPartitions output — a full extra stage cycle
      // that was the whole 2.1-2.3× gap vs DuckDB. NaN carried state
      // compares false in the kernel, matching the oracle's
      // coalesce(…, false); parity pinned in DecFrameParitySpec.
      (s, dir) => SeriesKernels.applyKernels(
        Tables.eventsSeries(s, dir), Seq("user_id"), Seq("ts_ns", "event_id"),
        Seq(KernelSpec(Seq("value"), Seq("mid", "bb_up", "bb_lo", "buy_d", "sell_d"),
          () => new BollingerCrossKernel(20, 2.0))))
        .select(
          col("event_id"),
          (col("buy_d") === 1.0).as("buy"),
          (col("sell_d") === 1.0).as("sell"))
        .orderBy("event_id"),
      Some(s"""SELECT event_id,
              |       coalesce(lag(value, 1) OVER $overOrd > lag(bb_lo, 1) OVER $overOrd
              |                AND value < bb_lo, false) AS buy,
              |       coalesce(lag(value, 1) OVER $overOrd < lag(bb_up, 1) OVER $overOrd
              |                AND value > bb_up, false) AS sell
              |FROM (SELECT event_id, user_id, ts, value,
              |             CASE WHEN rn >= 20 THEN mean + 2.0 * sqrt(meansq - mean * mean) END AS bb_up,
              |             CASE WHEN rn >= 20 THEN mean - 2.0 * sqrt(meansq - mean * mean) END AS bb_lo
              |      FROM ($bbInnerSql) t) b
              |ORDER BY event_id""".stripMargin))
  )
}
