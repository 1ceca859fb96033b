package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{DecFrameKernels, FrameKernels, SeriesKernels}
import graft.operators.SeriesKernels.KernelSpec
import graft.sources.Tables

/** Dev utility: per-stage decomposition for the two-movement ring-kernel
  * family (q_w1 SMA, q_g2 fused Bollinger-crossover) — times each
  * cumulative plan prefix (noop batch sink, best-of-3 fresh lineage) so
  * the floor notes in Bench.scala cite numbers that are REPRODUCIBLE,
  * not one-off scratch measurements. Also times the measured-and-
  * rejected alternatives (the windowed-crossover q_g2 shape it replaced)
  * so the same-run comparison behind the r17 fusion stays auditable.
  *
  * Usage: runMain graft.Decomp <sfDir>[@xN]
  */
object Decomp {

  private def bestOf3(df: => DataFrame): Double =
    (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: Decomp <sfDir>[@xN]")
    val spark = GraftSession.get()
    val dir = args.head.split("@x") match {
      case Array(base, mult) if mult.nonEmpty && mult.forall(_.isDigit) =>
        graft.sources.ScaledTables.ensure(spark, base, mult.toInt)
      case _ => args.head
    }

    def scan = Tables.eventsSeries(spark, dir)
    def sorted = scan
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_ns"), col("event_id"))
    def w1Kernel = SeriesKernels.applyKernels(
      scan, Seq("user_id"), Seq("ts_ns", "event_id"),
      Seq(KernelSpec(Seq("value"), Seq("sma"),
        () => new DecFrameKernels.SmaDecKernel(30))))
    def w1Proj = w1Kernel.select(col("event_id"), round(col("sma"), 6).as("sma30"))
    def g2Kernel = SeriesKernels.applyKernels(
      scan, Seq("user_id"), Seq("ts_ns", "event_id"),
      Seq(KernelSpec(Seq("value"), Seq("mid", "bb_up", "bb_lo", "buy_d", "sell_d"),
        () => new DecFrameKernels.BollingerCrossKernel(20, 2.0))))
    def g2Proj = g2Kernel.select(
      col("event_id"),
      (col("buy_d") === 1.0).as("buy"),
      (col("sell_d") === 1.0).as("sell"))
    // the pre-r17 q_g2 shape: separate Bollinger kernel, crossover lags
    // in a post-kernel Window pair (forces a second exchange + sort)
    def g2Windowed = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
      SeriesKernels.applyKernels(
        scan, Seq("user_id"), Seq("ts_ns", "event_id"),
        Seq(KernelSpec(Seq("value"), Seq("mid", "bb_up", "bb_lo"),
          () => new DecFrameKernels.BollingerKernel(20, 2.0))))
        .withColumn("buy", FrameKernels.crossBelow(col("value"), col("bb_lo"), w))
        .withColumn("sell", FrameKernels.crossAbove(col("value"), col("bb_up"), w))
        .select(col("event_id"), col("buy"), col("sell"))
        .orderBy("event_id")
    }

    // warm tables + codegen once
    scan.write.format("noop").mode("overwrite").save()
    g2Proj.orderBy("event_id").write.format("noop").mode("overwrite").save()

    val stages: Seq[(String, () => DataFrame)] = Seq(
      "scan" -> (() => scan),
      "exchange_sort" -> (() => sorted),
      "w1_kernel" -> (() => w1Kernel),
      "w1_project" -> (() => w1Proj),
      "w1_total_order" -> (() => w1Proj.orderBy("event_id")),
      "g2_kernel" -> (() => g2Kernel),
      "g2_project" -> (() => g2Proj),
      "g2_total_order" -> (() => g2Proj.orderBy("event_id")),
      "g2_windowed_cross_REJECTED" -> (() => g2Windowed),
      // measured alternative: materialize the kernel output before the
      // total order so RangePartitioning's bound-sampling pass reads the
      // checkpointed blocks instead of re-executing the kernel stage
      "w1_total_order_ckpt_ALT" -> (() => {
        val ck = w1Proj.localCheckpoint()
        val out = ck.orderBy("event_id")
        out
      }),
      // q_g2 output-sort alternatives (VERDICT r17 next #3): the q_e3
      // one-task precedent — anti-pattern for a FULL-row-count output
      // (q_a2 measured it at ~10% once), measured here with q_g2's own
      // numbers; and the w1-style checkpoint-before-orderBy
      "g2_total_order_1task_ALT" -> (() =>
        g2Proj.repartition(1).sortWithinPartitions("event_id")),
      "g2_total_order_ckpt_ALT" -> (() =>
        g2Proj.localCheckpoint().orderBy("event_id")),
      // E2 exchange-width comparison (VERDICT r17 next #1): the r17
      // wide shape (dedup window FIRST — text+content+title_desc cross
      // the exchange) vs the r18 registered scalar-first shape (all
      // scores/stats computed pre-window — only fixed-width columns
      // cross)
      "e2_wide_exchange_R17" -> (() =>
        graft.queries.PipelineQueries.e2WideExchange(spark, dir)),
      "e2_scalar_first_ALT" -> (() =>
        graft.queries.PipelineQueries.e2ScalarFirst(spark, dir)),
      "e2_strip_first_narrow" -> (() =>
        graft.SparkEntry.freshQueries("q_e2_news_pipeline")(spark, dir)))
    val timed = stages.map { case (n, f) => n -> bestOf3(f()) }
    println(timed.map { case (n, t) => f""""$n":$t%.3f""" }
      .mkString(s"""{"metric":"decomp","dir":"$dir",""", ",", "}"))
    spark.stop()
  }
}
