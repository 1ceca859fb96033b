package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DecFrameKernels, FrameKernels, SeriesKernels}
import graft.operators.DecFrameKernels._
import graft.operators.FrameKernels.decSum
import graft.operators.SeriesKernels.KernelSpec

/** The ring-buffer decimal frame kernels must equal the windowed decSum
  * forms BIT-exactly — decimal running sums are exact, so add/evict over
  * a ring reproduces the per-frame re-sum; this spec is what lets
  * q_w1/q_w6/q_g2/q_e3 switch execution paths while keeping their
  * oracles untouched. Includes null rows (NaN slots occupy the frame but
  * skip sum/count) and multi-series resets.
  */
class DecFrameParitySpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)

  /** 2 series × 3000 rows with ~7% nulls sprinkled in. */
  private lazy val df = spark.range(6000)
    .select(
      (col("id") % 2).as("user_id"),
      (col("id") / 2).as("ts"),
      when(col("id") % 13 === 0, lit(null).cast("double"))
        .otherwise(sin(col("id").cast("double") * 0.37) * 1000.0)
        .as("value"))

  private val w = Window.partitionBy("user_id").orderBy("ts")

  private lazy val both = {
    val f30 = w.rowsBetween(-29, 0)
    val f12 = w.rowsBetween(-11, 0)
    val f26 = w.rowsBetween(-25, 0)
    val windowed = df
      .withColumn("rn", row_number().over(w))
      .withColumn("sma_w", FrameKernels.sma(col("value"), 30, w))
      .withColumn("ppo_w", when(col("rn") >= 26,
        (decSum(col("value"), f12) / 12.0 - decSum(col("value"), f26) / 26.0)
          / (decSum(col("value"), f26) / 26.0) * 100.0))
    val (mid, up, lo) = FrameKernels.bollinger(col("value"), col("rn"), 20, 2.0, w)
    val wAll = windowed
      .withColumn("bb_mid_w", mid)
      .withColumn("bb_up_w", up)
      .withColumn("bb_lo_w", lo)
    val arr5 = array_sort(collect_list(col("value")).over(w.rowsBetween(-4, 0)))
    val sz = size(arr5)
    val wMed = wAll.withColumn("med_w",
      when(sz === 0, lit(null).cast("double"))
        .when(sz % 2 === 1, element_at(arr5, ((sz + 1) / 2).cast("int")))
        .otherwise((element_at(arr5, (sz / 2).cast("int"))
          + element_at(arr5, (sz / 2).cast("int") + 1)) / 2.0))
    SeriesKernels.applyKernels(
      wMed, Seq("user_id"), Seq("ts"),
      Seq(
        KernelSpec(Seq("value"), Seq("sma_k"), () => new SmaDecKernel(30)),
        KernelSpec(Seq("value"), Seq("bb_mid_k", "bb_up_k", "bb_lo_k"),
          () => new BollingerKernel(20, 2.0)),
        KernelSpec(Seq("value"), Seq("ppo_k"), () => new PpoLineKernel()),
        KernelSpec(Seq("value"), Seq("med_k"),
          () => new DecFrameKernels.MedianKernel(5))))
      .cache()
  }

  private def assertIdentical(a: String, b: String): Unit = {
    assert(both.filter(col(a) =!= col(b)).isEmpty, s"$a != $b on some rows")
    assert(both.filter(col(a).isNull =!= col(b).isNull).isEmpty,
      s"$a / $b null-mask mismatch")
  }

  test("SMA(30) ring == windowed, bit-exact incl. nulls") {
    assertIdentical("sma_w", "sma_k")
  }

  test("Bollinger(20,2) ring == windowed, bit-exact incl. nulls") {
    assertIdentical("bb_mid_w", "bb_mid_k")
    assertIdentical("bb_up_w", "bb_up_k")
    assertIdentical("bb_lo_w", "bb_lo_k")
  }

  test("PPO line ring == windowed, bit-exact incl. nulls") {
    assertIdentical("ppo_w", "ppo_k")
  }

  test("rolling median(5) ring == windowed collect_list, bit-exact incl. nulls") {
    assertIdentical("med_w", "med_k")
  }

  test("fused Bollinger crossover == windowed crossAbove/crossBelow incl. nulls") {
    // the q_g2 shape: carried prev-row state vs a post-kernel Window pair.
    // NaN comparisons in the kernel must land exactly where the SQL
    // NULL-lag comparisons fall under coalesce(…, false).
    val fused = SeriesKernels.applyKernels(
      df, Seq("user_id"), Seq("ts"),
      Seq(KernelSpec(Seq("value"), Seq("m", "u", "l", "buy_d", "sell_d"),
        () => new BollingerCrossKernel(20, 0.5))))
      .select(col("user_id"), col("ts"),
        (col("buy_d") === 1.0).as("buy_k"),
        (col("sell_d") === 1.0).as("sell_k"))
    // k = 0.5 so the smooth sine actually crosses the bands
    val (_, up, lo) = FrameKernels.bollinger(
      col("value"), row_number().over(w), 20, 0.5, w)
    val windowed = df
      .withColumn("bb_up", up).withColumn("bb_lo", lo)
      .withColumn("buy_w", FrameKernels.crossBelow(col("value"), col("bb_lo"), w))
      .withColumn("sell_w", FrameKernels.crossAbove(col("value"), col("bb_up"), w))
      .select(col("user_id"), col("ts"), col("buy_w"), col("sell_w"))
    val joined = fused.join(windowed, Seq("user_id", "ts"))
    assert(joined.filter(col("buy_k") =!= col("buy_w")
      || col("sell_k") =!= col("sell_w")).isEmpty,
      "fused crossover != windowed crossover on some rows")
    assert(joined.filter(col("buy_k")).count() > 0,
      "degenerate test: no buy signals fired")
  }
}
