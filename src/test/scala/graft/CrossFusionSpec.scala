package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DecFrameKernels, FrameKernels, SeriesKernels}
import graft.operators.SeriesKernels._

/** The r17 G-family fusion (CrossSignalsKernel / ChainKernel): every
  * signal query's fused one-pass shape must equal the pre-r17 windowed
  * shape (kernel pass + crossAbove/crossBelow Window pair) row-for-row,
  * including NULL-input rows, warmup NaNs, literal thresholds (G1), the
  * adx gate (G5), and the chained PPO→EMA composition (G4/R6). The
  * inner kernels themselves are pinned elsewhere (KernelPropertySpec,
  * DecFrameParitySpec); this spec pins the CROSS algebra and the chain.
  */
class CrossFusionSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)

  /** 2 series × 3000 rows, ~7% nulls; a SLOW oscillation (period ~314
    * rows) gives sustained directional runs, so RSI reaches the 30/70
    * bands, ADX exceeds 25, and the line crossings actually fire. */
  private lazy val df = spark.range(6000)
    .select(
      (col("id") % 2).as("user_id"),
      (col("id") / 2).as("ts"),
      when(col("id") % 13 === 0, lit(null).cast("double"))
        .otherwise(sin(col("id").cast("double") * 0.02) * 40.0 + 50.0)
        .as("value"))

  private val w = Window.partitionBy("user_id").orderBy("ts")

  private def assertSame(
      fused: DataFrame, windowed: DataFrame, fire: String): Unit = {
    val joined = fused.join(windowed, Seq("user_id", "ts"))
    assert(joined.filter(col("buy_k") =!= col("buy_w")
      || col("sell_k") =!= col("sell_w")).isEmpty,
      "fused crossover != windowed crossover on some rows")
    assert(joined.filter(col(fire)).count() > 0,
      s"degenerate test: no $fire signals fired")
  }

  test("G1 shape: threshold crossovers fused == windowed (literal lag semantics)") {
    val fused = SeriesKernels.applyKernels(
      df, Seq("user_id"), Seq("ts"),
      Seq(KernelSpec(Seq("value"), Seq("rsi", "b", "s"),
        () => new CrossSignalsKernel(() => new RsiKernel(), Seq(
          CrossSpec(OutCol(0), Const(30.0), above = true),
          CrossSpec(OutCol(0), Const(70.0), above = false))))))
      .select(col("user_id"), col("ts"),
        (col("b") === 1.0).as("buy_k"), (col("s") === 1.0).as("sell_k"))
    val windowed = SeriesKernels.applyKernels(
      df, Seq("user_id"), Seq("ts"),
      Seq(KernelSpec(Seq("value"), Seq("rsi"), () => new RsiKernel())))
      .withColumn("buy_w", FrameKernels.crossAbove(col("rsi"), lit(30.0), w))
      .withColumn("sell_w", FrameKernels.crossBelow(col("rsi"), lit(70.0), w))
      .select(col("user_id"), col("ts"), col("buy_w"), col("sell_w"))
    assertSame(fused, windowed, "buy_k")
  }

  test("G3 shape: output-pair crossovers fused == windowed") {
    val fused = SeriesKernels.applyKernels(
      df, Seq("user_id"), Seq("ts"),
      Seq(KernelSpec(Seq("value"), Seq("m", "ms", "mh", "b", "s"),
        () => new CrossSignalsKernel(() => new MacdKernel(), Seq(
          CrossSpec(OutCol(0), OutCol(1), above = true),
          CrossSpec(OutCol(0), OutCol(1), above = false))))))
      .select(col("user_id"), col("ts"),
        (col("b") === 1.0).as("buy_k"), (col("s") === 1.0).as("sell_k"))
    val windowed = SeriesKernels.applyKernels(
      df, Seq("user_id"), Seq("ts"),
      Seq(KernelSpec(Seq("value"), Seq("m", "ms", "mh"),
        () => new MacdKernel())))
      .withColumn("buy_w", FrameKernels.crossAbove(col("m"), col("ms"), w))
      .withColumn("sell_w", FrameKernels.crossBelow(col("m"), col("ms"), w))
      .select(col("user_id"), col("ts"), col("buy_w"), col("sell_w"))
    assertSame(fused, windowed, "buy_k")
  }

  test("G4/R6 shape: chained PPO->EMA + crossovers fused == two-pass + windowed") {
    val fused = SeriesKernels.applyKernels(
      df, Seq("user_id"), Seq("ts"),
      Seq(KernelSpec(Seq("value"), Seq("ppo", "pe", "b", "s"),
        () => new CrossSignalsKernel(
          () => new ChainKernel(
            () => new DecFrameKernels.PpoLineKernel(),
            () => new EmaKernel(9), 0),
          Seq(
            CrossSpec(OutCol(0), OutCol(1), above = true),
            CrossSpec(OutCol(0), OutCol(1), above = false))))))
      .select(col("user_id"), col("ts"),
        col("ppo").as("ppo_k"), col("pe").as("pe_k"),
        (col("b") === 1.0).as("buy_k"), (col("s") === 1.0).as("sell_k"))
    val twoPass = SeriesKernels.applyKernels(
      SeriesKernels.applyKernels(
        df, Seq("user_id"), Seq("ts"),
        Seq(KernelSpec(Seq("value"), Seq("ppo"),
          () => new DecFrameKernels.PpoLineKernel()))),
      Seq("user_id"), Seq("ts"),
      Seq(KernelSpec(Seq("ppo"), Seq("pe"), () => new EmaKernel(9))))
      .withColumn("buy_w", FrameKernels.crossAbove(col("ppo"), col("pe"), w))
      .withColumn("sell_w", FrameKernels.crossBelow(col("ppo"), col("pe"), w))
      .select(col("user_id"), col("ts"),
        col("ppo").as("ppo_w"), col("pe").as("pe_w"),
        col("buy_w"), col("sell_w"))
    val joined = fused.join(twoPass, Seq("user_id", "ts"))
    // the chain must be BIT-equal to the two-pass composition
    assert(joined.filter(col("ppo_k") =!= col("ppo_w")
      || (col("ppo_k").isNull =!= col("ppo_w").isNull)
      || col("pe_k") =!= col("pe_w")
      || (col("pe_k").isNull =!= col("pe_w").isNull)).isEmpty,
      "ChainKernel != two-pass PPO/EMA composition")
    assertSame(fused, twoPass, "buy_k")
  }

  test("G5 shape: gated DI crossovers fused == windowed incl. the adx>25 gate") {
    // synthetic OHLC bars with occasional null closes
    val bars = spark.range(4000)
      .select(
        (col("id") % 2).as("user_id"),
        (col("id") / 2).as("ts"),
        (sin(col("id").cast("double") * 0.015) * 20.0 + 100.0).as("mid"))
      .select(
        col("user_id"), col("ts"),
        (col("mid") + 3.0).as("high"), (col("mid") - 3.0).as("low"),
        when(col("ts") % 17 === 0, lit(null).cast("double"))
          .otherwise(col("mid") + 1.0).as("close"))
    val fused = SeriesKernels.applyKernels(
      bars, Seq("user_id"), Seq("ts"),
      Seq(KernelSpec(Seq("high", "low", "close"),
        Seq("pdi", "mdi", "adx", "b", "s"),
        () => new CrossSignalsKernel(() => new AdxKernel(), Seq(
          CrossSpec(OutCol(0), OutCol(1), above = true, gate = Some((2, 25.0))),
          CrossSpec(OutCol(1), OutCol(0), above = true, gate = Some((2, 25.0))))))))
      .select(col("user_id"), col("ts"),
        (col("b") === 1.0).as("buy_k"), (col("s") === 1.0).as("sell_k"))
    val windowed = SeriesKernels.applyKernels(
      bars, Seq("user_id"), Seq("ts"),
      Seq(KernelSpec(Seq("high", "low", "close"),
        Seq("pdi", "mdi", "adx"), () => new AdxKernel())))
      .withColumn("buy_w",
        coalesce(lag(col("pdi"), 1).over(w) < lag(col("mdi"), 1).over(w)
          && col("pdi") > col("mdi") && col("adx") > 25.0, lit(false)))
      .withColumn("sell_w",
        coalesce(lag(col("mdi"), 1).over(w) < lag(col("pdi"), 1).over(w)
          && col("mdi") > col("pdi") && col("adx") > 25.0, lit(false)))
      .select(col("user_id"), col("ts"), col("buy_w"), col("sell_w"))
    val joined = fused.join(windowed, Seq("user_id", "ts"))
    assert(joined.filter(col("buy_k") =!= col("buy_w")
      || col("sell_k") =!= col("sell_w")).isEmpty,
      "fused gated crossover != windowed gated crossover on some rows")
    assert(joined.filter(col("buy_k") || col("sell_k")).count() > 0,
      "degenerate test: no DI signals fired")
  }
}
