package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ChunkedKernels, SeriesKernels}
import graft.operators.SeriesKernels.{AdxKernel, EmaKernel, KalmanKernel,
  Kernel, KernelSpec, MacdKernel, RsiKernel, SesKernel}

/** SURVEY §7.4 escape hatch: a series processed in driver-sequenced
  * chunks with carried kernel state must equal the unchunked sequential
  * pass BIT-FOR-BIT (restoring the snapshot replays the identical
  * floating-point sequence).
  */
class ChunkedKernelsSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)

  test("chunked SES + Kalman equal the unchunked pass bit-for-bit") {
    val n = 5000
    val df = spark.range(2L * n)
      .select(
        (col("id") % 2).as("user_id"),
        (col("id") / 2).as("ts"),
        (sin(col("id").cast("double") * 0.01) * 50.0).as("value"))
    val specs = Seq(
      KernelSpec(Seq("value"), Seq("ses"), () => new SesKernel(0.2)),
      KernelSpec(Seq("value"), Seq("kalman"), () => new KalmanKernel()))
    val whole = SeriesKernels.applyKernels(df, Seq("user_id"), Seq("ts"), specs)

    // uneven chunk bounds, including a single-row chunk (2500..2501)
    val bounds = Seq(0, 700, 1100, 2500, 2501, 4000, 4999, n)
    val chunks = bounds.sliding(2).collect { case Seq(a, b) =>
      df.filter(col("ts") >= a && col("ts") < b)
    }.toSeq
    val stitched = ChunkedKernels
      .applyChunked(chunks, Seq("user_id"), Seq("ts"), specs)
      .reduce(_ unionByName _)

    assert(stitched.count() == whole.count())
    val joined = whole.as("w").join(stitched.as("s"),
      col("w.user_id") === col("s.user_id") && col("w.ts") === col("s.ts"))
    val bad = joined.filter(
      (col("w.ses") =!= col("s.ses")) || (col("w.kalman") =!= col("s.kalman")))
    assert(bad.isEmpty, s"${bad.count()} rows differ from the unchunked pass")
  }

  test("every §2.5b recursive kernel stitches bit-for-bit across chunks") {
    val n = 3000
    val df = spark.range(2L * n)
      .select(
        (col("id") % 2).as("user_id"),
        (col("id") / 2).as("ts"),
        (sin(col("id").cast("double") * 0.013) * 40.0 + 100.0).as("close"))
      .withColumn("high", col("close") + abs(sin(col("ts") * 0.7)) * 2.0)
      .withColumn("low", col("close") - abs(cos(col("ts") * 0.9)) * 2.0)
    val specs = Seq(
      KernelSpec(Seq("close"), Seq("rsi"), () => new RsiKernel(14)),
      KernelSpec(Seq("close"), Seq("macd", "macd_sig", "macd_hist"),
        () => new MacdKernel()),
      KernelSpec(Seq("close"), Seq("ema9"), () => new EmaKernel(9)),
      KernelSpec(Seq("high", "low", "close"), Seq("pdi", "mdi", "adx"),
        () => new AdxKernel(14)))
    val outCols = specs.flatMap(_.outputCols)
    val whole = SeriesKernels.applyKernels(df, Seq("user_id"), Seq("ts"), specs)
    // chunk boundaries inside every warmup region (RSI 14, MACD 33, ADX 27)
    val bounds = Seq(0, 7, 20, 30, 100, 1777, 2999, n)
    val chunks = bounds.sliding(2).collect { case Seq(a, b) =>
      df.filter(col("ts") >= a && col("ts") < b)
    }.toSeq
    val stitched = ChunkedKernels
      .applyChunked(chunks, Seq("user_id"), Seq("ts"), specs)
      .reduce(_ unionByName _)
    assert(stitched.count() == whole.count())
    val joined = whole.as("w").join(stitched.as("s"),
      col("w.user_id") === col("s.user_id") && col("w.ts") === col("s.ts"))
    val anyDiff = outCols
      .map(c => col(s"w.$c") =!= col(s"s.$c") ||
        (col(s"w.$c").isNull =!= col(s"s.$c").isNull))
      .reduce(_ || _)
    val bad = joined.filter(anyDiff)
    assert(bad.isEmpty, s"${bad.count()} rows differ from the unchunked pass")
  }

  test("the stitch path never lands carried state on the driver") {
    // source-level guard (the PlanAuditSpec precedent): the operator's
    // stitch must not collect — carried state flows executor-side as a
    // keyed tails DataFrame joined into the next chunk
    val src = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "src/main/scala/graft/operators/ChunkedKernels.scala")), "UTF-8")
    assert(!src.contains(".collect()"),
      "ChunkedKernels must not collect carried state to the driver")

    // plan-level witness: chunk j>0 receives its seed through a Join —
    // state reaches the kernels via the plan, not a driver-side Map
    import spark.implicits._
    val specs = Seq(KernelSpec(Seq("value"), Seq("ses"), () => new SesKernel(0.2)))
    val dfs = Seq(
      Seq((0L, 0L, 10.0), (0L, 1L, 12.0)),
      Seq((0L, 2L, 14.0), (0L, 3L, 11.0)))
      .map(_.toDF("user_id", "ts", "value"))
    val out = ChunkedKernels.applyChunked(dfs, Seq("user_id"), Seq("ts"), specs)
    val secondPlan = out(1).queryExecution.analyzed.toString
    assert(secondPlan.contains("Join"),
      s"chunk 2 should seed its kernels via a Join on the tails DataFrame:\n$secondPlan")
  }

  test("non-checkpointable kernels are rejected up front, naming the offender") {
    val stateless = new Kernel {
      val arity = 1; val width = 1
      def reset(): Unit = ()
      def step(in: Array[Double]): Array[Double] = in
    }
    import spark.implicits._
    val chunk = Seq((0L, 0L, 1.0)).toDF("user_id", "ts", "value")
    val e = intercept[IllegalArgumentException] {
      ChunkedKernels.applyChunked(Seq(chunk), Seq("user_id"), Seq("ts"),
        Seq(KernelSpec(Seq("value"), Seq("identity_out"), () => stateless)))
    }
    assert(e.getMessage.contains("identity_out"))
  }

  test("a series absent from intermediate chunks resumes from its carried state") {
    val mk = () => new SesKernel(0.2)
    val specs = Seq(KernelSpec(Seq("value"), Seq("ses"), mk))
    import spark.implicits._
    // user 0 present in chunks 1 and 3 only; user 1 in all three
    val rows = Seq(
      (0L, 0L, 10.0), (0L, 1L, 12.0), (1L, 0L, 5.0), // chunk 1
      (1L, 1L, 6.0), (1L, 2L, 7.0),                  // chunk 2
      (0L, 2L, 14.0), (1L, 3L, 8.0))                 // chunk 3
    val dfs = Seq(rows.take(3), rows.slice(3, 5), rows.drop(5))
      .map(_.toDF("user_id", "ts", "value"))
    val whole = SeriesKernels.applyKernels(
      rows.toDF("user_id", "ts", "value"), Seq("user_id"), Seq("ts"), specs)
    val stitched = ChunkedKernels
      .applyChunked(dfs, Seq("user_id"), Seq("ts"), specs)
      .reduce(_ unionByName _)
    val joined = whole.as("w").join(stitched.as("s"),
      col("w.user_id") === col("s.user_id") && col("w.ts") === col("s.ts"))
    assert(joined.count() == 7)
    assert(joined.filter(col("w.ses") =!= col("s.ses")).isEmpty)
  }
}
