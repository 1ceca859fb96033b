package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SeriesKernels._

/** Warmup/NaN-count and recursion-semantics checks for the sequential
  * kernels (SURVEY.md §2.5b): each kernel's null warmup must match the
  * reference library's documented lookback exactly (TA-Lib RSI 14,
  * MACD 33, ±DI 14, ADX 27), and the state machines must reset cleanly
  * between series.
  */
class SeriesKernelsSpec extends AnyFunSuite {

  private def series(n: Int): Array[Double] =
    Array.tabulate(n)(i => 100.0 + 10.0 * math.sin(i * 0.7) + (i % 7) * 1.3)

  private def run1(k: Kernel, xs: Array[Double]): Array[Double] = {
    k.reset()
    xs.map(x => k.step(Array(x))(0))
  }

  test("Kalman: defined from the first row, converges toward observations") {
    val xs = series(50)
    val out = run1(new KalmanKernel(), xs)
    assert(out.forall(!_.isNaN))
    assert(out(0) == xs(0)) // first update has zero innovation
    // gain ~= 0.25 at steady state, so filtered stays within the data range
    assert(out.last >= xs.min && out.last <= xs.max)
  }

  test("SES: f0 = x0, then f_t = 0.2*x_{t-1} + 0.8*f_{t-1}") {
    val xs = Array(10.0, 20.0, 30.0)
    val out = run1(new SesKernel(0.2), xs)
    assert(out(0) == 10.0)
    assert(out(1) == 0.2 * 10.0 + 0.8 * 10.0)
    assert(out(2) == 0.2 * 20.0 + 0.8 * out(1))
  }

  test("RSI(14): exactly 14 warmup NaNs, values in [0, 100]") {
    val out = run1(new RsiKernel(), series(60))
    assert(out.take(14).forall(_.isNaN))
    assert(out.drop(14).forall(v => !v.isNaN && v >= 0.0 && v <= 100.0))
  }

  test("RSI: monotonic rise gives 100, monotonic fall gives 0") {
    val up = run1(new RsiKernel(), Array.tabulate(20)(i => i.toDouble))
    assert(up(15) == 100.0)
    val dn = run1(new RsiKernel(), Array.tabulate(20)(i => -i.toDouble))
    assert(dn(15) == 0.0)
  }

  test("MACD(12,26,9): exactly 33 warmup NaNs on all three outputs") {
    val k = new MacdKernel()
    k.reset()
    val outs = series(80).map(x => k.step(Array(x)))
    assert(outs.take(33).forall(_.forall(_.isNaN)))
    assert(outs.drop(33).forall(_.forall(!_.isNaN)))
    // hist = macd - signal
    outs.drop(33).foreach(o => assert(o(2) == o(0) - o(1)))
  }

  test("EMA(9): seeds after 9 valid inputs, skips NaN prefix") {
    val xs = Array.fill(5)(Double.NaN) ++ Array.tabulate(15)(i => 10.0 + i)
    val out = run1(new EmaKernel(9), xs)
    assert(out.take(5 + 8).forall(_.isNaN))
    assert(out(13) == (0 until 9).map(i => 10.0 + i).sum / 9.0)
    assert(out.drop(13).forall(!_.isNaN))
  }

  test("ADX(14): ±DI 14 warmup NaNs, ADX 27; DI in [0, 100]") {
    val k = new AdxKernel()
    k.reset()
    val n = 60
    val outs = Array.tabulate(n) { i =>
      val c = 100.0 + 10.0 * math.sin(i * 0.5)
      k.step(Array(c + 2.0, c - 2.0, c))
    }
    assert(outs.take(14).forall(o => o(0).isNaN && o(1).isNaN))
    assert(outs.drop(14).forall(o => !o(0).isNaN && !o(1).isNaN))
    assert(outs.take(27).forall(o => o(2).isNaN))
    assert(outs.drop(27).forall(o => !o(2).isNaN && o(2) >= 0.0 && o(2) <= 100.0))
    assert(outs.drop(14).forall(o => o(0) >= 0.0 && o(0) <= 100.0))
  }

  test("kernels reset cleanly between series") {
    val k = new RsiKernel()
    val a = run1(k, series(40))
    val b = run1(k, series(40)) // reset inside run1
    assert(a.zip(b).forall { case (x, y) => (x.isNaN && y.isNaN) || x == y })
  }
}
