package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{FirKernels, SeriesTransforms}
import graft.sources.Tables

/** The windowed (declarative, oracled) and series-buffered (fused
  * pipeline) forms of the FIR smoothers must agree bit-exactly — same
  * coefficients, same dot order.
  */
class FirKernelsSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)
  private val sf = "/root/testdata/sf0.001"

  private lazy val both = {
    val windowed = FirKernels.savgol(
      FirKernels.gaussian(
        Tables.events(spark, sf), Seq("user_id"), Seq("ts_ns", "event_id"),
        "value", "gauss_w"),
      Seq("user_id"), Seq("ts_ns", "event_id"), "value", "savgol_w")
    SeriesTransforms.applyAll(
      windowed, Seq("user_id"), Seq("ts_ns", "event_id"),
      Seq(
        SeriesTransforms.gaussianSpec("value", "gauss_s"),
        SeriesTransforms.savgolSpec("value", "savgol_s"))).cache()
  }

  test("gaussian: windowed == series-buffered, bit-exact") {
    assert(both.filter(col("gauss_w") =!= col("gauss_s")).isEmpty)
    assert(both.filter(col("gauss_w").isNull =!= col("gauss_s").isNull).isEmpty)
  }

  test("savgol: windowed == series-buffered, bit-exact") {
    assert(both.filter(col("savgol_w") =!= col("savgol_s")).isEmpty)
    assert(both.filter(col("savgol_w").isNull =!= col("savgol_s").isNull).isEmpty)
  }

  test("gaussian weights are normalized and symmetric") {
    val w = FirKernels.GaussW
    assert(math.abs(w.sum - 1.0) < 1e-12)
    assert(w.indices.forall(i => w(i) == w(w.length - 1 - i)))
  }

  test("savgol projection reproduces degree-4 polynomials exactly") {
    val p = FirKernels.SgP
    // applying row i of P to samples of a quartic must return its value at i
    def quartic(x: Double) = 2.0 + 3.0 * x - 0.5 * x * x + 0.01 * x * x * x + 1e-4 * x * x * x * x
    val xs = (0 until FirKernels.SgWindow).map(i => quartic(i.toDouble))
    for (i <- 0 until FirKernels.SgWindow) {
      val fit = (0 until FirKernels.SgWindow).map(k => p(i)(k) * xs(k)).sum
      assert(math.abs(fit - quartic(i.toDouble)) < 1e-6, s"row $i: $fit vs ${quartic(i.toDouble)}")
    }
  }

  test("gaussianSeries survives series shorter than the kernel radius (iterated reflection)") {
    // single-bounce reflection indexed out of bounds at n <= 13 (ADVICE
    // r2; reachable via E1 on short bar series) — iterated reflection is
    // scipy's actual 'reflect' semantics for any n
    for (n <- Seq(1, 2, 3, 5, 13)) {
      val xs = Array.tabulate(n)(i => 1.0 + i)
      val out = graft.operators.SeriesTransforms.gaussianSeries(xs)
      assert(out.length == n)
      assert(out.forall(v => !v.isNaN && v >= 1.0 - 1e-9 && v <= n + 1e-9),
        s"n=$n out=${out.mkString(",")}")
    }
    // constant series stay exactly constant under any reflection
    val const = graft.operators.SeriesTransforms.gaussianSeries(Array.fill(4)(7.0))
    assert(const.forall(v => math.abs(v - 7.0) < 1e-12))
  }
}
