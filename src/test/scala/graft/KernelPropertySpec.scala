package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.operators.{SeriesTransforms, Wavelet}
import graft.operators.SeriesKernels._

/** Property-based kernel tests (SURVEY.md §5.3): the pure state machines
  * and series transforms checked over generated series — no Spark
  * session, so hundreds of cases run in milliseconds. Native ScalaCheck
  * Properties (sbt runs the framework directly).
  */
object KernelPropertySpec extends Properties("kernels") {

  private val series: Gen[Array[Double]] =
    for {
      n <- Gen.choose(30, 200)
      xs <- Gen.listOfN(n, Gen.choose(-1e4, 1e4))
    } yield xs.toArray

  private def run1(k: Kernel, xs: Array[Double]): Array[Double] = {
    k.reset()
    xs.map(x => k.step(Array(x))(0))
  }

  /** Runs `k` over multi-arity inputs, snapshotting at `split` and
    * resuming in a FRESH kernel via restore — the Checkpointable
    * contract ChunkedKernels stitches on. Output must bit-match the
    * uninterrupted pass for every kernel in the family. */
  private def splitMatches(mk: () => Checkpointable,
      rows: Array[Array[Double]], split: Int): Boolean = {
    val whole = mk()
    whole.reset()
    val expect = rows.map(r => whole.step(r).toSeq)
    val a = mk()
    a.reset()
    rows.take(split).foreach(a.step)
    val b = mk()
    b.reset()
    b.restore(a.snapshot)
    val resumed = rows.drop(split).map(r => b.step(r).toSeq)
    resumed.zip(expect.drop(split)).forall { case (x, y) =>
      x.zip(y).forall { case (u, v) =>
        java.lang.Double.doubleToLongBits(u) == java.lang.Double.doubleToLongBits(v)
      }
    }
  }

  private val seriesWithSplit: Gen[(Array[Double], Int)] =
    for {
      xs <- series
      cut <- Gen.choose(1, xs.length - 1)
    } yield (xs, cut)

  property("snapshot/restore resumes every 1-input kernel bit-exactly") =
    Prop.forAll(seriesWithSplit) { case (xs, cut) =>
      val rows = xs.map(Array(_))
      splitMatches(() => new SesKernel(0.2), rows, cut) &&
        splitMatches(() => new KalmanKernel(), rows, cut) &&
        splitMatches(() => new RsiKernel(14), rows, cut) &&
        splitMatches(() => new MacdKernel(), rows, cut) &&
        splitMatches(() => new EmaKernel(9), rows, cut)
    }

  property("snapshot/restore resumes ADX (3-input) bit-exactly") =
    Prop.forAll(seriesWithSplit) { case (xs, cut) =>
      val rows = xs.map(c => Array(c + math.abs(c) * 0.01 + 1.0,
        c - math.abs(c) * 0.01 - 1.0, c))
      splitMatches(() => new AdxKernel(14), rows, cut)
    }

  property("kalman bounded by observed range") = Prop.forAll(series) { xs =>
    val out = run1(new KalmanKernel(), xs)
    val (lo, hi) = (xs.min, xs.max)
    out.forall(v => v >= lo - 1e-9 && v <= hi + 1e-9)
  }

  property("ses bounded by observed range") = Prop.forAll(series) { xs =>
    val out = run1(new SesKernel(), xs)
    val (lo, hi) = (xs.min, xs.max)
    out.forall(v => v >= lo - 1e-9 && v <= hi + 1e-9)
  }

  property("rsi in [0,100], exactly 14 warmup NaNs") = Prop.forAll(series) { xs =>
    val out = run1(new RsiKernel(), xs)
    out.take(14).forall(_.isNaN) &&
      out.drop(14).forall(v => v >= 0.0 && v <= 100.0)
  }

  property("macd warms up in exactly 33 rows") = Prop.forAll(series) { xs =>
    val k = new MacdKernel()
    k.reset()
    val out = xs.map(x => k.step(Array(x)))
    out.take(33).forall(_.forall(_.isNaN)) &&
      out.drop(33).forall(r => !r(0).isNaN && !r(1).isNaN)
  }

  property("gaussian bounded by series range") = Prop.forAll(series) { xs =>
    val out = SeriesTransforms.gaussianSeries(xs)
    val (lo, hi) = (xs.min, xs.max)
    out.forall(v => v >= lo - 1e-9 * math.max(1.0, hi.abs) &&
      v <= hi + 1e-9 * math.max(1.0, hi.abs))
  }

  property("gaussian exact on constant series") =
    Prop.forAll(Gen.choose(-1e4, 1e4), Gen.choose(30, 100)) { (c, n) =>
      SeriesTransforms.gaussianSeries(Array.fill(n)(c))
        .forall(v => math.abs(v - c) < 1e-9 * math.max(1.0, math.abs(c)))
    }

  property("savgol reproduces random degree-4 polynomials") =
    Prop.forAll(Gen.listOfN(5, Gen.choose(-10.0, 10.0)), Gen.choose(25, 120)) { (cs, n) =>
      def p(x: Double) = cs.zipWithIndex.map { case (c, k) => c * math.pow(x / 20.0, k) }.sum
      val xs = Array.tabulate(n)(i => p(i.toDouble))
      val out = SeriesTransforms.savgolSeries(xs)
      val scale = math.max(1.0, xs.map(math.abs).max)
      xs.indices.forall(i => math.abs(out(i) - xs(i)) / scale < 1e-8)
    }

  property("wavelet round-trip is perfect reconstruction") = Prop.forAll(series) { xs =>
    val (ca, cd) = Wavelet.dwt(xs)
    val back = Wavelet.idwt(ca, cd, xs.length)
    val scale = math.max(1.0, xs.map(math.abs).max)
    xs.indices.forall(i => math.abs(back(i) - xs(i)) / scale < 1e-10)
  }

  property("minhash of a union is the componentwise min") = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    def sig(hs: Seq[Long]): Seq[Long] =
      graft.functions.MinHashSig(
        Literal(new GenericArrayData(hs.toArray), ArrayType(LongType)))
        .eval(null).asInstanceOf[GenericArrayData].toLongArray().toSeq
    val hashes = Gen.nonEmptyListOf(Gen.choose(0L, 2147483646L))
    Prop.forAll(hashes, hashes) { (a, b) =>
      val su = sig(a ++ b)
      val merged = sig(a).zip(sig(b)).map { case (x, y) => math.min(x, y) }
      su == merged
    }
  }

  property("shingle-hash count and determinism") = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    def hashes(toks: Seq[String], n: Int): Seq[Long] =
      graft.functions.ShingleHash(
        Literal(new GenericArrayData(toks.map(UTF8String.fromString).toArray),
          ArrayType(StringType)), n)
        .eval(null).asInstanceOf[GenericArrayData].toLongArray().toSeq
    val toksGen = Gen.listOf(Gen.alphaLowerStr.suchThat(_.nonEmpty))
    Prop.forAll(toksGen) { toks =>
      val h3 = hashes(toks, 3)
      h3.length == math.max(toks.length - 2, 0) && h3 == hashes(toks, 3)
    }
  }
}
