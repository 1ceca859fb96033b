package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Wavelet

/** Correctness contract for the wavelet operator (no SQL oracle exists
  * for it, so these properties carry the gate).
  */
class WaveletSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  test("sym4 filter bank is orthonormal (unit energy, orthogonal shifts)") {
    val h = Wavelet.DecLo; val g = Wavelet.DecHi
    def dot(a: Array[Double], b: Array[Double], shift: Int): Double =
      (0 until a.length - shift).map(i => a(i + shift) * b(i)).sum
    assert(math.abs(dot(h, h, 0) - 1.0) < 1e-9)
    assert(math.abs(dot(g, g, 0) - 1.0) < 1e-9)
    assert(math.abs(dot(h, g, 0)) < 1e-9)
    assert(math.abs(dot(h, h, 2)) < 1e-9)
    assert(math.abs(dot(g, g, 2)) < 1e-9)
  }

  test("db1 (Haar) analysis+synthesis match published pywt outputs — pins phase/orientation") {
    val s = 1.0 / math.sqrt(2.0)
    val decLo = Array(s, s)
    val decHi = Array(-s, s) // pywt Wavelet('db1').dec_hi
    val x = Array(1.0, 2.0, 3.0, 4.0)
    val (ca, cd) = Wavelet.dwtWith(x, decLo, decHi)
    // pywt.dwt([1,2,3,4], 'db1', mode='symmetric') — published outputs
    val caExp = Array(2.1213203435596424, 4.949747468305833)
    val cdExp = Array(-0.7071067811865476, -0.7071067811865476)
    assert(ca.length == 2 && cd.length == 2)
    for (i <- 0 until 2) {
      assert(math.abs(ca(i) - caExp(i)) < 1e-12, s"cA($i)=${ca(i)}")
      assert(math.abs(cd(i) - cdExp(i)) < 1e-12, s"cD($i)=${cd(i)}")
    }
    // synthesis bank: rec_lo=[s,s], rec_hi=[s,-s]; idwt(cA,cD) == x
    val back = Wavelet.idwtWith(ca, cd, Array(s, s), Array(s, -s))
    assert(back.length == 4)
    for (i <- 0 until 4) assert(math.abs(back(i) - x(i)) < 1e-12)
    // denoised (cD zeroed) Haar = pairwise means — the canonical example
    val den = Wavelet.idwtWith(ca, null, Array(s, s), Array(s, -s))
    val denExp = Array(1.5, 1.5, 3.5, 3.5)
    for (i <- 0 until 4) assert(math.abs(den(i) - denExp(i)) < 1e-12)
  }

  test("coefficient length law matches pywt: floor((n+L-1)/2)") {
    for (n <- Seq(1, 2, 9, 10, 11, 100, 299, 300)) {
      val (ca, cd) = Wavelet.dwt(Array.tabulate(n)(_.toDouble))
      assert(ca.length == (n + 7) / 2, s"n=$n len=${ca.length}")
      assert(cd.length == ca.length)
    }
  }

  test("one-level perfect reconstruction at 1e-10") {
    for (n <- Seq(16, 49, 57, 86, 100)) {
      val r = rng(n)
      val x = Array.fill(n)(r.nextDouble() * 100 - 50)
      val (ca, cd) = Wavelet.dwt(x)
      val back = Wavelet.idwt(ca, cd, n)
      val maxErr = x.indices.map(i => math.abs(back(i) - x(i))).max
      assert(maxErr < 1e-10, s"n=$n maxErr=$maxErr")
    }
  }

  test("two-level perfect reconstruction at 1e-10") {
    val r = rng(7)
    val x = Array.fill(63)(r.nextDouble() * 10)
    val (ca1, cd1) = Wavelet.dwt(x)
    val (ca2, cd2) = Wavelet.dwt(ca1)
    val rec1 = Wavelet.idwt(ca2, cd2, ca1.length)
    val back = Wavelet.idwt(rec1, cd1, x.length)
    val maxErr = x.indices.map(i => math.abs(back(i) - x(i))).max
    assert(maxErr < 1e-10, s"maxErr=$maxErr")
  }

  test("denoise preserves length and reduces total variation on noise") {
    val r = rng(42)
    val x = Array.tabulate(80)(i => math.sin(i / 5.0) * 10 + r.nextDouble())
    val y = Wavelet.denoise(x)
    assert(y.length == x.length)
    def tv(a: Array[Double]) = (1 until a.length).map(i => math.abs(a(i) - a(i - 1))).sum
    assert(tv(y) < tv(x))
  }

  test("denoise is near-exact on smooth low-order signals") {
    // sym4 has 4 vanishing moments: cubic signals live in the scaling
    // space, so interior samples survive 2-level denoising ~exactly.
    // Edge reflection kinks the polynomial, so the comparison stays away
    // from the boundary by the 2-level synthesis reach (~3·(L−1)·2 ≈ 42).
    val x = Array.tabulate(256)(i => 1e-4 * i * i * i - 0.02 * i * i + 3.0 * i + 7.0)
    val y = Wavelet.denoise(x)
    val interior = 64 until 192
    val maxRel = interior.map(i => math.abs(y(i) - x(i)) / math.max(1.0, math.abs(x(i)))).max
    assert(maxRel < 1e-9, s"maxRel=$maxRel")
  }
}
