package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

import scala.collection.mutable.ArrayBuffer

/** R3 — wavelet denoising (reference filters.py:38-60): PyWavelets
  * `wavedec(x, 'sym4', level=2)`, zero ALL detail coefficients,
  * `waverec`, truncate to the input length. Unlike every other kernel
  * this is a **global whole-series transform** — each output sample
  * depends on the entire series — so the Spark shape is: one shuffle on
  * the series key, each complete series buffered in one task, the
  * O(n·L) filter-bank pass run in-place, rows re-emitted
  * ([[applySeriesTransform]]). SURVEY.md §7.4 documents the scale
  * consequence: series count gives parallelism; one colossal series is
  * inherently a single-task transform (chunking would change results).
  *
  * DWT scheme (PyWavelets conventions, public sym4 filter bank):
  * symmetric half-point padding by L−1 samples, correlation with the
  * analysis filters, downsample by 2; output length ⌊(n+L−1)/2⌋.
  * Reconstruction is the exact adjoint (transposed-matrix) pass followed
  * by cropping the pad region, which reconstructs the interior samples
  * of an orthogonal bank exactly (perfect-reconstruction property is
  * asserted by WaveletSpec at 1e-10 — no SQL oracle exists for this
  * operator, so the spec carries the correctness contract).
  */
object Wavelet {

  /** sym4 decomposition low-pass filter (PyWavelets `Wavelet('sym4')
    * .dec_lo`, a published constant set). */
  val DecLo: Array[Double] = Array(
    -0.07576571478927333, -0.02963552764599851, 0.49761866763201545,
    0.8037387518059161, 0.29785779560527736, -0.09921954357684722,
    -0.012603967262037833, 0.0322231006040427)

  /** Quadrature-mirror high-pass: g[k] = (−1)^k · h[L−1−k]. */
  val DecHi: Array[Double] = Array.tabulate(DecLo.length) { k =>
    val v = DecLo(DecLo.length - 1 - k)
    if (k % 2 == 0) v else -v
  }

  private val L = DecLo.length
  private val Pad = L - 1

  /** Symmetric (half-point) extension: …x₂x₁x₀ | x | xₙ₋₁xₙ₋₂… */
  private def symPad(x: Array[Double]): Array[Double] = {
    val n = x.length
    val z = new Array[Double](n + 2 * Pad)
    var i = 0
    while (i < Pad) { z(i) = x(math.min(Pad - 1 - i, n - 1)); i += 1 }
    System.arraycopy(x, 0, z, Pad, n)
    i = 0
    while (i < Pad) { z(Pad + n + i) = x(math.max(n - 1 - i, 0)); i += 1 }
    z
  }

  /** One analysis level: (cA, cD), each of length ⌊(n+L−2)/2⌋ + 1 —
    * one more than PyWavelets' ⌊(n+L−1)/2⌋ for even n, which is exactly
    * the redundancy needed for the synthesis pass to cover every sample
    * of the crop region (perfect reconstruction; see [[idwt]]). */
  def dwt(x: Array[Double]): (Array[Double], Array[Double]) = {
    val z = symPad(x)
    val outLen = (x.length + L - 2) / 2 + 1
    val ca = new Array[Double](outLen)
    val cd = new Array[Double](outLen)
    var i = 0
    while (i < outLen) {
      var a = 0.0; var d = 0.0
      var k = 0
      while (k < L) {
        val v = z(2 * i + k)
        a += DecLo(k) * v
        d += DecHi(k) * v
        k += 1
      }
      ca(i) = a; cd(i) = d
      i += 1
    }
    (ca, cd)
  }

  /** Synthesis of one level back to length n (cD may be null = all-zero,
    * the denoising path): x̂[m] = Σᵢ h[m−2i]·cA[i] + g[m−2i]·cD[i] in
    * padded coordinates, then crop the pad region. For an orthonormal
    * bank this reconstructs every sample m with a complete contribution
    * range, i.e. m ∈ [L−2, 2·(outLen−1)+1]; the crop window
    * [L−1, L−1+n) sits inside it by construction of [[dwt]]'s outLen —
    * no boundary folding needed.
    */
  def idwt(ca: Array[Double], cd: Array[Double], n: Int): Array[Double] = {
    val zLen = n + 2 * Pad
    val z = new Array[Double](zLen)
    val outLen = ca.length
    var i = 0
    while (i < outLen) {
      var k = 0
      while (k < L) {
        val m = 2 * i + k
        if (m < zLen) {
          z(m) += DecLo(k) * ca(i)
          if (cd != null) z(m) += DecHi(k) * cd(i)
        }
        k += 1
      }
      i += 1
    }
    val out = new Array[Double](n)
    System.arraycopy(z, Pad, out, 0, n)
    out
  }

  /** The reference operator: 2-level sym4 decomposition, details zeroed,
    * reconstruct, truncate to input length. */
  def denoise(x: Array[Double], levels: Int = 2): Array[Double] = {
    var cur = x
    val lengths = new ArrayBuffer[Int]
    var lvl = 0
    while (lvl < levels) {
      lengths += cur.length
      cur = dwt(cur)._1 // details are discarded (zeroed)
      lvl += 1
    }
    var rec = cur
    var back = levels - 1
    while (back >= 0) {
      rec = idwt(rec, null, lengths(back))
      back -= 1
    }
    rec
  }

  /** Runs a whole-series transform per key: buffers each complete series
    * (rows arrive contiguous after repartition+sortWithinPartitions),
    * applies `f` to the input column values, appends the result as
    * `outCol` (NaN ⇒ null). Null inputs forward NaN to `f`.
    */
  def applySeriesTransform(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      inputCol: String,
      outCol: String)(f: Array[Double] => Array[Double]): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(
      inSchema.fields :+ StructField(outCol, DoubleType, nullable = true))
    val keyIdx = keyCols.map(inSchema.fieldIndex).toArray
    val inIdx = inSchema.fieldIndex(inputCol)

    val partitioned = df
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)

    partitioned.mapPartitions { rows =>
      new Iterator[Row] {
        private var pending: Iterator[Row] = Iterator.empty
        private val buf = new ArrayBuffer[Row]()
        private var bufKey: Seq[Any] = null
        private var source = rows

        private def flush(): Iterator[Row] = {
          if (buf.isEmpty) Iterator.empty
          else {
            val xs = buf.map(r =>
              if (r.isNullAt(inIdx)) Double.NaN else r.getDouble(inIdx)).toArray
            val ys = f(xs)
            val out = buf.zipWithIndex.map { case (r, i) =>
              val y: Any =
                if (i < ys.length && !java.lang.Double.isNaN(ys(i))) ys(i) else null
              Row.fromSeq(r.toSeq :+ y)
            }.toIndexedSeq
            buf.clear()
            out.iterator
          }
        }

        override def hasNext: Boolean = {
          while (!pending.hasNext && (source.hasNext || buf.nonEmpty)) {
            if (source.hasNext) {
              val r = source.next()
              val key = keyIdx.map(r.get).toSeq
              if (bufKey == null || key == bufKey) {
                bufKey = key; buf += r
              } else {
                pending = flush()
                bufKey = key; buf += r
              }
            } else {
              pending = flush()
            }
          }
          pending.hasNext
        }

        override def next(): Row = {
          if (!hasNext) throw new NoSuchElementException
          pending.next()
        }
      }
    }(Encoders.row(outSchema))
  }
}
