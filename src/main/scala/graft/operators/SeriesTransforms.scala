package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

import scala.collection.mutable.ArrayBuffer

/** Whole-series transforms: one shuffle on the series key, each complete
  * series buffered in a task, N transforms applied in a single pass,
  * rows re-emitted with all output columns appended.
  *
  * This is the fused object-land stage of pipelines like E1: interleaving
  * per-row window stages with mapPartitions stages re-shuffles on the
  * same key at every boundary (the serialize/deserialize fence renames
  * attributes, so EnsureRequirements can't prove co-partitioning).
  * Fusing every series-at-a-time computation — recursive state machines,
  * FIR smoothers with edge modes, the global wavelet — into one buffered
  * pass keeps the whole enrichment at exactly one exchange.
  *
  * Memory: one series at a time per task (testdata: ≤ 86 rows; the 299-row
  * incremental window of the reference bounds the streaming case). The
  * single-colossal-series caveat of SURVEY §7.4 applies as ever.
  */
object SeriesTransforms {

  /** One whole-series transform: reads `inputCols` (null ⇒ NaN), emits
    * `outputCols` (NaN ⇒ null), via `f`: per-input arrays → per-output
    * arrays, each of the series length. */
  final case class SeriesTransformSpec(
      inputCols: Seq[String],
      outputCols: Seq[String],
      f: Array[Array[Double]] => Array[Array[Double]])

  /** Wraps a streaming [[SeriesKernels.Kernel]] factory as a whole-series
    * spec (identical arithmetic: the state machine just runs over the
    * buffered series). */
  def fromKernel(spec: SeriesKernels.KernelSpec): SeriesTransformSpec =
    SeriesTransformSpec(spec.inputCols, spec.outputCols, { ins =>
      val k = spec.make()
      k.reset()
      val n = if (ins.isEmpty) 0 else ins(0).length
      val out = Array.fill(k.width)(new Array[Double](n))
      val row = new Array[Double](ins.length)
      var i = 0
      while (i < n) {
        var j = 0
        while (j < ins.length) { row(j) = ins(j)(i); j += 1 }
        val res = k.step(row)
        var w = 0
        while (w < k.width) { out(w)(i) = res(w); w += 1 }
        i += 1
      }
      out
    })

  /** Gaussian reflect-mode FIR over a series (same weights + left-to-right
    * dot order as [[FirKernels.gaussian]]'s windowed form — results are
    * bit-identical on series longer than the radius). Reflection is
    * ITERATED (fold into the 2n period, then mirror), matching scipy's
    * half-sample 'reflect' for series shorter than the support too —
    * the single-bounce form crashed with an index out of bounds at
    * n <= radius (ADVICE r2; reachable via E1 on short bar series). */
  def gaussianSeries(values: Array[Double]): Array[Double] = {
    val w = FirKernels.GaussW
    val r = FirKernels.GaussRadius
    val n = values.length
    val out = new Array[Double](n)
    val period = 2 * n
    var i = 0
    while (i < n) {
      var acc = 0.0
      var j = 0
      while (j < 2 * r + 1) {
        var p = i + j - r
        if (n == 1) p = 0
        else {
          p = ((p % period) + period) % period
          if (p >= n) p = period - 1 - p
        }
        acc += w(j) * values(p)
        j += 1
      }
      out(i) = acc
      i += 1
    }
    out
  }

  /** Savitzky–Golay(21,4) 'interp' over a series (same projection-matrix
    * rows + dot order as [[FirKernels.savgol]]'s windowed form). Series
    * shorter than the window emit NaN. */
  def savgolSeries(values: Array[Double]): Array[Double] = {
    val P = FirKernels.SgP
    val w = FirKernels.SgWindow
    val half = w / 2
    val n = values.length
    val out = new Array[Double](n)
    if (n < w) { java.util.Arrays.fill(out, Double.NaN); return out }
    var i = 0
    while (i < n) {
      val (row, base) =
        if (i < half) (P(i), 0)
        else if (n - 1 - i < half) (P(w - 1 - (n - 1 - i)), n - w)
        else (P(half), i - half)
      var acc = 0.0
      var k = 0
      while (k < w) { acc += row(k) * values(base + k); k += 1 }
      out(i) = acc
      i += 1
    }
    out
  }

  private def lift1(f: Array[Double] => Array[Double])
      : Array[Array[Double]] => Array[Array[Double]] =
    ins => Array(f(ins(0)))

  def gaussianSpec(in: String, out: String): SeriesTransformSpec =
    SeriesTransformSpec(Seq(in), Seq(out), lift1(gaussianSeries))
  def savgolSpec(in: String, out: String): SeriesTransformSpec =
    SeriesTransformSpec(Seq(in), Seq(out), lift1(savgolSeries))
  def waveletSpec(in: String, out: String): SeriesTransformSpec =
    SeriesTransformSpec(Seq(in), Seq(out), lift1(Wavelet.denoise(_)))

  /** Runs all specs over every series in one buffered pass. */
  def applyAll(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      specs: Seq[SeriesTransformSpec]): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(
      inSchema.fields ++ specs.flatMap(_.outputCols)
        .map(c => StructField(c, DoubleType, nullable = true)))
    val keyIdx = keyCols.map(inSchema.fieldIndex).toArray
    val inIdx = specs.map(_.inputCols.map(inSchema.fieldIndex).toArray).toArray

    val partitioned = df
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)

    partitioned.mapPartitions { rows =>
      new Iterator[Row] {
        private var pending: Iterator[Row] = Iterator.empty
        private val buf = new ArrayBuffer[Row]()
        private var bufKey: Seq[Any] = null
        private val source = rows

        private def flush(): Iterator[Row] = {
          if (buf.isEmpty) Iterator.empty
          else {
            val n = buf.length
            val outputs: Seq[Array[Array[Double]]] = specs.indices.map { s =>
              val ins = inIdx(s).map { idx =>
                val a = new Array[Double](n)
                var i = 0
                while (i < n) {
                  a(i) = if (buf(i).isNullAt(idx)) Double.NaN else buf(i).getDouble(idx)
                  i += 1
                }
                a
              }
              specs(s).f(ins)
            }
            val res = (0 until n).map { i =>
              val extras = outputs.flatMap(_.map { arr =>
                val v = arr(i)
                if (java.lang.Double.isNaN(v)) null else (v: Any)
              })
              Row.fromSeq(buf(i).toSeq ++ extras)
            }.toIndexedSeq
            buf.clear()
            res.iterator
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
