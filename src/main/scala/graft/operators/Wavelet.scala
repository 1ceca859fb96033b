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
  * This is PyWavelets' EXACT convention (r3 — the round-2 implementation
  * emitted one extra approximation coefficient for even n and used an
  * adjoint rather than the synthesis bank, deviating from the reference
  * near boundaries; ADVICE r2):
  *  - analysis: symmetric half-point extension by L−1 samples, FULL
  *    convolution with dec_lo/dec_hi restricted to its valid region,
  *    downsampled at odd phase — output length ⌊(n+L−1)/2⌋
  *    (`pywt.dwt_coeff_len(n, L, 'symmetric')`);
  *  - synthesis: zero-upsample, full convolution with rec_lo/rec_hi,
  *    crop L−2 from each side — output length 2·nc−L+2 (`pywt.idwt`);
  *  - `waverec` chain: when a reconstructed approximation is one longer
  *    than the next detail vector (odd lengths), its last sample is
  *    dropped before the next synthesis level — then truncate to the
  *    input length, exactly `apply_wavelet_filtering` (filters.py:56-58).
  *
  * The convention is pinned by WaveletSpec without pywt in the loop:
  * the db1 (Haar) golden vectors are published pywt outputs and fix the
  * downsample phase + filter orientation; sym4 perfect reconstruction at
  * 1e-10 and the ⌊(n+L−1)/2⌋ length law fix the rest (no SQL oracle
  * exists for this operator, so the spec carries the correctness
  * contract).
  */
object Wavelet {

  /** sym4 decomposition low-pass filter (PyWavelets `Wavelet('sym4')
    * .dec_lo`, a published constant set). */
  val DecLo: Array[Double] = Array(
    -0.07576571478927333, -0.02963552764599851, 0.49761866763201545,
    0.8037387518059161, 0.29785779560527736, -0.09921954357684722,
    -0.012603967262037833, 0.0322231006040427)

  private val L = DecLo.length
  private val Pad = L - 1

  /** Orthogonal-bank filter relations (pywt conventions):
    * rec_lo = reverse(dec_lo); rec_hi[k] = (−1)^k·rec_lo[L−1−k];
    * dec_hi = reverse(rec_hi). */
  val RecLo: Array[Double] = DecLo.reverse
  val RecHi: Array[Double] = Array.tabulate(L) { k =>
    if (k % 2 == 0) DecLo(k) else -DecLo(k)
  }
  val DecHi: Array[Double] = RecHi.reverse

  /** Symmetric (half-point) extension: …x₂x₁x₀ | x | xₙ₋₁xₙ₋₂… */
  private def symPad(x: Array[Double], pad: Int): Array[Double] = {
    val n = x.length
    val z = new Array[Double](n + 2 * pad)
    var i = 0
    while (i < pad) { z(i) = x(math.min(pad - 1 - i, n - 1)); i += 1 }
    System.arraycopy(x, 0, z, pad, n)
    i = 0
    while (i < pad) { z(pad + n + i) = x(math.max(n - 1 - i, 0)); i += 1 }
    z
  }

  /** One analysis level with explicit filters (spec uses db1/Haar to pin
    * the phase against published pywt outputs): valid-region convolution
    * of the padded signal, downsampled at odd phase —
    * out[i] = Σₖ f[k]·ext[2i+1+(L−1)−k], length ⌊(n+L−1)/2⌋. */
  private[graft] def dwtWith(x: Array[Double], decLo: Array[Double],
      decHi: Array[Double]): (Array[Double], Array[Double]) = {
    val l = decLo.length
    val z = symPad(x, l - 1)
    val outLen = (x.length + l - 1) / 2
    val ca = new Array[Double](outLen)
    val cd = new Array[Double](outLen)
    var i = 0
    while (i < outLen) {
      var a = 0.0; var d = 0.0
      var k = 0
      while (k < l) {
        val v = z(2 * i + l - k)
        a += decLo(k) * v
        d += decHi(k) * v
        k += 1
      }
      ca(i) = a; cd(i) = d
      i += 1
    }
    (ca, cd)
  }

  /** One analysis level: (cA, cD), pywt lengths ⌊(n+L−1)/2⌋. */
  def dwt(x: Array[Double]): (Array[Double], Array[Double]) =
    dwtWith(x, DecLo, DecHi)

  /** pywt `idwt`: zero-upsample, full convolution with the synthesis
    * filters, crop L−2 each side → length 2·nc−L+2. cD null = all-zero
    * (the denoising path). */
  private[graft] def idwtWith(ca: Array[Double], cd: Array[Double],
      recLo: Array[Double], recHi: Array[Double]): Array[Double] = {
    val l = recLo.length
    val nc = ca.length
    val full = new Array[Double](2 * nc + l - 2)
    var i = 0
    while (i < nc) {
      var k = 0
      while (k < l) {
        val j = 2 * i + k
        full(j) += recLo(k) * ca(i)
        if (cd != null) full(j) += recHi(k) * cd(i)
        k += 1
      }
      i += 1
    }
    val outLen = 2 * nc - l + 2
    val out = new Array[Double](outLen)
    System.arraycopy(full, l - 2, out, 0, outLen)
    out
  }

  /** Synthesis of one level, truncated to length n (pywt returns n for
    * even input lengths and n+1 for odd; callers pass the target n). */
  def idwt(ca: Array[Double], cd: Array[Double], n: Int): Array[Double] =
    java.util.Arrays.copyOf(idwtWith(ca, cd, RecLo, RecHi), n)

  /** The reference operator: `wavedec(x, 'sym4', level=levels)` with all
    * detail coefficients zeroed, `waverec`, truncate to input length —
    * bit-for-bit the pywt pipeline of filters.py:38-60. */
  def denoise(x: Array[Double], levels: Int = 2): Array[Double] = {
    var cur = x
    val detailLens = new ArrayBuffer[Int]
    var lvl = 0
    while (lvl < levels) {
      val (ca, cd) = dwt(cur)
      detailLens += cd.length
      cur = ca // details are discarded (zeroed)
      lvl += 1
    }
    var rec = cur
    var back = levels - 1
    while (back >= 0) {
      // pywt waverec: drop the odd-length surplus sample before idwt
      if (rec.length == detailLens(back) + 1)
        rec = java.util.Arrays.copyOf(rec, detailLens(back))
      rec = idwtWith(rec, null, RecLo, RecHi)
      back -= 1
    }
    java.util.Arrays.copyOf(rec, x.length)
  }

  // ------------------------------------------------------------ SQL
  // DuckDB mirror of [[denoise]] (r11, VERDICT r10 next #3). The
  // denoising path zeroes ALL detail coefficients, so the whole
  // transform is the pure low-pass chain dwt→dwt→idwt→idwt — four
  // linear convolutions with deterministic index arithmetic, which IS
  // SQL-expressible per series as DuckDB list lambdas. Fold order
  // matches the Scala loops exactly (list_reduce from a prepended 0.0;
  // analysis k ascending, synthesis k DESCENDING because the Scala
  // accumulation over increasing ca-index i hits a given output slot at
  // decreasing k — adding the parity-masked 0.0 terms in between leaves
  // IEEE sums bit-identical). Validated bit-for-bit (max abs err 0.0)
  // against the Scala kernel across n ∈ {1..1000} incl. odd/even and
  // sub-filter lengths.

  private def dlit(v: Double): String = {
    val s = v.toString
    if (s.contains('e') || s.contains('E')) s else s + "e0"
  }
  private def arrLit(a: Array[Double]): String =
    a.map(dlit).mkString("[", ", ", "]")

  /** 1-based index into the unpadded series for 0-based padded position
    * `j` under symmetric half-point extension with pad = L−1 = 7. */
  private def mirrorIdxSql(j: String, n: String): String =
    s"""(CASE WHEN ($j) < 7 THEN least(6 - ($j), ($n) - 1) + 1
       | WHEN ($j) < 7 + ($n) THEN ($j) - 7 + 1
       | ELSE greatest(2*($n) + 6 - ($j), 0) + 1 END)""".stripMargin
      .replace("\n", " ")

  /** One analysis level (low-pass only): ca[i] = Σₖ dec_lo[k]·ext[2i+8−k],
    * output length ⌊(n+7)/2⌋. */
  private def convDownSql(src: String, n: String): String =
    s"""list_transform(range(0, (($n) + 7) // 2), i ->
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(range(0, 8), k ->
       |      ${arrLit(DecLo)}[k + 1] * ($src)[${mirrorIdxSql("2*i + 8 - k", n)}])),
       |    (a, b) -> a + b))""".stripMargin

  /** One synthesis level with cd = 0: out[t] = Σₖ rec_lo[k]·ca[(t+6−k)/2]
    * over even-parity in-range k, output length 2·nc−6. */
  private def upConvSql(ca: String, nc: String): String =
    s"""list_transform(range(0, 2*($nc) - 6), tt ->
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform([7,6,5,4,3,2,1,0], k ->
       |      CASE WHEN (tt + 6 - k) >= 0 AND (tt + 6 - k) % 2 = 0
       |                AND (tt + 6 - k) // 2 < ($nc)
       |           THEN ${arrLit(RecLo)}[k + 1] * ($ca)[(tt + 6 - k) // 2 + 1]
       |           ELSE CAST(0.0 AS DOUBLE) END)),
       |    (a, b) -> a + b))""".stripMargin

  /** CTE chain mirroring [[denoise]] (levels = 2) per `keyCol` series of
    * `table`, ordered by `orderBy`: final relation `wav(idCol, outCol)`.
    * NULL inputs become NaN exactly like [[applySeriesTransform]]'s
    * buffer (callers map NaN back to NULL in the SELECT). */
  def denoiseSql(table: String, keyCol: String, orderBy: String,
      valueCol: String, idCol: String, outCol: String): String =
    s"""ser AS (
       |  SELECT $keyCol,
       |         list(coalesce($valueCol, 'NaN'::DOUBLE) ORDER BY $orderBy) AS x,
       |         list($idCol ORDER BY $orderBy) AS ids,
       |         count(*) AS n
       |  FROM $table GROUP BY $keyCol
       |), w1 AS (
       |  SELECT $keyCol, ids, n, ${convDownSql("x", "n")} AS ca1,
       |         (n + 7) // 2 AS n1
       |  FROM ser
       |), w2 AS (
       |  SELECT $keyCol, ids, n, n1, ${convDownSql("ca1", "n1")} AS ca2,
       |         (n1 + 7) // 2 AS n2
       |  FROM w1
       |), r1 AS (
       |  -- waverec back=1: the level-2 detail length equals len(ca2), so
       |  -- the odd-length drop can never fire here
       |  SELECT $keyCol, ids, n, n1, ${upConvSql("ca2", "n2")} AS rec1
       |  FROM w2
       |), r1a AS (
       |  -- waverec back=0: drop the surplus sample when the reconstructed
       |  -- approximation is one longer than the level-1 detail vector
       |  SELECT $keyCol, ids, n,
       |         CASE WHEN len(rec1) = n1 + 1 THEN rec1[1:n1] ELSE rec1 END AS rec1
       |  FROM r1
       |), r0 AS (
       |  SELECT $keyCol, ids, (${upConvSql("rec1", "len(rec1)")})[1:n] AS y
       |  FROM r1a
       |), wav AS (
       |  SELECT $keyCol, unnest(ids) AS $idCol, unnest(y) AS $outCol FROM r0
       |)""".stripMargin

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
