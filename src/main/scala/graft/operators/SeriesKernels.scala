package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Order-dependent per-series kernels (SURVEY.md §2.5b): each output row
  * depends on the previous *output*, so these cannot be bounded-frame
  * window aggregates. The Spark shape is one sequential pass per series:
  * `repartition(seriesKey)` + `sortWithinPartitions(key, ts)` +
  * `mapPartitions` running tiny O(1)-state machines.
  *
  * Scale: a partition holds many complete series back-to-back (rows of one
  * series are contiguous after the sort); kernels reset on key change, so
  * memory per row is O(1) (Kalman: 2 doubles, MACD: ~6, ADX: ~8 + a
  * 12-slot ring). Parallelism is across series — millions of keys spread
  * over 1000 executors with exactly one shuffle. If the same series key
  * was already hash-partitioned upstream (e.g. a window op), Catalyst's
  * EnsureRequirements elides the extra exchange. The known limit (SURVEY
  * §7.4): a single colossal series is inherently sequential; chunked
  * stitching with carried state would be the escape hatch.
  *
  * Numeric contract: every kernel mirrors the reference arithmetic
  * operation-for-operation (filterpy / TA-Lib / statsmodels formulas,
  * cited per kernel) so the DuckDB recursive-CTE oracles reproduce results
  * bit-exactly; missing inputs are NaN in, NaN out ⇒ null columns.
  */
object SeriesKernels {

  /** One sequential state machine: consumes `arity` doubles per row,
    * emits `width` doubles (NaN ⇒ null in the output column).
    */
  trait Kernel extends Serializable {
    def arity: Int
    def width: Int
    def reset(): Unit
    def step(in: Array[Double]): Array[Double]
  }

  /** A kernel whose complete state exports/restores as a flat double
    * vector — the contract the chunked carried-state stitch needs
    * (SURVEY §7.4, [[ChunkedKernels]]) to split one colossal series
    * across driver-sequenced chunks without changing any output bit. */
  trait Checkpointable extends Kernel {
    def snapshot: Array[Double]
    def restore(s: Array[Double]): Unit
  }

  /** Binds a kernel factory to input/output column names. */
  final case class KernelSpec(
      inputCols: Seq[String],
      outputCols: Seq[String],
      make: () => Kernel)

  /** Runs the given kernels over every series of `df`, appending the
    * kernels' output columns. Rows are hash-partitioned by `keyCols` and
    * sorted by `keyCols ++ orderCols` within partitions; kernels reset at
    * every key-tuple change.
    *
    * `prePartitioned = true` skips the internal repartition: the CALLER
    * guarantees every key-tuple's rows share a partition (e.g. the
    * input was explicitly `repartition(keyCols…)`-ed upstream and only
    * partitioning-preserving operators — per-partition aggregates,
    * projections, filters, AQE coalesce — sit in between). The explicit
    * repartition node is not elided by Catalyst even when the child is
    * already correctly distributed, and for stage-latency-bound plans
    * (E3) that redundant exchange IS the cost. Misuse silently computes
    * wrong kernels (keys split across partitions reset mid-series), so
    * callers must pin parity in a spec, as E3PruneSpec does.
    */
  def applyKernels(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      specs: Seq[KernelSpec],
      prePartitioned: Boolean = false): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(
      inSchema.fields ++ specs.flatMap(_.outputCols)
        .map(c => StructField(c, DoubleType, nullable = true)))
    val keyIdx = keyCols.map(inSchema.fieldIndex).toArray
    val inIdx = specs.map(_.inputCols.map(inSchema.fieldIndex).toArray).toArray

    val partitioned = (if (prePartitioned) df
       else df.repartition(keyCols.map(col): _*))
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)

    partitioned.mapPartitions { rows =>
      runSequential(rows, inSchema.length, keyIdx, inIdx,
        specs.map(_.make()).toArray, outSchema.length)
    }(Encoders.row(outSchema))
  }

  /** The sequential per-partition state machine [[applyKernels]] runs on
    * executors, exposed so the incremental tick's driver-resident regime
    * can run the SAME code over already-collected rows — bit-parity by
    * construction: one implementation, two execution sites. `rows` must
    * be sorted by key ++ order columns (kernels reset on every key-tuple
    * change); output rows append one double per kernel output column
    * (NaN ⇒ null). */
  private[graft] def runSequential(
      rows: Iterator[Row],
      inLen: Int,
      keyIdx: Array[Int],
      inIdx: Array[Array[Int]],
      kernels: Array[Kernel],
      outLen: Int): Iterator[Row] = {
    // per-PARTITION buffers, not per-row (r18): at 20M rows the old
    // per-row Seq key + fresh input arrays + Row.fromSeq copy were the
    // dominant per-row cost of the kernel stage after the exchange —
    // kernels read values out of `in` and never retain the array (the
    // Kernel.step contract), so one buffer per kernel is safe to reuse.
    // Key-change detection compares fields in place; boxed `equals` has
    // the same semantics the old Seq == had. The output Array[Any] stays
    // fresh per row — the row object escapes into the encoder pipeline.
    val nKeys = keyIdx.length
    val lastKey = new Array[Any](nKeys)
    var hasKey = false
    val inBufs = inIdx.map(idx => new Array[Double](idx.length))
    rows.map { row =>
      var changed = !hasKey
      var ki = 0
      while (!changed && ki < nKeys) {
        val v = row.get(keyIdx(ki))
        val prev = lastKey(ki)
        if (if (v == null) prev != null else !v.equals(prev)) changed = true
        ki += 1
      }
      if (changed) {
        var i = 0
        while (i < nKeys) { lastKey(i) = row.get(keyIdx(i)); i += 1 }
        hasKey = true
        var k = 0
        while (k < kernels.length) { kernels(k).reset(); k += 1 }
      }
      val out = new Array[Any](outLen)
      var i = 0
      while (i < inLen) { out(i) = row.get(i); i += 1 }
      var k = 0
      var o = inLen
      while (k < kernels.length) {
        val idx = inIdx(k)
        val in = inBufs(k)
        var j = 0
        while (j < idx.length) {
          in(j) = if (row.isNullAt(idx(j))) Double.NaN else row.getDouble(idx(j))
          j += 1
        }
        val res = kernels(k).step(in)
        var w = 0
        while (w < res.length) {
          out(o) = if (java.lang.Double.isNaN(res(w))) null else res(w)
          o += 1; w += 1
        }
        k += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericRow(out)
    }
  }

  // ------------------------------------------------------------------
  // Kernel implementations
  // ------------------------------------------------------------------

  /** Chains `mk2` onto one output column of `mk1`: each step feeds
    * k1's output `srcIdx` into k2; emits k1's outputs followed by
    * k2's. NaN flows through exactly as the two-pass form: a NaN k1
    * output reaches k2 as NaN input, which (per every kernel's
    * missing-input contract) returns NaN without advancing state —
    * identical to applyKernels mapping a null column back to NaN.
    * Lets the PPO line + its EMA(9) signal (q_r6/q_g4) run as ONE
    * sorted pass with no Window operator at all. */
  final class ChainKernel(mk1: () => Kernel, mk2: () => Kernel, srcIdx: Int)
      extends Kernel {
    private val k1 = mk1()
    private val k2 = mk2()
    val arity: Int = k1.arity
    val width: Int = k1.width + k2.width
    private val feed = new Array[Double](1)
    def reset(): Unit = { k1.reset(); k2.reset() }
    def step(in: Array[Double]): Array[Double] = {
      val o1 = k1.step(in)
      feed(0) = o1(srcIdx)
      val o2 = k2.step(feed)
      val out = new Array[Double](width)
      System.arraycopy(o1, 0, out, 0, o1.length)
      System.arraycopy(o2, 0, out, o1.length, o2.length)
      out
    }
  }

  /** Crossover operand for [[CrossSignalsKernel]]: an inner-kernel
    * output column or a constant threshold. */
  sealed trait CrossOperand extends Serializable
  final case class OutCol(i: Int) extends CrossOperand
  final case class Const(v: Double) extends CrossOperand

  /** One crossover signal: fires 1.0 when `a` crosses ABOVE `b`
    * (`above = true`: prevA < prevB && a > b) or BELOW (`above =
    * false`: prevA > prevB && a < b), optionally gated by
    * `inner output(gateIdx) > gateMin` (the G5 adx > 25 gate). NaN
    * operands/prevs/gates compare false — exactly the windowed
    * `coalesce(lag(a) <> lag(b) && …, false)` algebra
    * ([[FrameKernels.crossAbove]]/[[FrameKernels.crossBelow]]) under
    * SQL NULL semantics. The first row of a series has NaN prevs ⇒
    * false, matching lag(…, 1)'s leading NULL. */
  final case class CrossSpec(
      a: CrossOperand, b: CrossOperand, above: Boolean,
      gate: Option[(Int, Double)] = None)

  /** Appends lag-1 crossover signals to an inner kernel's outputs in
    * the SAME sequential pass (the [[graft.operators.DecFrameKernels.BollingerCrossKernel]]
    * precedent, generalized): emits inner outputs followed by one
    * 1.0/0.0 column per [[CrossSpec]] (never NaN — warmup rows are
    * false, not null). prev operand values update EVERY row, NaN
    * included, mirroring lag over rows whose value is NULL. This is
    * what lets every G-family signal query drop its post-kernel
    * Window pair (a second exchange + sort + WindowExec over the
    * opaque kernel output). */
  final class CrossSignalsKernel(
      mkInner: () => Kernel, crosses: Seq[CrossSpec]) extends Kernel {
    private val inner = mkInner()
    private val specs = crosses.toArray
    val arity: Int = inner.arity
    val width: Int = inner.width + specs.length
    private val prevA = Array.fill(specs.length)(Double.NaN)
    private val prevB = Array.fill(specs.length)(Double.NaN)
    def reset(): Unit = {
      inner.reset()
      java.util.Arrays.fill(prevA, Double.NaN)
      java.util.Arrays.fill(prevB, Double.NaN)
    }
    private def eval(op: CrossOperand, out: Array[Double]): Double = op match {
      case OutCol(i) => out(i)
      case Const(v)  => v
    }
    def step(in: Array[Double]): Array[Double] = {
      val o = inner.step(in)
      val res = new Array[Double](width)
      System.arraycopy(o, 0, res, 0, o.length)
      var c = 0
      while (c < specs.length) {
        val sp = specs(c)
        val a = eval(sp.a, o)
        val b = eval(sp.b, o)
        val crossed =
          if (sp.above) prevA(c) < prevB(c) && a > b
          else prevA(c) > prevB(c) && a < b
        val gated = crossed && sp.gate.forall { case (gi, gv) => o(gi) > gv }
        res(o.length + c) = if (gated) 1.0 else 0.0
        prevA(c) = a
        prevB(c) = b
        c += 1
      }
      res
    }
  }

  /** R1 — 1-state Kalman filter, filterpy semantics (reference
    * filters.py:8-27): x₀ = first observation, P₀ = 1, F = H = 1,
    * R = 1e-3, Q = 1e-4; per row: predict (P += Q), gain K = P/(P+R),
    * x += K·(z−x), Joseph-form covariance P = (1−K)·P·(1−K) + K·R·K.
    * The first observation is itself filtered (reference loops over the
    * full array after seeding x with data[0]).
    */
  final class KalmanKernel(q: Double = 1e-4, r: Double = 1e-3) extends Checkpointable {
    val arity = 1; val width = 1
    private var init = false
    private var x = 0.0
    private var p = 0.0
    def reset(): Unit = { init = false }
    def snapshot: Array[Double] = Array(if (init) 1.0 else 0.0, x, p)
    def restore(s: Array[Double]): Unit = { init = s(0) != 0.0; x = s(1); p = s(2) }
    def step(in: Array[Double]): Array[Double] = {
      val z = in(0)
      if (z.isNaN) return Array(Double.NaN)
      if (!init) { x = z; p = 1.0; init = true }
      p = p + q
      val k = p / (p + r)
      x = x + k * (z - x)
      val ikh = 1.0 - k
      p = ikh * p * ikh + k * r * k
      Array(x)
    }
  }

  /** R2 — simple exponential smoothing fitted values (reference
    * smoothers.py:27-33, statsmodels SimpleExpSmoothing with
    * smoothing_level = α, optimized=False, level seeded at x₀): the fitted
    * value at t is the one-step-ahead forecast
    * f₀ = x₀, fₜ = α·xₜ₋₁ + (1−α)·fₜ₋₁.
    */
  final class SesKernel(alpha: Double = 0.2) extends Checkpointable {
    val arity = 1; val width = 1
    private var init = false
    private var f = 0.0
    private var prevX = 0.0
    def reset(): Unit = { init = false }
    def snapshot: Array[Double] = Array(if (init) 1.0 else 0.0, f, prevX)
    def restore(s: Array[Double]): Unit = { init = s(0) != 0.0; f = s(1); prevX = s(2) }
    def step(in: Array[Double]): Array[Double] = {
      val z = in(0)
      if (z.isNaN) return Array(Double.NaN)
      if (!init) { f = z; init = true }
      else f = alpha * prevX + (1.0 - alpha) * f
      prevX = z
      Array(f)
    }
  }

  /** R4 — Wilder RSI (reference ta_signals.py:6-14, TA-Lib RSI(14)):
    * gains/losses from first differences; seed averages = simple mean of
    * the first `period` gains/losses (available at row period+1); then
    * Wilder recursion avg = (prev·(period−1) + cur)/period;
    * RSI = 100·gain/(gain+loss), 0 when the denominator is 0. First
    * `period` rows are null.
    */
  final class RsiKernel(period: Int = 14) extends Checkpointable {
    val arity = 1; val width = 1
    private var t = 0
    private var prev = 0.0
    private var sumG = 0.0
    private var sumL = 0.0
    private var ag = 0.0
    private var al = 0.0
    def reset(): Unit = { t = 0; sumG = 0.0; sumL = 0.0 }
    def snapshot: Array[Double] = Array(t.toDouble, prev, sumG, sumL, ag, al)
    def restore(s: Array[Double]): Unit = {
      t = s(0).toInt; prev = s(1); sumG = s(2); sumL = s(3); ag = s(4); al = s(5)
    }
    def step(in: Array[Double]): Array[Double] = {
      val z = in(0)
      if (z.isNaN) return Array(Double.NaN)
      t += 1
      if (t == 1) { prev = z; return Array(Double.NaN) }
      val g = math.max(z - prev, 0.0)
      val l = math.max(prev - z, 0.0)
      prev = z
      if (t <= period) { sumG += g; sumL += l; return Array(Double.NaN) }
      if (t == period + 1) {
        ag = (sumG + g) / period.toDouble
        al = (sumL + l) / period.toDouble
      } else {
        ag = (ag * (period - 1).toDouble + g) / period.toDouble
        al = (al * (period - 1).toDouble + l) / period.toDouble
      }
      val denom = ag + al
      Array(if (denom == 0.0) 0.0 else 100.0 * (ag / denom))
    }
  }

  /** R5 — MACD(12,26,9), TA-Lib alignment (reference ta_signals.py:28-37):
    * the slow EMA is SMA-seeded over rows 1..26; the fast EMA is SMA-seeded
    * over rows 15..26 (TA-Lib computes both EMA streams starting at the
    * slow seed point, so the fast seed window is the 12 rows ending there);
    * macd = fast − slow from row 26; the signal line is EMA(9) of macd,
    * SMA-seeded over macd rows 26..34. All three outputs (macd, signal,
    * hist) are null before row 34 (33-row warmup).
    */
  final class MacdKernel(fast: Int = 12, slow: Int = 26, sig: Int = 9) extends Checkpointable {
    val arity = 1; val width = 3
    private val kFast = 2.0 / (fast + 1).toDouble
    private val kSlow = 2.0 / (slow + 1).toDouble
    private val kSig = 2.0 / (sig + 1).toDouble
    private var t = 0
    private val ring = new Array[Double](fast)
    private var sumSlow = 0.0
    private var emaF = 0.0
    private var emaS = 0.0
    private var sumSig = 0.0
    private var signal = 0.0
    def reset(): Unit = { t = 0; sumSlow = 0.0; sumSig = 0.0 }
    def snapshot: Array[Double] =
      Array(t.toDouble, sumSlow, emaF, emaS, sumSig, signal) ++ ring
    def restore(s: Array[Double]): Unit = {
      t = s(0).toInt; sumSlow = s(1); emaF = s(2); emaS = s(3)
      sumSig = s(4); signal = s(5)
      System.arraycopy(s, 6, ring, 0, fast)
    }
    def step(in: Array[Double]): Array[Double] = {
      val z = in(0)
      if (z.isNaN) return Array(Double.NaN, Double.NaN, Double.NaN)
      t += 1
      ring((t - 1) % fast) = z
      if (t < slow) { sumSlow += z; return Array(Double.NaN, Double.NaN, Double.NaN) }
      if (t == slow) {
        emaS = (sumSlow + z) / slow.toDouble
        // fast seed: chronological left-fold over rows slow-fast+1 .. slow
        var s = 0.0
        var i = 0
        while (i < fast) { s = s + ring((t + i) % fast); i += 1 }
        emaF = s / fast.toDouble
      } else {
        emaF = (z - emaF) * kFast + emaF
        emaS = (z - emaS) * kSlow + emaS
      }
      val macd = emaF - emaS
      val warmSig = slow + sig - 1 // 34
      if (t < warmSig) { sumSig += macd; return Array(Double.NaN, Double.NaN, Double.NaN) }
      if (t == warmSig) signal = (sumSig + macd) / sig.toDouble
      else signal = (macd - signal) * kSig + signal
      Array(macd, signal, macd - signal)
    }
  }

  /** Generic SMA-seeded EMA over a possibly-null series (TA-Lib EMA):
    * seeds with the mean of the first `period` non-NaN inputs, then
    * ema = (x − prev)·k + prev with k = 2/(period+1). Used for the PPO
    * signal line (reference ta_signals.py:47: talib.EMA(ppo, 9)).
    */
  final class EmaKernel(period: Int = 9) extends Checkpointable {
    val arity = 1; val width = 1
    private val k = 2.0 / (period + 1).toDouble
    private var n = 0
    private var sum = 0.0
    private var ema = 0.0
    private var seeded = false
    def reset(): Unit = { n = 0; sum = 0.0; seeded = false }
    def snapshot: Array[Double] =
      Array(n.toDouble, sum, ema, if (seeded) 1.0 else 0.0)
    def restore(s: Array[Double]): Unit = {
      n = s(0).toInt; sum = s(1); ema = s(2); seeded = s(3) != 0.0
    }
    def step(in: Array[Double]): Array[Double] = {
      val z = in(0)
      if (z.isNaN) return Array(Double.NaN)
      if (!seeded) {
        n += 1; sum += z
        if (n < period) return Array(Double.NaN)
        ema = sum / period.toDouble
        seeded = true
      } else ema = (z - ema) * k + ema
      Array(ema)
    }
  }

  /** R7 — Wilder ADX / +DI / −DI (reference ta_signals.py:56-69, TA-Lib
    * period 14). Inputs (high, low, close). TR/±DM from row 2; Wilder sums
    * seeded over the first 14 TR/DM values (rows 2..15), then
    * s = s − s/14 + cur; ±DI = 100·(±sm/smTR) from row 15 (0 when smTR=0);
    * DX = 100·|+DI−−DI|/(+DI+−DI) (0 when the sum is 0); ADX seeded at
    * row 28 as the mean of the first 14 DX values, then Wilder recursion
    * (prev·13 + DX)/14. Warmups: ±DI 14 rows, ADX 27 rows.
    */
  final class AdxKernel(period: Int = 14) extends Checkpointable {
    val arity = 3; val width = 3
    private var t = 0
    private var ph = 0.0; private var pl = 0.0; private var pc = 0.0
    private var smTR = 0.0; private var smP = 0.0; private var smM = 0.0
    private var sumDX = 0.0
    private var adx = 0.0
    def reset(): Unit = { t = 0; smTR = 0.0; smP = 0.0; smM = 0.0; sumDX = 0.0 }
    def snapshot: Array[Double] =
      Array(t.toDouble, ph, pl, pc, smTR, smP, smM, sumDX, adx)
    def restore(s: Array[Double]): Unit = {
      t = s(0).toInt; ph = s(1); pl = s(2); pc = s(3)
      smTR = s(4); smP = s(5); smM = s(6); sumDX = s(7); adx = s(8)
    }
    def step(in: Array[Double]): Array[Double] = {
      val h = in(0); val l = in(1); val c = in(2)
      if (h.isNaN || l.isNaN || c.isNaN) return Array(Double.NaN, Double.NaN, Double.NaN)
      t += 1
      if (t == 1) { ph = h; pl = l; pc = c; return Array(Double.NaN, Double.NaN, Double.NaN) }
      val tr = math.max(h - l, math.max(math.abs(h - pc), math.abs(l - pc)))
      val dP = h - ph
      val dM = pl - l
      val pdm = if (dP > dM && dP > 0.0) dP else 0.0
      val mdm = if (dM > dP && dM > 0.0) dM else 0.0
      ph = h; pl = l; pc = c
      if (t <= period) { // rows 2..14: first 13 TR/DM values
        smTR += tr; smP += pdm; smM += mdm
        return Array(Double.NaN, Double.NaN, Double.NaN)
      }
      if (t == period + 1) { // row 15: 14th value completes the Wilder seed
        smTR += tr; smP += pdm; smM += mdm
      } else {
        smTR = smTR - smTR / period.toDouble + tr
        smP = smP - smP / period.toDouble + pdm
        smM = smM - smM / period.toDouble + mdm
      }
      val pdi = if (smTR == 0.0) 0.0 else 100.0 * (smP / smTR)
      val mdi = if (smTR == 0.0) 0.0 else 100.0 * (smM / smTR)
      val dsum = pdi + mdi
      val dx = if (dsum == 0.0) 0.0 else 100.0 * (math.abs(pdi - mdi) / dsum)
      val warmAdx = 2 * period // 28
      if (t < warmAdx) { sumDX += dx; return Array(pdi, mdi, Double.NaN) }
      if (t == warmAdx) adx = (sumDX + dx) / period.toDouble
      else adx = (adx * (period - 1).toDouble + dx) / period.toDouble
      Array(pdi, mdi, adx)
    }
  }
}
