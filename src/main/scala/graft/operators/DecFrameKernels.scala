package graft.operators

import java.math.{BigDecimal => JBig, RoundingMode}

import SeriesKernels.Kernel

/** O(1)-per-row ring-buffer forms of the decimal-exact frame kernels
  * (W1 SMA, W6 Bollinger — reference smoothers.py:19-24,
  * ta_signals.py:17-25).
  *
  * Why they exist: the declarative forms in [[FrameKernels]] aggregate
  * DECIMAL casts over a sliding ROWS frame, and Spark's WindowExec
  * re-evaluates a sliding frame's aggregate from scratch for every row
  * (O(frame) decimal updates per row, interpreted — measured ~10-30×
  * DuckDB warm at sf0.1). Decimal addition is EXACT, hence
  * order-independent, so a running sum maintained by add-on-enter /
  * subtract-on-evict over a ring buffer produces the IDENTICAL decimal
  * value as re-summing the frame — and therefore bit-identical doubles
  * after the deterministic casts. DecFrameParitySpec asserts the
  * equivalence against the windowed forms row-for-row; the DuckDB
  * oracles of q_w1/q_w6/q_g2/q_e3 hold unchanged.
  *
  * Cast parity: Spark's double→DECIMAL(p,s) cast goes through the
  * canonical Double.toString representation then HALF_UP to scale s —
  * mirrored here with BigDecimal.valueOf(d).setScale(s, HALF_UP).
  * Null inputs arrive as NaN (the applyKernels contract): a NaN row
  * still occupies a frame slot (ROWS frames count rows, not values) but
  * contributes to neither sum nor count, exactly like SQL aggregate
  * null-skipping.
  *
  * These kernels run inside the same fused series pass as the recursive
  * family ([[SeriesTransforms.applyAll]]): one exchange on the series
  * key, then every kernel streams each series once. They are NOT
  * Checkpointable: a scale-10 running sum's unscaled value can exceed
  * the exact double range the snapshot format carries, and frame
  * kernels chunk safely by overlap-recompute anyway (warmup = n rows),
  * unlike the recursive family.
  */
object DecFrameKernels {

  private def dec6(d: Double): JBig =
    JBig.valueOf(d).setScale(6, RoundingMode.HALF_UP)

  private def dec10(d: Double): JBig =
    JBig.valueOf(d).setScale(10, RoundingMode.HALF_UP)

  /** W1 — SMA(n) with min_periods=1: mean of the non-null values in the
    * trailing n-row frame, from the first row. Bit-identical to
    * `FrameKernels.sma` (decSum / count, both cast to double). */
  final class SmaDecKernel(n: Int) extends Kernel {
    val arity = 1; val width = 1
    private val ring = new Array[JBig](n)
    private var t = 0L
    private var cnt = 0
    private var sum = JBig.ZERO
    def reset(): Unit = {
      t = 0L; cnt = 0; sum = JBig.ZERO
      java.util.Arrays.fill(ring.asInstanceOf[Array[AnyRef]], null)
    }
    def step(in: Array[Double]): Array[Double] = {
      val z = in(0)
      val slot = (t % n).toInt
      t += 1
      if (t > n && ring(slot) != null) { sum = sum.subtract(ring(slot)); cnt -= 1 }
      if (java.lang.Double.isNaN(z)) ring(slot) = null
      else {
        val d = dec6(z)
        ring(slot) = d
        sum = sum.add(d)
        cnt += 1
      }
      Array(if (cnt == 0) Double.NaN else sum.doubleValue() / cnt.toDouble)
    }
  }

  /** W6 — Bollinger(n, k): SMA middle ± k·population-stddev over the
    * trailing n-row frame, null for the first n−1 rows of each series
    * (TA-Lib warmup). Variance = E[x²]−E[x]² from two exact decimal
    * running sums (value at scale 6, square at scale 10) — bit-identical
    * to `FrameKernels.bollinger`. Emits (middle, upper, lower). */
  final class BollingerKernel(n: Int = 20, k: Double = 2.0) extends Kernel {
    val arity = 1; val width = 3
    private val ring = new Array[JBig](n)
    private val ringSq = new Array[JBig](n)
    private var t = 0L
    private var cnt = 0
    private var sum = JBig.ZERO
    private var sumSq = JBig.ZERO
    def reset(): Unit = {
      t = 0L; cnt = 0; sum = JBig.ZERO; sumSq = JBig.ZERO
      java.util.Arrays.fill(ring.asInstanceOf[Array[AnyRef]], null)
      java.util.Arrays.fill(ringSq.asInstanceOf[Array[AnyRef]], null)
    }
    def step(in: Array[Double]): Array[Double] = {
      val z = in(0)
      val slot = (t % n).toInt
      t += 1
      if (t > n && ring(slot) != null) {
        sum = sum.subtract(ring(slot))
        sumSq = sumSq.subtract(ringSq(slot))
        cnt -= 1
      }
      if (java.lang.Double.isNaN(z)) { ring(slot) = null; ringSq(slot) = null }
      else {
        val d = dec6(z)
        val dSq = dec10(z * z) // double product first, then decimal cast
        ring(slot) = d
        ringSq(slot) = dSq
        sum = sum.add(d)
        sumSq = sumSq.add(dSq)
        cnt += 1
      }
      if (t < n || cnt == 0) Array(Double.NaN, Double.NaN, Double.NaN)
      else {
        val c = cnt.toDouble
        val mean = sum.doubleValue() / c
        val meanSq = sumSq.doubleValue() / c
        val sd = math.sqrt(meanSq - mean * mean)
        Array(mean, mean + k * sd, mean - k * sd)
      }
    }
  }

  /** W6+G2 fused — Bollinger bands plus the band-crossover signals in
    * the SAME sequential pass: buy/sell are the lag-1 crossover algebra
    * (`FrameKernels.crossBelow`/`crossAbove`) evaluated against the
    * kernel's carried previous-row state instead of a post-kernel
    * `Window` pair. The E3 read path is stage-latency-bound at its
    * constant post-prune volume, and the two lag windows (plus their
    * required exchange over the kernel's opaque mapPartitions output)
    * were most of its plan — fusing them keeps the whole query at one
    * data exchange. NaN carried state compares false, exactly like the
    * SQL NULL-lag comparisons under the oracle's coalesce(…, false).
    * Emits (middle, upper, lower, buy, sell) with the signals as
    * 1.0/0.0 (never NaN — warmup rows are false, not null). */
  final class BollingerCrossKernel(n: Int = 20, k: Double = 2.0)
      extends Kernel {
    val arity = 1; val width = 5
    private val bb = new BollingerKernel(n, k)
    private var prevClose = Double.NaN
    private var prevUp = Double.NaN
    private var prevLo = Double.NaN
    def reset(): Unit = {
      bb.reset()
      prevClose = Double.NaN; prevUp = Double.NaN; prevLo = Double.NaN
    }
    def step(in: Array[Double]): Array[Double] = {
      val z = in(0)
      val b = bb.step(in) // (mid, up, lo)
      val buy = if (prevClose > prevLo && z < b(2)) 1.0 else 0.0
      val sell = if (prevClose < prevUp && z > b(1)) 1.0 else 0.0
      prevClose = z; prevUp = b(1); prevLo = b(2)
      Array(b(0), b(1), b(2), buy, sell)
    }
  }

  /** W4 — exact rolling median over the trailing n-row frame
    * (min_periods=1, reference init_influxdb.py:68-71): sorted middle
    * pick over the frame's NON-NULL values (nulls occupy a frame slot
    * but are skipped, like collect_list). Plain double arithmetic —
    * mirrors `FrameKernels.rollingMedian`'s element_at picks exactly
    * ((lo+hi)/2.0 for even counts). */
  final class MedianKernel(n: Int) extends Kernel {
    val arity = 1; val width = 1
    private val ring = new Array[Double](n)
    private val present = new Array[Boolean](n)
    private val tmp = new Array[Double](n)
    private var t = 0L
    def reset(): Unit = { t = 0L; java.util.Arrays.fill(present, false) }
    def step(in: Array[Double]): Array[Double] = {
      val z = in(0)
      val slot = (t % n).toInt
      t += 1
      present(slot) = !java.lang.Double.isNaN(z)
      ring(slot) = z
      var cnt = 0
      var i = 0
      while (i < n) {
        if (present(i)) { tmp(cnt) = ring(i); cnt += 1 }
        i += 1
      }
      if (cnt == 0) return Array(Double.NaN)
      java.util.Arrays.sort(tmp, 0, cnt)
      Array(
        if (cnt % 2 == 1) tmp((cnt + 1) / 2 - 1)
        else (tmp(cnt / 2 - 1) + tmp(cnt / 2)) / 2.0)
    }
  }

  /** The PPO line (reference ta_signals.py:40-47, matype=0): PPO =
    * (SMA12 − SMA26) / SMA26 · 100 from row 26, where each SMA is the
    * decimal frame sum divided by the CONSTANT period (TA-Lib SMA — the
    * windowed form divides decSum by 12.0/26.0, not by the non-null
    * count). Bit-identical to the decSum-based windowed PPO
    * (RecursiveKernelQueries.ppoDf / PipelineQueries). */
  final class PpoLineKernel(fast: Int = 12, slow: Int = 26) extends Kernel {
    val arity = 1; val width = 1
    private val ringF = new Array[JBig](fast)
    private val ringS = new Array[JBig](slow)
    private var t = 0L
    private var cntF = 0
    private var cntS = 0
    private var sumF = JBig.ZERO
    private var sumS = JBig.ZERO
    def reset(): Unit = {
      t = 0L; cntF = 0; cntS = 0; sumF = JBig.ZERO; sumS = JBig.ZERO
      java.util.Arrays.fill(ringF.asInstanceOf[Array[AnyRef]], null)
      java.util.Arrays.fill(ringS.asInstanceOf[Array[AnyRef]], null)
    }
    def step(in: Array[Double]): Array[Double] = {
      val z = in(0)
      val slotF = (t % fast).toInt
      val slotS = (t % slow).toInt
      t += 1
      if (t > fast && ringF(slotF) != null) { sumF = sumF.subtract(ringF(slotF)); cntF -= 1 }
      if (t > slow && ringS(slotS) != null) { sumS = sumS.subtract(ringS(slotS)); cntS -= 1 }
      if (java.lang.Double.isNaN(z)) { ringF(slotF) = null; ringS(slotS) = null }
      else {
        val d = dec6(z)
        ringF(slotF) = d; sumF = sumF.add(d); cntF += 1
        ringS(slotS) = d; sumS = sumS.add(d); cntS += 1
      }
      if (t < slow || cntF == 0 || cntS == 0) Array(Double.NaN)
      else {
        // the windowed form divides by the CONSTANT period (TA-Lib SMA),
        // not the non-null count — sums skip nulls, divisor does not
        val smaF = sumF.doubleValue() / fast.toDouble
        val smaS = sumS.doubleValue() / slow.toDouble
        Array((smaF - smaS) / smaS * 100.0)
      }
    }
  }
}
