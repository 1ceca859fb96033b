package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Frame-expressible time-series kernels (SURVEY.md §2.5a, §2.5c):
  * SMA smoothing (W1, reference smoothers.py:19-24), rolling-median fill
  * (W4, init_influxdb.py:68-71), lag/shift (W5, ta_signals.py:11-12 etc.),
  * Bollinger Bands (W6, ta_signals.py:17-25) and the crossover signal
  * algebra (G1-G5, ta_signals.py).
  *
  * All of these are pure `Column` expressions over a shared
  * `Window.partitionBy(seriesKey).orderBy(ts)` — whole-stage-codegen'd
  * `WindowExec`, one sort per series partition reused across every kernel,
  * no shuffle beyond the initial hash partition on the series key. At
  * 100 TB with many series this is embarrassingly parallel; Spark's
  * window operator streams each frame, so memory is O(frame), not
  * O(series).
  *
  * Numeric-parity note: sliding-frame float sums are order-sensitive and
  * engines disagree in the last ulp (Spark re-scans frames, DuckDB uses
  * segment trees). Every mean/variance here therefore goes through an
  * EXACT decimal sum (order-independent) and only then converts to
  * double, so the downstream IEEE arithmetic is bit-identical across
  * engines given the same frame contents.
  */
object FrameKernels {

  /** Exact order-independent frame sum: per-element cast to DECIMAL(18,6),
    * decimal sum over the frame, deterministic cast back to double.
    */
  def decSum(c: Column, w: WindowSpec): Column =
    sum(c.cast(DecimalType(18, 6))).over(w).cast(DoubleType)

  /** SQL mirror of [[decSum]] for the DuckDB oracle. */
  def decSumSql(term: String, over: String): String =
    s"CAST(sum(CAST($term AS DECIMAL(18,6))) OVER $over AS DOUBLE)"

  /** W1 — SMA with pandas `min_periods=1` semantics: mean over the trailing
    * `n`-row frame, defined from the first row (reference smoothers.py:19-24
    * uses `rolling(window=30, min_periods=1).mean()`).
    */
  def sma(c: Column, n: Int, w: WindowSpec): Column = {
    val f = w.rowsBetween(-(n - 1), 0)
    decSum(c, f) / count(c).over(f).cast(DoubleType)
  }

  /** W6 — Bollinger middle/upper/lower with TA-Lib defaults
    * (period 20, ±2 population stddev, matype=0 ⇒ SMA middle); the first
    * `n-1` rows of each series are null (TA-Lib NaN warmup).
    * Returns (middle, upper, lower).
    *
    * Population variance is computed as E[x²]−E[x]² from two exact decimal
    * sums — deterministic across engines, unlike streaming Welford.
    */
  def bollinger(c: Column, rn: Column, n: Int = 20, k: Double = 2.0,
                w: WindowSpec): (Column, Column, Column) = {
    val f = w.rowsBetween(-(n - 1), 0)
    val cnt = count(c).over(f).cast(DoubleType)
    val mean = decSum(c, f) / cnt
    val meanSq = sum((c * c).cast(DecimalType(28, 10))).over(f).cast(DoubleType) / cnt
    val sd = sqrt(meanSq - mean * mean)
    val warm = rn >= n
    (when(warm, mean), when(warm, mean + lit(k) * sd), when(warm, mean - lit(k) * sd))
  }

  /** W4 — exact rolling median over a trailing `n`-row frame
    * (min_periods=1), used for the null-fill cleanup A2
    * (init_influxdb.py:68-71). Spark disallows `median()` with an explicit
    * frame, so: sorted collect_list + middle pick (collect_list skips
    * nulls, matching SQL aggregate null semantics).
    */
  def rollingMedian(c: Column, n: Int, w: WindowSpec): Column = {
    val f = w.rowsBetween(-(n - 1), 0)
    val arr = array_sort(collect_list(c).over(f))
    val sz = size(arr)
    when(sz === 0, lit(null).cast(DoubleType))
      .when(sz % 2 === 1, element_at(arr, ((sz + 1) / 2).cast("int")))
      .otherwise((element_at(arr, (sz / 2).cast("int"))
        + element_at(arr, (sz / 2).cast("int") + 1)) / 2.0)
  }

  /** G* — crossover algebra (ta_signals.py): `a` crosses above `b` at t
    * when a[t-1] ≤/< b[t-1] and a[t] > b[t]. The reference computes this in
    * pandas where NaN comparisons are False, so warmup rows must yield
    * false, not null — hence the coalesce.
    */
  def crossAbove(a: Column, b: Column, w: WindowSpec): Column =
    coalesce(lag(a, 1).over(w) < lag(b, 1).over(w) && a > b, lit(false))

  def crossBelow(a: Column, b: Column, w: WindowSpec): Column =
    coalesce(lag(a, 1).over(w) > lag(b, 1).over(w) && a < b, lit(false))
}
