package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Finite-impulse-response smoothers with the reference's edge semantics
  * (SURVEY.md §2.5a W2/W3):
  *
  *  - W2 Gaussian smoothing (reference smoothers.py:7-16):
  *    scipy.gaussian_filter1d with σ = window/6 (window 20 ⇒ σ = 10/3),
  *    truncate 4.0 ⇒ radius 13, **edge mode 'reflect'**
  *    (…c b a | a b c…). Realized as a reflect-padded union + one
  *    27-tap windowed dot product: the pads are narrow row copies, the
  *    convolution is a single WindowExec per series — no custom
  *    execution, fully Catalyst-optimizable, and exactly mirrorable in
  *    SQL.
  *
  *  - W3 Savitzky–Golay (reference filters.py:30-35): scipy.savgol_filter
  *    (window 21, polyorder 4), **mode 'interp'**: interior rows are the
  *    fixed least-squares convolution; the first/last 10 rows evaluate a
  *    degree-4 polynomial fit to the first/last 21 samples. All 21
  *    output forms are rows of the projection matrix P = A(AᵀA)⁻¹Aᵀ
  *    (A the Vandermonde of positions 0..20), so the whole operator is a
  *    CASE over 41 lag/lead taps with constant coefficients — again one
  *    WindowExec, no custom execution.
  *
  * Coefficients are computed once driver-side in Scala doubles and
  * embedded as identical literals in both the Spark plan and the DuckDB
  * oracle, so results match bit-exactly (the dot products fold
  * left-to-right in both engines).
  *
  * Scale: both operators are one shuffle on the series key (shared with
  * every other per-series window op via EnsureRequirements) + narrow
  * maps. Pad rows add 2·radius rows per series — negligible. Series
  * shorter than the fit window (21) are not produced by the testdata
  * (min 49); the builders null out such rows defensively.
  */
object FirKernels {

  // ---------------------------------------------------------------- W2

  /** scipy gaussian_filter1d weights: w_k ∝ exp(−k²/2σ²), k ∈ [−r, r],
    * normalized to sum 1 (sum folded left-to-right, like scipy's
    * `phi_x / phi_x.sum()`). */
  def gaussianWeights(sigma: Double, radius: Int): Array[Double] = {
    val raw = (-radius to radius).map(k => math.exp(-0.5 * k * k / (sigma * sigma)))
    val sum = raw.foldLeft(0.0)(_ + _)
    raw.map(_ / sum).toArray
  }

  /** Reference defaults: window_size 20 ⇒ σ = 20/6, radius = int(4σ+0.5). */
  val GaussSigma: Double = 20.0 / 6.0
  val GaussRadius: Int = (4.0 * GaussSigma + 0.5).toInt // 13
  val GaussW: Array[Double] = gaussianWeights(GaussSigma, GaussRadius)

  /** Double literal that DuckDB parses as DOUBLE (bit-exact round trip). */
  def dl(v: Double): String = {
    val s = v.toString
    if (s.contains('e') || s.contains('E')) s else s + "e0"
  }

  /** Gaussian smoothing of `valueCol` per series: appends `outCol`.
    * Implementation: rn/n per series → union of the body (pos = rn−1)
    * with reflected left pads (pos = −rn, rows rn ≤ r) and right pads
    * (pos = 2n − rn, rows rn > n − r) → 27-tap dot over pos order →
    * keep body rows.
    */
  def gaussian(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      valueCol: String, outCol: String): DataFrame = {
    val r = GaussRadius
    val wSeq = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(col): _*)
    val wAll = Window.partitionBy(keyCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val base = df
      .withColumn("__rn", row_number().over(wSeq))
      .withColumn("__n", count(lit(1)).over(wAll))
    val body = base.withColumn("__pos", col("__rn") - 1)
    val lpad = base.filter(col("__rn") <= r).withColumn("__pos", -col("__rn"))
    val rpad = base.filter(col("__rn") > col("__n") - r)
      .withColumn("__pos", lit(2) * col("__n") - col("__rn"))
    val padded = body.unionByName(lpad).unionByName(rpad)
    val wPos = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__pos"))
    val v = col(valueCol).cast("double")
    val conv = (0 until 2 * r + 1).map { j =>
      val o = j - r
      val tap = if (o < 0) lag(v, -o).over(wPos)
                else if (o == 0) v
                else lead(v, o).over(wPos)
      lit(GaussW(j)) * tap
    }.reduce(_ + _)
    padded.withColumn(outCol, conv)
      .filter(col("__pos") >= 0 && col("__pos") < col("__n"))
      .drop("__rn", "__n", "__pos")
  }

  /** DuckDB mirror of [[gaussian]]: CTEs base/padded + windowed taps.
    * `table` must provide the key/order/value columns by name.
    */
  def gaussianSql(table: String, keyCols: Seq[String], orderCols: Seq[String],
      valueCol: String, outCol: String, selectCols: Seq[String],
      prefix: String = ""): String = {
    val r = GaussRadius
    val keys = keyCols.mkString(", ")
    val ord = orderCols.mkString(", ")
    val conv = (0 until 2 * r + 1).map { j =>
      val o = j - r
      val tap =
        if (o < 0) s"lag(v, ${-o}) OVER ${prefix}wp"
        else if (o == 0) "v"
        else s"lead(v, $o) OVER ${prefix}wp"
      s"${dl(GaussW(j))} * $tap"
    }.mkString(" + ")
    s"""${prefix}base AS (
       |  SELECT *, CAST($valueCol AS DOUBLE) AS v,
       |         row_number() OVER (PARTITION BY $keys ORDER BY $ord) AS rn,
       |         count(*) OVER (PARTITION BY $keys) AS n
       |  FROM $table),
       |${prefix}padded AS (
       |  SELECT ${(selectCols :+ "v" :+ "n").mkString(", ")}, rn - 1 AS pos FROM ${prefix}base
       |  UNION ALL
       |  SELECT ${(selectCols :+ "v" :+ "n").mkString(", ")}, -rn AS pos FROM ${prefix}base WHERE rn <= $r
       |  UNION ALL
       |  SELECT ${(selectCols :+ "v" :+ "n").mkString(", ")}, 2 * n - rn AS pos FROM ${prefix}base WHERE rn > n - $r),
       |${prefix}conv AS (
       |  SELECT *, $conv AS $outCol
       |  FROM ${prefix}padded
       |  WINDOW ${prefix}wp AS (PARTITION BY $keys ORDER BY pos))""".stripMargin
  }

  // ---------------------------------------------------------------- W3

  val SgWindow = 21
  val SgDegree = 4
  private val SgHalf = SgWindow / 2 // 10

  /** Least-squares projection matrix P = A(AᵀA)⁻¹Aᵀ, A[i][j] = i^j for
    * i ∈ 0..20, j ∈ 0..4. Row i of P gives output position i of a
    * degree-4 fit to the 21 samples. Solved by Gauss–Jordan on the 5×5
    * normal matrix (exact enough in doubles; both engines receive the
    * same literals).
    */
  lazy val SgP: Array[Array[Double]] = {
    val w = SgWindow; val d = SgDegree + 1
    val a = Array.tabulate(w, d)((i, j) => math.pow(i.toDouble, j.toDouble))
    val ata = Array.tabulate(d, d)((r, c) =>
      (0 until w).foldLeft(0.0)((s, i) => s + a(i)(r) * a(i)(c)))
    // Gauss-Jordan inverse of ata
    val m = Array.tabulate(d, 2 * d)((r, c) =>
      if (c < d) ata(r)(c) else if (c - d == r) 1.0 else 0.0)
    for (colI <- 0 until d) {
      val piv = (colI until d).maxBy(r => math.abs(m(r)(colI)))
      val tmp = m(colI); m(colI) = m(piv); m(piv) = tmp
      val pv = m(colI)(colI)
      for (c <- 0 until 2 * d) m(colI)(c) /= pv
      for (r <- 0 until d if r != colI) {
        val f = m(r)(colI)
        for (c <- 0 until 2 * d) m(r)(c) -= f * m(colI)(c)
      }
    }
    val inv = Array.tabulate(d, d)((r, c) => m(r)(c + d))
    // P = A inv Aᵀ
    Array.tabulate(w, w) { (i, k) =>
      var s = 0.0
      for (r <- 0 until d; c <- 0 until d) s += a(i)(r) * inv(r)(c) * a(k)(c)
      s
    }
  }

  /** Savitzky–Golay filter of `valueCol` per series: appends `outCol`.
    * One window of 41 lag/lead taps + a CASE selecting the edge-fit row
    * of [[SgP]] (left rows 1..10, right rows n−9..n) or the interior
    * convolution (row 10 of P, centered).
    */
  def savgol(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      valueCol: String, outCol: String): DataFrame = {
    val wSeq = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(col): _*)
    val wAll = Window.partitionBy(keyCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val v = col(valueCol).cast("double")
    // The 41 taps are MATERIALIZED columns (one WindowExec evaluates them
    // all), and the CASE reads the attributes. Inlining the window exprs
    // into the 21-branch CASE instead multiplies the tree to ~450 window
    // nodes — measured 130 s vs ~4 s on sf0.01.
    def tapName(o: Int) = if (o < 0) s"__t_m${-o}" else s"__t_p$o"
    val tapCols = (-SgWindow + 1 until SgWindow).map { o =>
      val c = if (o < 0) lag(v, -o).over(wSeq)
              else if (o == 0) v
              else lead(v, o).over(wSeq)
      c.as(tapName(o))
    }
    def dot(coeffs: Array[Double], offsetOf: Int => Int): Column =
      (0 until SgWindow).map(k => lit(coeffs(k)) * col(tapName(offsetOf(k)))).reduce(_ + _)
    val rn = col("__rn"); val n = col("__n")
    // left edge row e (0-based): x[k] at offset k - e
    val leftBranches = (0 until SgHalf).map { e =>
      (rn === e + 1, dot(SgP(e), k => k - e))
    }
    // right edge, j = n - rn (0-based from end): x[n-21+k] at offset k + j - 20
    val rightBranches = (0 until SgHalf).map { j =>
      (n - rn === j, dot(SgP(SgWindow - 1 - j), k => k + j - (SgWindow - 1)))
    }
    val interior = dot(SgP(SgHalf), k => k - SgHalf)
    val cased = (leftBranches ++ rightBranches)
      .foldLeft(Option.empty[Column]) { case (acc, (cond, value)) =>
        Some(acc.map(_.when(cond, value)).getOrElse(when(cond, value)))
      }.get.otherwise(interior)
    val withTaps = df.select(
      df.columns.map(col) ++ tapCols ++ Seq(
        row_number().over(wSeq).as("__rn"),
        count(lit(1)).over(wAll).as("__n")): _*)
    withTaps
      .withColumn(outCol, when(n >= SgWindow, cased))
      .drop((-SgWindow + 1 until SgWindow).map(tapName) :+ "__rn" :+ "__n": _*)
  }

  /** DuckDB mirror of [[savgol]]: CTE with rn/n + the same CASE over
    * lag/lead taps in window `ws`. */
  def savgolSql(table: String, keyCols: Seq[String], orderCols: Seq[String],
      valueCol: String, outCol: String, prefix: String = ""): String = {
    val keys = keyCols.mkString(", ")
    val ord = orderCols.mkString(", ")
    def tap(o: Int): String =
      if (o < 0) s"lag(v, ${-o}) OVER ${prefix}ws"
      else if (o == 0) "v"
      else s"lead(v, $o) OVER ${prefix}ws"
    def dot(coeffs: Array[Double], offsetOf: Int => Int): String =
      (0 until SgWindow).map(k => s"${dl(coeffs(k))} * ${tap(offsetOf(k))}").mkString(" + ")
    val left = (0 until SgHalf).map { e =>
      s"WHEN rn = ${e + 1} THEN ${dot(SgP(e), k => k - e)}"
    }
    val right = (0 until SgHalf).map { j =>
      s"WHEN n - rn = $j THEN ${dot(SgP(SgWindow - 1 - j), k => k + j - (SgWindow - 1))}"
    }
    val interior = dot(SgP(SgHalf), k => k - SgHalf)
    s"""${prefix}base AS (
       |  SELECT *, CAST($valueCol AS DOUBLE) AS v,
       |         row_number() OVER (PARTITION BY $keys ORDER BY $ord) AS rn,
       |         count(*) OVER (PARTITION BY $keys) AS n
       |  FROM $table),
       |${prefix}sg AS (
       |  SELECT *,
       |         CASE WHEN n >= $SgWindow THEN
       |           CASE ${(left ++ right).mkString("\n                ")}
       |                ELSE $interior END
       |         END AS $outCol
       |  FROM ${prefix}base
       |  WINDOW ${prefix}ws AS (PARTITION BY $keys ORDER BY $ord))""".stripMargin
  }
}
