package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{ChunkedKernels, SeriesKernels}
import graft.operators.SeriesKernels._
import graft.sources.Tables

/** Order-dependent kernels R1/R2/R4-R7 and their crossover signals
  * G1/G3/G4/G5 (SURVEY.md §2.5b/§2.5c), over the per-user `events.value`
  * series (ADX over per-user hourly OHLC bars rebuilt from events, X8).
  *
  * Spark side: [[SeriesKernels]] mapPartitions state machines — one
  * shuffle on the series key, sequential O(1)-state pass per series.
  *
  * Oracle side: DuckDB `WITH RECURSIVE` CTEs advance every series in
  * lockstep by row number, carrying the kernel state as columns. Each
  * SQL transition mirrors the Scala arithmetic operation-for-operation
  * (same IEEE evaluation order), so results match bit-exactly before the
  * cosmetic round(…, 6). Float literals are emitted in e-notation so
  * DuckDB parses them as DOUBLE, not DECIMAL ([[dl]]).
  */
object RecursiveKernelQueries extends QueryPack {

  /** Double literal that DuckDB parses as DOUBLE (e-notation). Scala's
    * Double.toString round-trips, so the parsed value is bit-identical.
    */
  private def dl(d: Double): String = {
    val s = d.toString
    if (s.contains('e') || s.contains('E')) s else s + "e0"
  }

  /** Force `AS MATERIALIZED` on the named CTE heads ([[OracleSql]]).
    * Critical for the ADX chain: DuckDB inlines `di`/`dxt` into rec2's
    * recursive step, so every rec2 iteration re-runs the whole rec1
    * recursion — O(L²) full re-evaluations (measured 315 s at sf0.01;
    * ~1 s materialized, hash-identical). The cheap single-recursion
    * oracles get the same treatment for uniformity: the correctness
    * gate's DuckDB side is budgeted wall time (VERDICT r13 next #2).
    * Names are explicit because the signal oracles carry `WINDOW w AS (`
    * clauses that must not be rewritten. */
  private def mat(sql: String, names: String*): String =
    OracleSql.materialize(sql, names.toSet)

  private val sCte =
    """s AS (
      |  SELECT user_id, event_id, value,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events)""".stripMargin

  private[queries] def recJoin(rec: String, src: String = "s") =
    s"FROM $rec r JOIN $src s ON s.user_id = r.user_id AND s.rn = r.rn + 1"

  // ----------------------------------------------------------------
  // R1 — Kalman
  // ----------------------------------------------------------------
  /** Kalman recursion CTE over a series CTE `src`(user_id, event_id,
    * rn, value); result CTE `name` carries x (the filtered value). */
  private[queries] def kalmanRec(src: String, name: String): String = {
    // seed row: x = z (update with z-x = 0), P after one predict+update
    val p1 = s"(1e0 + ${dl(1e-4)})"
    val k0 = s"($p1 / ($p1 + ${dl(1e-3)}))"
    val seedP = s"(1e0 - $k0) * $p1 * (1e0 - $k0) + $k0 * ${dl(1e-3)} * $k0"
    // recursive step: predicted pp, gain kk
    val pp = s"(r.p + ${dl(1e-4)})"
    val kk = s"($pp / ($pp + ${dl(1e-3)}))"
    s"""$name AS (
       |  SELECT user_id, event_id, rn, value, value AS x, $seedP AS p
       |  FROM $src WHERE rn = 1
       |  UNION ALL
       |  SELECT s.user_id, s.event_id, s.rn, s.value,
       |         r.x + $kk * (s.value - r.x),
       |         (1e0 - $kk) * $pp * (1e0 - $kk) + $kk * ${dl(1e-3)} * $kk
       |  ${recJoin(name, src)}
       |)""".stripMargin
  }

  private val kalmanOracle: String =
    mat(s"""WITH RECURSIVE $sCte,
       |${kalmanRec("s", "rec")}
       |SELECT event_id, round(x, 6) AS kalman FROM rec ORDER BY event_id""".stripMargin,
      "s", "rec")

  // ----------------------------------------------------------------
  // R2 — simple exponential smoothing fitted values
  // ----------------------------------------------------------------
  /** SES(0.2) recursion over `src`; result CTE carries f (fitted). */
  private[queries] def sesRec(src: String, name: String): String =
    s"""$name AS (
       |  SELECT user_id, event_id, rn, value, value AS f FROM $src WHERE rn = 1
       |  UNION ALL
       |  SELECT s.user_id, s.event_id, s.rn, s.value,
       |         ${dl(0.2)} * r.value + ${dl(0.8)} * r.f
       |  ${recJoin(name, src)}
       |)""".stripMargin

  private val sesOracle: String =
    mat(s"""WITH RECURSIVE $sCte,
       |${sesRec("s", "rec")}
       |SELECT event_id, round(f, 6) AS ses FROM rec ORDER BY event_id""".stripMargin,
      "s", "rec")

  // ----------------------------------------------------------------
  // R4 — Wilder RSI(14); rec carries (value, sumg, suml, ag, al)
  // ----------------------------------------------------------------
  private[queries] def rsiRec(src: String, name: String): String = {
    val g = "greatest(s.value - r.value, 0e0)"
    val l = "greatest(r.value - s.value, 0e0)"
    s"""$name AS (
       |  SELECT user_id, event_id, rn, value,
       |         0e0 AS sumg, 0e0 AS suml,
       |         CAST(NULL AS DOUBLE) AS ag, CAST(NULL AS DOUBLE) AS al
       |  FROM $src WHERE rn = 1
       |  UNION ALL
       |  SELECT s.user_id, s.event_id, s.rn, s.value,
       |         CASE WHEN s.rn <= 14 THEN r.sumg + $g ELSE r.sumg END,
       |         CASE WHEN s.rn <= 14 THEN r.suml + $l ELSE r.suml END,
       |         CASE WHEN s.rn < 15 THEN CAST(NULL AS DOUBLE)
       |              WHEN s.rn = 15 THEN (r.sumg + $g) / 14.0
       |              ELSE (r.ag * 13.0 + $g) / 14.0 END,
       |         CASE WHEN s.rn < 15 THEN CAST(NULL AS DOUBLE)
       |              WHEN s.rn = 15 THEN (r.suml + $l) / 14.0
       |              ELSE (r.al * 13.0 + $l) / 14.0 END
       |  ${recJoin(name, src)}
       |)""".stripMargin
  }

  private[queries] val rsiValExpr =
    "CASE WHEN rn >= 15 THEN CASE WHEN ag + al = 0e0 THEN 0e0 ELSE 100.0 * (ag / (ag + al)) END END"

  private val rsiOracle: String =
    mat(s"""WITH RECURSIVE $sCte,
       |${rsiRec("s", "rec")}
       |SELECT event_id, round($rsiValExpr, 6) AS rsi FROM rec ORDER BY event_id""".stripMargin,
      "s", "rec")

  private val rsiSignalOracle: String =
    mat(s"""WITH RECURSIVE $sCte,
       |${rsiRec("s", "rec")},
       |rv AS (SELECT user_id, event_id, rn, $rsiValExpr AS rsi FROM rec)
       |SELECT event_id,
       |       coalesce(lag(rsi) OVER w < 30.0 AND rsi > 30.0, false) AS buy,
       |       coalesce(lag(rsi) OVER w > 70.0 AND rsi < 70.0, false) AS sell
       |FROM rv WINDOW w AS (PARTITION BY user_id ORDER BY rn)
       |ORDER BY event_id""".stripMargin,
      "s", "rec", "rv")

  // ----------------------------------------------------------------
  // R5 — MACD(12,26,9); rec carries (l12, sum26, ema12, ema26, sumsig, sig)
  // ----------------------------------------------------------------
  private[queries] def macdRec(src: String, name: String): String = {
    val kF = dl(2.0 / 13.0); val kS = dl(2.0 / 27.0); val kG = dl(2.0 / 10.0)
    val l12new = "list_slice(list_append(r.l12, s.value), -12, -1)"
    val seedFast = s"list_reduce($l12new, (a, b) -> a + b) / 12.0"
    val ema12 =
      s"""CASE WHEN s.rn < 26 THEN CAST(NULL AS DOUBLE)
         |              WHEN s.rn = 26 THEN $seedFast
         |              ELSE (s.value - r.ema12) * $kF + r.ema12 END""".stripMargin
    val ema26 =
      s"""CASE WHEN s.rn < 26 THEN CAST(NULL AS DOUBLE)
         |              WHEN s.rn = 26 THEN (r.sum26 + s.value) / 26.0
         |              ELSE (s.value - r.ema26) * $kS + r.ema26 END""".stripMargin
    val macd = s"(($ema12) - ($ema26))"
    s"""$name AS (
       |  SELECT user_id, event_id, rn, value,
       |         [value] AS l12, value AS sum26,
       |         CAST(NULL AS DOUBLE) AS ema12, CAST(NULL AS DOUBLE) AS ema26,
       |         0e0 AS sumsig, CAST(NULL AS DOUBLE) AS sig
       |  FROM $src WHERE rn = 1
       |  UNION ALL
       |  SELECT s.user_id, s.event_id, s.rn, s.value,
       |         CASE WHEN s.rn <= 26 THEN $l12new ELSE NULL END,
       |         CASE WHEN s.rn < 26 THEN r.sum26 + s.value ELSE 0e0 END,
       |         $ema12,
       |         $ema26,
       |         CASE WHEN s.rn >= 26 AND s.rn < 34 THEN r.sumsig + $macd ELSE r.sumsig END,
       |         CASE WHEN s.rn < 34 THEN CAST(NULL AS DOUBLE)
       |              WHEN s.rn = 34 THEN (r.sumsig + $macd) / 9.0
       |              ELSE ($macd - r.sig) * $kG + r.sig END
       |  ${recJoin(name, src)}
       |)""".stripMargin
  }

  private val macdOracle: String =
    mat(s"""WITH RECURSIVE $sCte,
       |${macdRec("s", "rec")}
       |SELECT event_id,
       |       CASE WHEN rn >= 34 THEN round(ema12 - ema26, 6) END AS macd,
       |       CASE WHEN rn >= 34 THEN round(sig, 6) END AS macd_signal,
       |       CASE WHEN rn >= 34 THEN round((ema12 - ema26) - sig, 6) END AS macd_hist
       |FROM rec ORDER BY event_id""".stripMargin,
      "s", "rec")

  private val macdSignalOracle: String =
    mat(s"""WITH RECURSIVE $sCte,
       |${macdRec("s", "rec")},
       |mv AS (SELECT user_id, event_id, rn,
       |              CASE WHEN rn >= 34 THEN ema12 - ema26 END AS m,
       |              CASE WHEN rn >= 34 THEN sig END AS sg
       |       FROM rec)
       |SELECT event_id,
       |       coalesce(lag(m) OVER w < lag(sg) OVER w AND m > sg, false) AS buy,
       |       coalesce(lag(m) OVER w > lag(sg) OVER w AND m < sg, false) AS sell
       |FROM mv WINDOW w AS (PARTITION BY user_id ORDER BY rn)
       |ORDER BY event_id""".stripMargin,
      "s", "rec", "mv")

  // ----------------------------------------------------------------
  // R6 — PPO(12,26, matype=0) + EMA(9) signal line. The PPO line itself
  // is frame-expressible (two trailing SMAs); only its EMA is recursive.
  // ----------------------------------------------------------------
  private val ppoSCte: String = {
    val over12 = "(PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)"
    val over26 = "(PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 25 PRECEDING AND CURRENT ROW)"
    val sma12 = s"CAST(sum(CAST(value AS DECIMAL(18,6))) OVER $over12 AS DOUBLE) / 12.0"
    val sma26 = s"CAST(sum(CAST(value AS DECIMAL(18,6))) OVER $over26 AS DOUBLE) / 26.0"
    s"""s AS (
       |  SELECT user_id, event_id, rn,
       |         CASE WHEN rn >= 26 THEN ($sma12 - $sma26) / ($sma26) * 100.0 END AS ppo
       |  FROM (SELECT user_id, event_id, ts, value,
       |               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |        FROM events) t0)""".stripMargin
  }

  /** EMA(9) over the (null-prefixed) ppo column; rec carries (n, sum, ema).
    * Joins on rn (every row, null ppo rows just carry state through).
    */
  private[queries] def ppoRec(src: String, name: String): String = {
    val kG = dl(2.0 / 10.0)
    s"""$name AS (
       |  SELECT user_id, event_id, rn, ppo,
       |         CASE WHEN ppo IS NULL THEN 0 ELSE 1 END AS n,
       |         coalesce(ppo, 0e0) AS psum,
       |         CAST(NULL AS DOUBLE) AS ema
       |  FROM $src WHERE rn = 1
       |  UNION ALL
       |  SELECT s.user_id, s.event_id, s.rn, s.ppo,
       |         CASE WHEN s.ppo IS NULL THEN r.n ELSE r.n + 1 END,
       |         CASE WHEN s.ppo IS NULL THEN r.psum
       |              WHEN r.n < 9 THEN r.psum + s.ppo ELSE r.psum END,
       |         CASE WHEN s.ppo IS NULL THEN r.ema
       |              WHEN r.n < 8 THEN CAST(NULL AS DOUBLE)
       |              WHEN r.n = 8 THEN (r.psum + s.ppo) / 9.0
       |              ELSE (s.ppo - r.ema) * $kG + r.ema END
       |  FROM $name r JOIN $src s ON s.user_id = r.user_id AND s.rn = r.rn + 1
       |)""".stripMargin
  }

  private val ppoOracle: String =
    mat(s"""WITH RECURSIVE $ppoSCte,
       |${ppoRec("s", "rec")}
       |SELECT event_id, round(ppo, 6) AS ppo, round(ema, 6) AS ppo_ema
       |FROM rec ORDER BY event_id""".stripMargin,
      "s", "rec")

  private val ppoSignalOracle: String =
    mat(s"""WITH RECURSIVE $ppoSCte,
       |${ppoRec("s", "rec")}
       |SELECT event_id,
       |       coalesce(lag(ppo) OVER w < lag(ema) OVER w AND ppo > ema, false) AS buy,
       |       coalesce(lag(ppo) OVER w > lag(ema) OVER w AND ppo < ema, false) AS sell
       |FROM rec WINDOW w AS (PARTITION BY user_id ORDER BY rn)
       |ORDER BY event_id""".stripMargin,
      "s", "rec")

  // ----------------------------------------------------------------
  // R7 — ADX/±DI(14) over per-user hourly OHLC bars (X8 rebuild).
  // Chained CTEs: rec1 carries the Wilder sums, di/dx are stateless,
  // rec2 carries the ADX recursion.
  // ----------------------------------------------------------------
  /** ADX recursion CTE chain (rec1/di/dxt/rec2) over a bar-series CTE
    * `src`(user_id, bts, rn, high, low, close). */
  private[queries] def adxRecCtes(src: String): String = {
    val tr = "greatest(s.high - s.low, abs(s.high - r.close), abs(s.low - r.close))"
    val pdm = "CASE WHEN (s.high - r.high) > (r.low - s.low) AND (s.high - r.high) > 0e0 THEN s.high - r.high ELSE 0e0 END"
    val mdm = "CASE WHEN (r.low - s.low) > (s.high - r.high) AND (r.low - s.low) > 0e0 THEN r.low - s.low ELSE 0e0 END"
    s"""rec1 AS (
       |  SELECT user_id, bts, rn, high, low, close,
       |         0e0 AS smtr, 0e0 AS smp, 0e0 AS smm
       |  FROM $src WHERE rn = 1
       |  UNION ALL
       |  SELECT s.user_id, s.bts, s.rn, s.high, s.low, s.close,
       |         CASE WHEN s.rn <= 15 THEN r.smtr + $tr ELSE r.smtr - r.smtr / 14.0 + $tr END,
       |         CASE WHEN s.rn <= 15 THEN r.smp + $pdm ELSE r.smp - r.smp / 14.0 + $pdm END,
       |         CASE WHEN s.rn <= 15 THEN r.smm + $mdm ELSE r.smm - r.smm / 14.0 + $mdm END
       |  FROM rec1 r JOIN $src s ON s.user_id = r.user_id AND s.rn = r.rn + 1
       |),
       |di AS (
       |  SELECT user_id, bts, rn,
       |         CASE WHEN rn >= 15 THEN
       |           CASE WHEN smtr = 0e0 THEN 0e0 ELSE 100.0 * (smp / smtr) END END AS pdi,
       |         CASE WHEN rn >= 15 THEN
       |           CASE WHEN smtr = 0e0 THEN 0e0 ELSE 100.0 * (smm / smtr) END END AS mdi
       |  FROM rec1),
       |dxt AS (
       |  SELECT user_id, bts, rn, pdi, mdi,
       |         CASE WHEN rn >= 15 THEN
       |           CASE WHEN pdi + mdi = 0e0 THEN 0e0
       |                ELSE 100.0 * (abs(pdi - mdi) / (pdi + mdi)) END END AS dxv
       |  FROM di),
       |rec2 AS (
       |  SELECT user_id, bts, rn, pdi, mdi,
       |         0e0 AS sumdx, CAST(NULL AS DOUBLE) AS adx
       |  FROM dxt WHERE rn = 1
       |  UNION ALL
       |  SELECT d.user_id, d.bts, d.rn, d.pdi, d.mdi,
       |         CASE WHEN d.rn >= 15 AND d.rn < 28 THEN r.sumdx + d.dxv ELSE r.sumdx END,
       |         CASE WHEN d.rn < 28 THEN CAST(NULL AS DOUBLE)
       |              WHEN d.rn = 28 THEN (r.sumdx + d.dxv) / 14.0
       |              ELSE (r.adx * 13.0 + d.dxv) / 14.0 END
       |  FROM rec2 r JOIN dxt d ON d.user_id = r.user_id AND d.rn = r.rn + 1
       |)""".stripMargin
  }

  private val adxCtes: String =
    s"""bars AS (
       |  SELECT user_id, date_trunc('hour', ts) AS bts,
       |         max(value) AS high, min(value) AS low, arg_max(value, ts) AS close
       |  FROM events GROUP BY user_id, date_trunc('hour', ts)),
       |s AS (
       |  SELECT user_id, bts, high, low, close,
       |         row_number() OVER (PARTITION BY user_id ORDER BY bts) AS rn
       |  FROM bars),
       |${adxRecCtes("s")}""".stripMargin

  private val adxOracle: String =
    mat(s"""WITH RECURSIVE $adxCtes
       |SELECT user_id, strftime(bts, '%Y-%m-%d %H:%M:%S') AS bucket,
       |       round(pdi, 6) AS plus_di, round(mdi, 6) AS minus_di, round(adx, 6) AS adx
       |FROM rec2 ORDER BY user_id, bucket""".stripMargin,
      "bars", "s", "rec1", "di", "dxt", "rec2")

  private val adxSignalOracle: String =
    mat(s"""WITH RECURSIVE $adxCtes
       |SELECT user_id, strftime(bts, '%Y-%m-%d %H:%M:%S') AS bucket,
       |       coalesce(lag(pdi) OVER w < lag(mdi) OVER w AND pdi > mdi AND adx > 25.0, false) AS buy,
       |       coalesce(lag(mdi) OVER w < lag(pdi) OVER w AND mdi > pdi AND adx > 25.0, false) AS sell
       |FROM rec2 WINDOW w AS (PARTITION BY user_id ORDER BY rn)
       |ORDER BY user_id, bucket""".stripMargin,
      "bars", "s", "rec1", "di", "dxt", "rec2")

  // ----------------------------------------------------------------
  // Spark-side builders
  // ----------------------------------------------------------------

  private def withKernel(spec: KernelSpec) =
    (s: org.apache.spark.sql.SparkSession, dir: String) =>
      // eventsSeries: pre-projected kernel input — the opaque
      // mapPartitions pass blocks column pruning, so the projection
      // must happen below the kernel or the series exchange carries
      // the events string columns for nothing (Tables.eventsSeries)
      SeriesKernels.applyKernels(
        Tables.eventsSeries(s, dir), Seq("user_id"), Seq("ts_ns", "event_id"), Seq(spec))

  /** Per-user hourly OHLC bars (X8) as kernel input for ADX. */
  private def bars(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.events(s, dir)
      .groupBy(col("user_id"), date_trunc("HOUR", col("ts")).as("bts"))
      .agg(
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ts_ns")).as("close"))

  override def queries: Seq[QueryDef] = Seq(

    // R1 — Kalman filter (filters.py:8-27).
    QueryDef(
      "q_r1_kalman",
      (s, dir) => withKernel(
        KernelSpec(Seq("value"), Seq("kalman"), () => new KalmanKernel()))(s, dir)
        .select(col("event_id"), round(col("kalman"), 6).as("kalman"))
        .orderBy("event_id"),
      Some(kalmanOracle)),

    // R2 — simple exponential smoothing (smoothers.py:27-33).
    QueryDef(
      "q_r2_ses",
      (s, dir) => withKernel(
        KernelSpec(Seq("value"), Seq("ses"), () => new SesKernel()))(s, dir)
        .select(col("event_id"), round(col("ses"), 6).as("ses"))
        .orderBy("event_id"),
      Some(sesOracle)),

    // R2b — the SAME SES, but via the §7.4 chunked carried-state stitch
    // (ChunkedKernels): the series is processed in 3 driver-sequenced
    // time chunks with kernel state carried across boundaries, against
    // the identical whole-series oracle — the colossal-series escape
    // hatch proven oracle-green, not just spec-equal. The chunk bounds
    // come from the data's ts range (driver-computed constants), so the
    // split is deterministic at any SF.
    QueryDef(
      "q_r2b_ses_chunked",
      (s, dir) => {
        val ev = Tables.eventsSeries(s, dir)
        val r = ev.agg(min(col("ts_ns")), max(col("ts_ns"))).first()
        val (lo, hi) = (r.getLong(0), r.getLong(1))
        val c1 = lo + (hi - lo) / 3
        val c2 = lo + 2L * ((hi - lo) / 3)
        val chunks = Seq(
          ev.filter(col("ts_ns") <= c1),
          ev.filter(col("ts_ns") > c1 && col("ts_ns") <= c2),
          ev.filter(col("ts_ns") > c2))
        val out = ChunkedKernels.applyChunked(
            chunks, Seq("user_id"), Seq("ts_ns", "event_id"),
            Seq(KernelSpec(Seq("value"), Seq("ses"), () => new SesKernel())))
          .reduce(_ unionByName _)
        out.select(col("event_id"), round(col("ses"), 6).as("ses"))
          .orderBy("event_id")
      },
      Some(sesOracle)),

    // R4 — Wilder RSI(14) (ta_signals.py:6-14).
    QueryDef(
      "q_r4_rsi",
      (s, dir) => withKernel(
        KernelSpec(Seq("value"), Seq("rsi"), () => new RsiKernel()))(s, dir)
        .select(col("event_id"), round(col("rsi"), 6).as("rsi"))
        .orderBy("event_id"),
      Some(rsiOracle)),

    // G1 — RSI oversold/overbought threshold-crossing signals. Fused
    // since r17 (the q_g2 precedent): the threshold crossovers ride the
    // SAME sequential RSI pass (CrossSignalsKernel) instead of a
    // post-kernel Window pair over the opaque mapPartitions output —
    // one exchange instead of two. Parity pinned in CrossFusionSpec.
    QueryDef(
      "q_g1_rsi_signal",
      (s, dir) => withKernel(
        KernelSpec(Seq("value"), Seq("rsi", "buy_d", "sell_d"),
          () => new CrossSignalsKernel(() => new RsiKernel(), Seq(
            CrossSpec(OutCol(0), Const(30.0), above = true),
            CrossSpec(OutCol(0), Const(70.0), above = false)))))(s, dir)
        .select(
          col("event_id"),
          (col("buy_d") === 1.0).as("buy"),
          (col("sell_d") === 1.0).as("sell"))
        .orderBy("event_id"),
      Some(rsiSignalOracle)),

    // R5 — MACD(12,26,9) with TA-Lib EMA seeding (ta_signals.py:28-37).
    QueryDef(
      "q_r5_macd",
      (s, dir) => withKernel(
        KernelSpec(Seq("value"), Seq("macd", "macd_signal", "macd_hist"),
          () => new MacdKernel()))(s, dir)
        .select(
          col("event_id"),
          round(col("macd"), 6).as("macd"),
          round(col("macd_signal"), 6).as("macd_signal"),
          round(col("macd_hist"), 6).as("macd_hist"))
        .orderBy("event_id"),
      Some(macdOracle)),

    // G3 — MACD/signal-line crossovers, fused into the MACD pass
    // (CrossSignalsKernel, r17 — see q_g1).
    QueryDef(
      "q_g3_macd_signal",
      (s, dir) => withKernel(
        KernelSpec(Seq("value"),
          Seq("macd", "macd_signal", "macd_hist", "buy_d", "sell_d"),
          () => new CrossSignalsKernel(() => new MacdKernel(), Seq(
            CrossSpec(OutCol(0), OutCol(1), above = true),
            CrossSpec(OutCol(0), OutCol(1), above = false)))))(s, dir)
        .select(
          col("event_id"),
          (col("buy_d") === 1.0).as("buy"),
          (col("sell_d") === 1.0).as("sell"))
        .orderBy("event_id"),
      Some(macdSignalOracle)),

    // R6 — PPO line (frame SMAs) + EMA(9) signal line (ta_signals.py:40-53).
    // r17: the windowed PPO frame sums became the PpoLineKernel ring
    // (bit-identical, DecFrameParitySpec) CHAINED into the EMA kernel —
    // the whole query is one scan, one exchange, one sequential pass,
    // no Window operator (previously: window exchange + decimal frame
    // re-sums per row + a second exchange for the EMA kernel pass).
    QueryDef(
      "q_r6_ppo",
      (s, dir) => withKernel(
        KernelSpec(Seq("value"), Seq("ppo", "ppo_ema"),
          () => new ChainKernel(
            () => new graft.operators.DecFrameKernels.PpoLineKernel(),
            () => new EmaKernel(9), 0)))(s, dir)
        .select(
          col("event_id"),
          round(col("ppo"), 6).as("ppo"),
          round(col("ppo_ema"), 6).as("ppo_ema"))
        .orderBy("event_id"),
      Some(ppoOracle)),

    // G4 — PPO/EMA crossovers: PPO ring + EMA chain + both crossovers
    // in ONE sequential pass (r17; previously three movements — window
    // PPO, kernel EMA, window lags).
    QueryDef(
      "q_g4_ppo_signal",
      (s, dir) => withKernel(
        KernelSpec(Seq("value"), Seq("ppo", "ppo_ema", "buy_d", "sell_d"),
          () => new CrossSignalsKernel(
            () => new ChainKernel(
              () => new graft.operators.DecFrameKernels.PpoLineKernel(),
              () => new EmaKernel(9), 0),
            Seq(
              CrossSpec(OutCol(0), OutCol(1), above = true),
              CrossSpec(OutCol(0), OutCol(1), above = false)))))(s, dir)
        .select(
          col("event_id"),
          (col("buy_d") === 1.0).as("buy"),
          (col("sell_d") === 1.0).as("sell"))
        .orderBy("event_id"),
      Some(ppoSignalOracle)),

    // R7 — ADX / +DI / −DI over hourly bars (ta_signals.py:56-69).
    QueryDef(
      "q_r7_adx",
      (s, dir) => SeriesKernels.applyKernels(
        bars(s, dir), Seq("user_id"), Seq("bts"),
        Seq(KernelSpec(Seq("high", "low", "close"),
          Seq("plus_di", "minus_di", "adx"), () => new AdxKernel())))
        .select(
          col("user_id"),
          date_format(col("bts"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
          round(col("plus_di"), 6).as("plus_di"),
          round(col("minus_di"), 6).as("minus_di"),
          round(col("adx"), 6).as("adx"))
        .orderBy("user_id", "bucket"),
      Some(adxOracle)),

    // G5 — DI crossover gated by trend strength (adx > 25), fused into
    // the ADX pass (CrossSignalsKernel with the gate operand, r17).
    QueryDef(
      "q_g5_adx_signal",
      (s, dir) => SeriesKernels.applyKernels(
        bars(s, dir), Seq("user_id"), Seq("bts"),
        Seq(KernelSpec(Seq("high", "low", "close"),
          Seq("plus_di", "minus_di", "adx", "buy_d", "sell_d"),
          () => new CrossSignalsKernel(() => new AdxKernel(), Seq(
            CrossSpec(OutCol(0), OutCol(1), above = true, gate = Some((2, 25.0))),
            CrossSpec(OutCol(1), OutCol(0), above = true, gate = Some((2, 25.0))))))))
        .select(
          col("user_id"),
          date_format(col("bts"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
          (col("buy_d") === 1.0).as("buy"),
          (col("sell_d") === 1.0).as("sell"))
        .orderBy("user_id", "bucket"),
      Some(adxSignalOracle))
  )
}
