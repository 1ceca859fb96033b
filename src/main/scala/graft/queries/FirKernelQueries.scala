package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{FirKernels, Wavelet}
import graft.sources.Tables

/** W2 Gaussian smoothing, W3 Savitzky–Golay, R3 wavelet denoising
  * (SURVEY.md §2.5) over the per-user `events.value` series — the three
  * kernels whose edge/global semantics don't fit a plain bounded frame.
  *
  * W2/W3 stay fully declarative (pad-union + windowed FIR taps; see
  * [[graft.operators.FirKernels]]) and carry exact DuckDB oracles.
  * R3 is a whole-series transform with no SQL equivalent — its
  * correctness contract lives in WaveletSpec (perfect reconstruction,
  * polynomial preservation); the query is rows-only checked.
  */
object FirKernelQueries extends QueryPack {

  override def queries: Seq[QueryDef] = Seq(

    // W2 — Gaussian smoothing, σ = 20/6, radius 13, edge mode 'reflect'
    // (smoothers.py:7-16).
    QueryDef(
      "q_w2_gaussian",
      // Spark side runs the series-buffered fused pass (mapPartitions
      // ring buffer — WindowExec is not codegen'd and the 27-tap
      // lag/lead projection measured ~2.5x DuckDB warm; the buffered
      // form is bit-identical to the windowed one, FirKernelsSpec).
      // The windowed declarative builder stays in FirKernels, mirrored
      // by this oracle.
      (s, dir) => graft.operators.SeriesTransforms.applyAll(
        Tables.eventsSeries(s, dir), Seq("user_id"), Seq("ts_ns", "event_id"),
        Seq(graft.operators.SeriesTransforms.gaussianSpec("value", "gauss")))
        .select(col("event_id"), round(col("gauss"), 6).as("gauss"))
        .orderBy("event_id"),
      Some {
        val cte = FirKernels.gaussianSql(
          "events", Seq("user_id"), Seq("ts, event_id"),
          "value", "gauss", Seq("user_id", "event_id"))
        s"""WITH $cte
           |SELECT event_id, round(gauss, 6) AS gauss
           |FROM conv WHERE pos >= 0 AND pos < n
           |ORDER BY event_id""".stripMargin
      },
      bench = true),

    // W3 — Savitzky–Golay(21, 4), mode 'interp' (filters.py:30-35).
    QueryDef(
      "q_w3_savgol",
      // series-buffered fused pass, bit-identical to the 41-tap
      // windowed form (FirKernelsSpec) — same rationale as q_w2
      (s, dir) => graft.operators.SeriesTransforms.applyAll(
        Tables.eventsSeries(s, dir), Seq("user_id"), Seq("ts_ns", "event_id"),
        Seq(graft.operators.SeriesTransforms.savgolSpec("value", "savgol")))
        .select(col("event_id"), round(col("savgol"), 6).as("savgol"))
        .orderBy("event_id"),
      Some {
        val cte = FirKernels.savgolSql(
          "events", Seq("user_id"), Seq("ts, event_id"), "value", "savgol")
        s"""WITH $cte
           |SELECT event_id, round(savgol, 6) AS savgol
           |FROM sg ORDER BY event_id""".stripMargin
      }),

    // R3 — sym4 level-2 wavelet denoising (filters.py:38-60): global
    // per-series transform. ORACLED since r11 (VERDICT r10 next #3):
    // with every detail coefficient zeroed the transform is the pure
    // low-pass dwt-dwt-idwt-idwt chain — four linear convolutions —
    // which Wavelet.denoiseSql mirrors bit-for-bit as DuckDB list
    // lambdas (validated max-abs-err 0.0 vs the Scala kernel across
    // n = 1..1000); WaveletSpec still pins the pywt convention via the
    // published db1 goldens.
    QueryDef(
      "q_r3_wavelet",
      (s, dir) => Wavelet.applySeriesTransform(
        Tables.eventsSeries(s, dir), Seq("user_id"), Seq("ts_ns", "event_id"),
        "value", "denoised")(Wavelet.denoise(_))
        .select(col("event_id"), round(col("denoised"), 6).as("denoised"))
        .orderBy("event_id"),
      Some {
        val cte = Wavelet.denoiseSql(
          "events", "user_id", "ts, event_id", "value", "event_id", "denoised")
        s"""WITH $cte
           |SELECT event_id,
           |       CASE WHEN isnan(denoised) THEN NULL
           |            ELSE round(denoised, 6) END AS denoised
           |FROM wav ORDER BY event_id""".stripMargin
      })
  )
}
