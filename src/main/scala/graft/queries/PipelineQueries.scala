package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{FirKernels, SeriesKernels, Wavelet}
import graft.operators.FrameKernels._
import graft.operators.SeriesKernels._
import graft.sources.Tables

/** E1 — the reference's entire hourly OHLCV DAG as ONE logical plan
  * (SURVEY.md §3 E1, btc_usdt_etl_dag.py:42-229): candle source → 6
  * derived Close series (Kalman, SavGol, wavelet, Gaussian, SMA, SES) →
  * 10 crossover signals ({RSI,BBANDS,MACD,PPO,ADX} × {buy,sell}) → the
  * 22-column projection written by the reference
  * (btc_usdt_etl_dag.py:193-201).
  *
  * The reference runs this as 5 Airflow processes exchanging JSON
  * (fan-out add_features ∥ add_signal then an inner join on Date —
  * SURVEY §3: "the join exists only because of process isolation").
  * Here the whole thing is one Catalyst plan:
  *
  *   bars (1 shuffle: groupBy user,hour) →
  *   window pack (1 shuffle on user reused by EnsureRequirements:
  *     rn, SMA30, Bollinger moments, PPO line) →
  *   one mapPartitions pass for ALL six O(1)-state kernels
  *     (Kalman, SES, RSI, MACD, PPO-EMA, ADX — single KernelSpec list) →
  *   Gaussian / SavGol FIR windows + wavelet series transform →
  *   signal lag-algebra windows → 22-col projection.
  *
  * No joins anywhere — column widening replaces the reference's J1. At
  * 100 TB: everything after the bar aggregation is partitioned by
  * series key; a thousand executors each stream their series once.
  *
  * Oracle: q_e1 hash-matches a composed DuckDB oracle over ALL 22
  * end-to-end output columns (since r11 — the wavelet column's
  * denoise chain is mirrored bit-for-bit by Wavelet.denoiseSql);
  * q_e1b keeps the 21-column variant, and per-kernel oracles (q_r,
  * q_w, q_g families) and PipelineSpec's structural contract stand
  * besides.
  */
object PipelineQueries extends QueryPack {

  private val seriesW = Window.partitionBy(col("user_id")).orderBy(col("bts"))

  /** Per-user hourly OHLCV bars from raw events (X8; volume = event
    * count per bar as the testdata has no size column). */
  private def bars(s: SparkSession, dir: String): DataFrame =
    barsOf(Tables.events(s, dir))

  /** Same bar aggregation over an arbitrary events slice — the E3
    * read-path prune aggregates bars over a `ts_ns`-bounded suffix of
    * the table instead of all of history. */
  private[graft] def barsOf(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), date_trunc("HOUR", col("ts")).as("bts"))
      .agg(
        min_by(col("value"), col("ts_ns")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ts_ns")).as("close"),
        count(lit(1)).cast("double").as("volume"))

  def build(s: SparkSession, dir: String): DataFrame =
    buildCore(s, dir, includeWavelet = true)

  /** The E1 DAG with the wavelet column optional: q_e1 ships all 22
    * columns (wavelet has no SQL mirror — rows-only + WaveletSpec);
    * q_e1b drops ONLY that column so the other 21 end-to-end columns
    * hash-verify against the composed DuckDB oracle (VERDICT r4 #7). */
  private def buildCore(s: SparkSession, dir: String, includeWavelet: Boolean): DataFrame = {
    // ---- ONE fused object-land pass: every series computation — the six
    // O(1)-state recursive kernels, the decimal frame kernels (SMA30,
    // Bollinger(20,2), PPO line — r4: formerly a WindowExec pack whose
    // sliding decimal aggregates re-summed each frame per row, the
    // pipeline's hottest stage; the ring kernels are bit-identical per
    // DecFrameParitySpec), and the three whole-series smoothers
    // (Gaussian, SavGol, wavelet) — runs over each buffered series in a
    // single shuffle+sort. Interleaving these as separate window/
    // mapPartitions stages re-exchanges on user_id at every serialize
    // fence (measured 11 exchanges vs 4 for this plan). Only the
    // crossover lag algebra stays windowed (offset frames are O(1)).
    import graft.operators.DecFrameKernels.{BollingerKernel, PpoLineKernel, SmaDecKernel}
    import graft.operators.SeriesTransforms
    import graft.operators.SeriesTransforms._
    // PPO + its EMA(9) signal chained inside one composite spec (the EMA
    // consumes the PPO array directly — kernel outputs aren't visible as
    // input columns within a single fused pass)
    val ppoWithSignal = SeriesTransformSpec(Seq("close"), Seq("ppo", "ppo_ema"), { ins =>
      val ppoK = new PpoLineKernel()
      ppoK.reset()
      val ppo = ins(0).map(z => ppoK.step(Array(z))(0))
      val emaK = new EmaKernel(9)
      emaK.reset()
      val ema = ppo.map(p => emaK.step(Array(p))(0))
      Array(ppo, ema)
    })
    val withWavelet = SeriesTransforms.applyAll(
      bars(s, dir), Seq("user_id"), Seq("bts"),
      Seq(
        fromKernel(KernelSpec(Seq("close"), Seq("close_kalman"), () => new KalmanKernel())),
        fromKernel(KernelSpec(Seq("close"), Seq("close_ses"), () => new SesKernel())),
        fromKernel(KernelSpec(Seq("close"), Seq("rsi"), () => new RsiKernel())),
        fromKernel(KernelSpec(Seq("close"), Seq("macd", "macd_sig", "macd_hist"),
          () => new MacdKernel())),
        fromKernel(KernelSpec(Seq("close"), Seq("close_sma"), () => new SmaDecKernel(30))),
        fromKernel(KernelSpec(Seq("close"), Seq("bb_mid", "bb_up", "bb_lo"),
          () => new BollingerKernel(20, 2.0))),
        ppoWithSignal,
        fromKernel(KernelSpec(Seq("high", "low", "close"),
          Seq("plus_di", "minus_di", "adx"), () => new AdxKernel())),
        gaussianSpec("close", "close_gauss"),
        savgolSpec("close", "close_savgol")) ++
        (if (includeWavelet) Seq(waveletSpec("close", "close_wavelet")) else Nil))

    // ---- crossover signal algebra (G1-G5)
    withWavelet
      .withColumn("rsi_buy", crossAbove(col("rsi"), lit(30.0), seriesW))
      .withColumn("rsi_sell", crossBelow(col("rsi"), lit(70.0), seriesW))
      .withColumn("bbands_buy", crossBelow(col("close"), col("bb_lo"), seriesW))
      .withColumn("bbands_sell", crossAbove(col("close"), col("bb_up"), seriesW))
      .withColumn("macd_buy", crossAbove(col("macd"), col("macd_sig"), seriesW))
      .withColumn("macd_sell", crossBelow(col("macd"), col("macd_sig"), seriesW))
      .withColumn("ppo_buy", crossAbove(col("ppo"), col("ppo_ema"), seriesW))
      .withColumn("ppo_sell", crossBelow(col("ppo"), col("ppo_ema"), seriesW))
      .withColumn("adx_buy",
        coalesce(lag(col("plus_di"), 1).over(seriesW) < lag(col("minus_di"), 1).over(seriesW)
          && col("plus_di") > col("minus_di") && col("adx") > 25.0, lit(false)))
      .withColumn("adx_sell",
        coalesce(lag(col("minus_di"), 1).over(seriesW) < lag(col("plus_di"), 1).over(seriesW)
          && col("minus_di") > col("plus_di") && col("adx") > 25.0, lit(false)))
      // ---- the reference's 22-column write schema (P1/P2 rename applied)
      .select((Seq(
        col("user_id"),
        date_format(col("bts"), "yyyy-MM-dd HH:mm:ss").as("date"),
        col("open"), col("high"), col("low"), col("close"), col("volume"),
        round(col("close_kalman"), 6).as("close_kalman_filter"),
        round(col("close_savgol"), 6).as("close_savitzky_golay_filter")) ++
        (if (includeWavelet)
          Seq(round(col("close_wavelet"), 6).as("close_wavelet_filter"))
         else Nil) ++ Seq(
        round(col("close_gauss"), 6).as("close_gaussian_smoothing"),
        round(col("close_sma"), 6).as("close_sma_smoothing"),
        round(col("close_ses"), 6).as("close_exponential_smoothing"),
        col("rsi_buy").as("rsi_buy_signal"), col("rsi_sell").as("rsi_sell_signal"),
        col("bbands_buy").as("bbands_buy_signal"), col("bbands_sell").as("bbands_sell_signal"),
        col("macd_buy").as("macd_buy_signal"), col("macd_sell").as("macd_sell_signal"),
        col("ppo_buy").as("ppo_buy_signal"), col("ppo_sell").as("ppo_sell_signal"),
        col("adx_buy").as("adx_buy_signal"), col("adx_sell").as("adx_sell_signal"))): _*)
      .orderBy("user_id", "date")
  }

  /** Composed end-to-end oracle for the E1 DAG (VERDICT r4 next #7;
    * r11 closes the last column): every kernel's existing
    * recursive-CTE / frame oracle re-instantiated over the bars series
    * and joined back on (user_id, rn). With `includeWavelet` the sym4
    * denoise chain ([[graft.operators.Wavelet.denoiseSql]], bit-parity
    * validated) mirrors the 22nd column too, so q_e1 itself
    * hash-matches end to end; q_e1b keeps the 21-column form as the
    * historical witness.
    *
    * Every CTE head is forced `AS MATERIALIZED` ([[OracleSql]], VERDICT
    * r13 next #2): without it DuckDB inlines `dxt`/`di` into the rec2
    * recursion step (the whole rec1 chain re-runs per iteration) and the
    * oracle costs ~180 s at sf0.01; materialized it runs in ~2 s,
    * hash-identical. The names are explicit because the SQL carries
    * WINDOW clauses (`pf12`/`f29`/`w`) whose definitions share the
    * `name AS (` token shape and must not be rewritten. */
  private def e1CteHeads(includeWavelet: Boolean): Set[String] =
    Set("bars", "s", "sv", "krec", "serec", "rrec", "rsiv", "mrec",
      "macdv", "ppos", "prec", "rec1", "di", "dxt", "rec2", "frame",
      "bands", "gbase", "gpadded", "gconv", "vbase", "vsg", "joined") ++
      (if (includeWavelet) Set("ser", "w1", "w2", "r1", "r1a", "r0", "wav")
       else Set.empty)

  private def e1Oracle(includeWavelet: Boolean): String = {
    import RecursiveKernelQueries.{adxRecCtes, kalmanRec, macdRec, ppoRec, rsiRec, rsiValExpr, sesRec}
    val raw = s"""WITH RECURSIVE bars AS (
       |  SELECT user_id, date_trunc('hour', ts) AS bts,
       |         arg_min(value, ts) AS open, max(value) AS high,
       |         min(value) AS low, arg_max(value, ts) AS close,
       |         CAST(count(*) AS DOUBLE) AS volume
       |  FROM events GROUP BY user_id, date_trunc('hour', ts)),
       |s AS (
       |  SELECT user_id, bts, open, high, low, close, volume,
       |         row_number() OVER (PARTITION BY user_id ORDER BY bts) AS rn
       |  FROM bars),
       |sv AS (SELECT user_id, rn AS event_id, rn, close AS value FROM s),
       |${kalmanRec("sv", "krec")},
       |${sesRec("sv", "serec")},
       |${rsiRec("sv", "rrec")},
       |rsiv AS (SELECT user_id, rn, $rsiValExpr AS rsi FROM rrec),
       |${macdRec("sv", "mrec")},
       |macdv AS (SELECT user_id, rn,
       |            CASE WHEN rn >= 34 THEN ema12 - ema26 END AS macd,
       |            CASE WHEN rn >= 34 THEN sig END AS macd_sig
       |          FROM mrec),
       |ppos AS (
       |  SELECT user_id, rn AS event_id, rn,
       |         CASE WHEN rn >= 26 THEN (sma12 - sma26) / sma26 * 100.0 END AS ppo
       |  FROM (SELECT user_id, rn,
       |               CAST(sum(CAST(close AS DECIMAL(18,6))) OVER pf12 AS DOUBLE) / 12.0 AS sma12,
       |               CAST(sum(CAST(close AS DECIMAL(18,6))) OVER pf26 AS DOUBLE) / 26.0 AS sma26
       |        FROM s
       |        WINDOW pf12 AS (PARTITION BY user_id ORDER BY rn ROWS BETWEEN 11 PRECEDING AND CURRENT ROW),
       |               pf26 AS (PARTITION BY user_id ORDER BY rn ROWS BETWEEN 25 PRECEDING AND CURRENT ROW)) t),
       |${ppoRec("ppos", "prec")},
       |${adxRecCtes("s")},
       |frame AS (
       |  SELECT user_id, rn,
       |         CAST(sum(CAST(close AS DECIMAL(18,6))) OVER f29 AS DOUBLE)
       |           / CAST(count(close) OVER f29 AS DOUBLE) AS sma30,
       |         CAST(sum(CAST(close AS DECIMAL(18,6))) OVER f19 AS DOUBLE)
       |           / CAST(count(close) OVER f19 AS DOUBLE) AS mean,
       |         CAST(sum(CAST(close * close AS DECIMAL(28,10))) OVER f19 AS DOUBLE)
       |           / CAST(count(close) OVER f19 AS DOUBLE) AS meansq
       |  FROM s
       |  WINDOW f29 AS (PARTITION BY user_id ORDER BY rn ROWS BETWEEN 29 PRECEDING AND CURRENT ROW),
       |         f19 AS (PARTITION BY user_id ORDER BY rn ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
       |bands AS (
       |  SELECT user_id, rn, sma30,
       |         CASE WHEN rn >= 20 THEN mean END AS bb_mid,
       |         CASE WHEN rn >= 20 THEN mean + 2.0 * sqrt(meansq - mean * mean) END AS bb_up,
       |         CASE WHEN rn >= 20 THEN mean - 2.0 * sqrt(meansq - mean * mean) END AS bb_lo
       |  FROM frame),
       |${FirKernels.gaussianSql("bars", Seq("user_id"), Seq("bts"), "close",
            "close_gauss", Seq("user_id", "bts"), "g")},
       |${FirKernels.savgolSql("bars", Seq("user_id"), Seq("bts"), "close",
            "close_savgol", "v")},
       |${if (includeWavelet)
            graft.operators.Wavelet.denoiseSql(
              "s", "user_id", "bts", "close", "rn", "wv") + ","
          else ""}
       |joined AS (
       |  SELECT s.user_id, s.bts, s.rn, s.open, s.high, s.low, s.close, s.volume,
       |         k.x AS kal, se.f AS ses, rv.rsi,
       |         mv.macd, mv.macd_sig,
       |         p.ppo, p.ema AS ppo_ema,
       |         a.pdi, a.mdi, a.adx,
       |         b.sma30, b.bb_mid, b.bb_up, b.bb_lo,
       |         g.close_gauss, v.close_savgol${
            if (includeWavelet) ", wv0.wv AS close_wav" else ""}
       |  FROM s
       |  JOIN krec k ON k.user_id = s.user_id AND k.rn = s.rn
       |  JOIN serec se ON se.user_id = s.user_id AND se.rn = s.rn
       |  JOIN rsiv rv ON rv.user_id = s.user_id AND rv.rn = s.rn
       |  JOIN macdv mv ON mv.user_id = s.user_id AND mv.rn = s.rn
       |  JOIN prec p ON p.user_id = s.user_id AND p.rn = s.rn
       |  JOIN rec2 a ON a.user_id = s.user_id AND a.rn = s.rn
       |  JOIN bands b ON b.user_id = s.user_id AND b.rn = s.rn
       |  JOIN gconv g ON g.user_id = s.user_id AND g.bts = s.bts
       |                AND g.pos >= 0 AND g.pos < g.n
       |  JOIN vsg v ON v.user_id = s.user_id AND v.bts = s.bts${
            if (includeWavelet)
              "\n  JOIN wav wv0 ON wv0.user_id = s.user_id AND wv0.rn = s.rn"
            else ""})
       |SELECT user_id,
       |       strftime(bts, '%Y-%m-%d %H:%M:%S') AS date,
       |       open, high, low, close, volume,
       |       round(kal, 6) AS close_kalman_filter,
       |       round(close_savgol, 6) AS close_savitzky_golay_filter,${
            if (includeWavelet)
              "\n       CASE WHEN isnan(close_wav) THEN NULL ELSE round(close_wav, 6) END AS close_wavelet_filter,"
            else ""}
       |       round(close_gauss, 6) AS close_gaussian_smoothing,
       |       round(sma30, 6) AS close_sma_smoothing,
       |       round(ses, 6) AS close_exponential_smoothing,
       |       coalesce(lag(rsi) OVER w < 30.0 AND rsi > 30.0, false) AS rsi_buy_signal,
       |       coalesce(lag(rsi) OVER w > 70.0 AND rsi < 70.0, false) AS rsi_sell_signal,
       |       coalesce(lag(close) OVER w > lag(bb_lo) OVER w AND close < bb_lo, false) AS bbands_buy_signal,
       |       coalesce(lag(close) OVER w < lag(bb_up) OVER w AND close > bb_up, false) AS bbands_sell_signal,
       |       coalesce(lag(macd) OVER w < lag(macd_sig) OVER w AND macd > macd_sig, false) AS macd_buy_signal,
       |       coalesce(lag(macd) OVER w > lag(macd_sig) OVER w AND macd < macd_sig, false) AS macd_sell_signal,
       |       coalesce(lag(ppo) OVER w < lag(ppo_ema) OVER w AND ppo > ppo_ema, false) AS ppo_buy_signal,
       |       coalesce(lag(ppo) OVER w > lag(ppo_ema) OVER w AND ppo < ppo_ema, false) AS ppo_sell_signal,
       |       coalesce(lag(pdi) OVER w < lag(mdi) OVER w AND pdi > mdi AND adx > 25.0, false) AS adx_buy_signal,
       |       coalesce(lag(mdi) OVER w < lag(pdi) OVER w AND mdi > pdi AND adx > 25.0, false) AS adx_sell_signal
       |FROM joined
       |WINDOW w AS (PARTITION BY user_id ORDER BY rn)
       |ORDER BY user_id, date""".stripMargin
    OracleSql.materialize(raw, e1CteHeads(includeWavelet))
  }

  /** E2 — the reference's hourly news ETL DAG as ONE composed logical
    * plan (SURVEY.md §3 E2, news_etl_dag.py:34-185): fetch → HTML strip
    * (clean_html, lines 65-67) → title_and_description assembly (line
    * 80) → 5-model × 2-field scoring fan-out with the per-row LLM
    * fallback channel (semantic_analysis, lines 100-115) → dedup →
    * keyed upsert projection (save_to_qdrant, lines 142-183).
    *
    * Every stage is an individually-oracled operator (q_t1b, q_t2,
    * q_m3/q_m4, q_a1/X3, K2); this query proves their COMPOSITION as one
    * DAG, the same way q_e1b does for the OHLCV pipeline.
    *
    * Two deliberate divergences from the reference, both fixes:
    *  - the reference keys Qdrant points by uuid4 (line 147), so its
    *    24h+1h fetch window re-inserts yesterday's articles forever (the
    *    X3 duplicate-accumulation bug SURVEY §2.7 documents). Here the
    *    hourly re-fetch overlap is MODELED (batch 2 re-delivers a third
    *    of the corpus) and deduped content-first: newest fetch wins per
    *    content fingerprint — `n_dups` counts the collapsed copies and
    *    `fetch_kept` proves newest-wins. NewsPipelineSpec runs the same
    *    composition through foreachBatch + Sinks.upsertByKey (the write
    *    path; a query returns rows, not side effects).
    *  - the per-article HTTP scoring loop becomes a map-only fan-out
    *    (one projection, q_m4's shape).
    *
    * Scale: strip/score/embed are narrow codegen'd expressions riding
    * the scan; the only data shuffles are the fingerprint window and the
    * final ORDER BY — the plan at 100 TB is the plan at sf0.01. The
    * corpus carries no markup (checked: no '<', '>', '&' at any SF), so
    * wrapping in adversarial markup keeps the parser honest while the
    * oracle re-derives the clean text analytically (q_t1b's trick).
    */
  /** The E2 front shared by both exchange-width shapes: union-fetch +
    * parser-exact strip + title/description assembly. */
  private def e2Articles(s: SparkSession, dir: String): DataFrame = {
    // fetch stand-in (S6): two overlapping hourly fetches — the 24h+1h
    // window (news_etl_dag.py:38) re-delivers recent articles
    val docs = Tables.documents(s, dir)
    val b1 = docs.withColumn("fetch_id", lit(1L))
    val b2 = docs.filter(col("doc_id") % 3 === 0).withColumn("fetch_id", lit(2L))
    // process_data: parser-exact HTML strip of content + the
    // title_and_description concat
    b1.unionByName(b2)
      .withColumn("content", call_function("graft_html_strip", concat(
        lit("<article data-x=\"a>b\"><script>if (1 < 2) { t(\"<p>x</p>\"); }</script>"),
        col("text"), lit("</article>"))))
      .withColumn("title_desc", call_function("graft_html_strip", concat(
        lit("<h1 class=\"t\">"),
        concat_ws(" ", col("source"), col("lang"), substring(col("text"), 1, 30)),
        lit("</h1><!-- meta > -->"))))
  }

  /** Registered q_e2 shape (strip-first / narrow-exchange, r18): the
    * content strip runs BEFORE the dedup window because the fingerprint
    * needs it, but everything the survivors can re-derive is dropped
    * from the exchange — `text` (superseded by `content`) and
    * `title_desc` (re-derived post-dedup from source/lang + a 30-char
    * `head30` column) never cross. The one data exchange carries ONE
    * document-sized string instead of the three the r17 shape shuffled,
    * and scoring (field stats → 5-model × 2-field fan-out → embedding)
    * runs on the N survivors, not the 1.33N pre-dedup rows. This
    * dominates the r17 wide shape on both axes (less shuffle AND less
    * compute: the title strip moves from 1.33N pre-window rows to N
    * survivors) and beats the pure scalar-first variant at every
    * measured tier (scalar-first pays stats/scores on dup rows —
    * measured +30-40% at ×50 where compute dominates the cheap local
    * shuffle). Same rows, same expressions, same oracle — hash-parity
    * pinned by the unchanged e2Oracle and NewsPipelineSpec. */
  private def e2Build(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Scorers
    import graft.operators.Scorers._
    import graft.operators.TextOps._
    val docs = Tables.documents(s, dir)
    val b1 = docs.withColumn("fetch_id", lit(1L))
    val b2 = docs.filter(col("doc_id") % 3 === 0).withColumn("fetch_id", lit(2L))
    // process_data front: parser-exact HTML strip of content (the
    // fingerprint input), then PRUNE — text is superseded by content,
    // and the title needs only source/lang + the first 30 chars
    val narrow = b1.unionByName(b2)
      .withColumn("content", call_function("graft_html_strip", concat(
        lit("<article data-x=\"a>b\"><script>if (1 < 2) { t(\"<p>x</p>\"); }</script>"),
        col("text"), lit("</article>"))))
      .select(col("doc_id"), col("source"), col("lang"), col("fetch_id"),
        col("content"), substring(col("text"), 1, 30).as("head30"))
    // dedup-on-write (the X3 fix): newest fetch wins per content print
    val byFp = Window.partitionBy("fp")
    val deduped = narrow
      .withColumn("fp", md5(normalizeText(col("content")).cast("binary")))
      .withColumn("best_fetch", max(col("fetch_id")).over(byFp))
      .withColumn("n_dups", count(lit(1)).over(byFp))
      .filter(col("fetch_id") === col("best_fetch"))
      // title_and_description assembly, re-derived on the survivors
      .withColumn("title_desc", call_function("graft_html_strip", concat(
        lit("<h1 class=\"t\">"),
        concat_ws(" ", col("source"), col("lang"), col("head30")),
        lit("</h1><!-- meta > -->"))))
    // semantic_analysis: M4 fan-out with M3's per-row fallback channel
    // r7: the whole fan-out reads from TWO single-pass fused stats
    // structs (pos/neg/hash/th per field — functions.FieldStats); the
    // old shape re-traversed content ~3× through regex normalizes
    // (VERDICT r6 wrong #1, the ×10-scale outlier)
    val withC = Scorers.withFieldStats(deduped, "c", col("content"), keepTh = true)
    val withT = Scorers.withFieldStats(withC, "t", col("title_desc"))
    withT
      .withColumn("th", col("c_th"))
      .withColumn("raw", rawEmbeddingFromHashes(col("th"), 16))
      .withColumn("n", l2Norm(col("raw")))
      .select(
        Seq(col("doc_id"), col("source"), col("fetch_id").as("fetch_kept"),
          col("n_dups")) ++
        Models.flatMap(m =>
          ScorerQueries.modelCols(m, "c", s"${m.name}_content") ++
          ScorerQueries.modelCols(m, "t", s"${m.name}_title")) ++
        Seq(
          round(when(col("n") > 0.0, element_at(col("raw"), 1) / col("n"))
            .otherwise(element_at(col("raw"), 1)), 6).as("emb_head"),
          lit(16).as("emb_dim")): _*)
      .orderBy("doc_id")
  }

  /** The r18 pure scalar-first E2 variant, kept for the same-run Decomp
    * comparison: EVERY per-row scalar (strip → stats → scores →
    * embedding head) computes before the dedup window, so the exchange
    * carries fixed-width columns only — at the price of scoring the
    * 1.33N pre-dedup rows. Measured ~30-40% WORSE than the registered
    * strip-first shape at ×50 (compute dominates the cheap local
    * shuffle); would reconsider only on a network-shuffle cluster where
    * bytes beat CPU. */
  private[graft] def e2ScalarFirst(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Scorers
    import graft.operators.Scorers._
    import graft.operators.TextOps._
    val articles = e2Articles(s, dir)
    val withC = Scorers.withFieldStats(articles, "c", col("content"), keepTh = true)
    val withT = Scorers.withFieldStats(withC, "t", col("title_desc"))
    val scored = withT
      .withColumn("fp", md5(normalizeText(col("content")).cast("binary")))
      .withColumn("th", col("c_th"))
      .withColumn("raw", rawEmbeddingFromHashes(col("th"), 16))
      .withColumn("n", l2Norm(col("raw")))
      .select(
        Seq(col("doc_id"), col("source"), col("fetch_id"), col("fp")) ++
        Models.flatMap(m =>
          ScorerQueries.modelCols(m, "c", s"${m.name}_content") ++
          ScorerQueries.modelCols(m, "t", s"${m.name}_title")) ++
        Seq(
          round(when(col("n") > 0.0, element_at(col("raw"), 1) / col("n"))
            .otherwise(element_at(col("raw"), 1)), 6).as("emb_head"),
          lit(16).as("emb_dim")): _*)
    val byFp = Window.partitionBy("fp")
    scored
      .withColumn("best_fetch", max(col("fetch_id")).over(byFp))
      .withColumn("n_dups", count(lit(1)).over(byFp))
      .filter(col("fetch_id") === col("best_fetch"))
      .withColumnRenamed("fetch_id", "fetch_kept")
      .drop("fp", "best_fetch")
      .orderBy("doc_id")
  }

  /** The r17 wide-exchange E2 shape, kept for the same-run Decomp
    * comparison that justified the scalar-first swap (and as the
    * reference point its floor note cites). Dedup window FIRST over the
    * full article rows — the exchange carries text + content +
    * title_desc — then stats/scores over the survivors.
    *
    * Historical shape note (measured at 10× sf0.1): the window
    * exchanges the wide article rows once (~4 s of 9.6 s) — and the
    * "narrower" groupBy + join-back alternative is WORSE (22.7 s):
    * feeding the stripped columns into two join branches clones the
    * HtmlStrip subtree into every consumer (10 strip instances in the
    * optimized plan vs 2), because without the exchange barrier
    * project-collapse re-inlines the expression per use. The
    * scalar-first registered shape escapes the dilemma a third way:
    * one linear projection, no second branch, narrow exchange. */
  private[graft] def e2WideExchange(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Scorers
    import graft.operators.Scorers._
    import graft.operators.TextOps._
    val articles = e2Articles(s, dir)
    val byFp = Window.partitionBy("fp")
    val deduped = articles
      .withColumn("fp", md5(normalizeText(col("content")).cast("binary")))
      .withColumn("best_fetch", max(col("fetch_id")).over(byFp))
      .withColumn("n_dups", count(lit(1)).over(byFp))
      .filter(col("fetch_id") === col("best_fetch"))
    val withC = Scorers.withFieldStats(deduped, "c", col("content"), keepTh = true)
    val withT = Scorers.withFieldStats(withC, "t", col("title_desc"))
    withT
      .withColumn("th", col("c_th"))
      .withColumn("raw", rawEmbeddingFromHashes(col("th"), 16))
      .withColumn("n", l2Norm(col("raw")))
      .select(
        Seq(col("doc_id"), col("source"), col("fetch_id").as("fetch_kept"),
          col("n_dups")) ++
        Models.flatMap(m =>
          ScorerQueries.modelCols(m, "c", s"${m.name}_content") ++
          ScorerQueries.modelCols(m, "t", s"${m.name}_title")) ++
        Seq(
          round(when(col("n") > 0.0, element_at(col("raw"), 1) / col("n"))
            .otherwise(element_at(col("raw"), 1)), 6).as("emb_head"),
          lit(16).as("emb_dim")): _*)
      .orderBy("doc_id")
  }

  /** Composed DuckDB oracle for q_e2: union-fetch → analytic strip →
    * fingerprint dedup window → q_m4's counts/embs CTEs. */
  private val e2Oracle: String = {
    import graft.operators.Scorers._
    import graft.operators.TextOps._
    val sel = Models.flatMap(m =>
      ScorerQueries.modelSql(m, "pc", "nc", "hc", s"${m.name}_content") ++
      ScorerQueries.modelSql(m, "pt", "nt", "ht", s"${m.name}_title"))
    s"""WITH articles AS (
       |  SELECT doc_id, source, lang, text, CAST(1 AS BIGINT) AS fetch_id
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id, source, lang, text, CAST(2 AS BIGINT) AS fetch_id
       |  FROM documents WHERE doc_id % 3 = 0
       |), fields AS (
       |  SELECT doc_id, source, fetch_id,
       |         trim(regexp_replace(text, '\\s+', ' ', 'g')) AS content,
       |         trim(regexp_replace(
       |           concat_ws(' ', source, lang, substring(text, 1, 30)),
       |           '\\s+', ' ', 'g')) AS title_desc
       |  FROM articles
       |), dedup AS (
       |  SELECT doc_id, source, fetch_id, n_dups, content, title_desc FROM (
       |    SELECT f.*,
       |           max(fetch_id) OVER (PARTITION BY fp) AS best_fetch,
       |           count(*) OVER (PARTITION BY fp) AS n_dups
       |    FROM (SELECT ff.*, md5(${normalizeTextSql("content")}) AS fp
       |          FROM fields ff) f) x
       |  WHERE fetch_id = best_fetch
       |), counts AS (
       |  SELECT doc_id, source, fetch_id, n_dups,
       |         ${posCountSql("toks_c")} AS pc, ${negCountSql("toks_c")} AS nc,
       |         ${posCountSql("toks_t")} AS pt, ${negCountSql("toks_t")} AS nt,
       |         hc, ht, th
       |  FROM (SELECT doc_id, source, fetch_id, n_dups,
       |               ${tokensSql(normalizeTextSql("content"))} AS toks_c,
       |               ${tokensSql(normalizeTextSql("title_desc"))} AS toks_t,
       |               ${polyHashSql(normalizeTextSql("content"))} AS hc,
       |               ${polyHashSql(normalizeTextSql("title_desc"))} AS ht,
       |               ${tokenHashesSql("content")} AS th
       |        FROM dedup) t
       |), embs AS (
       |  SELECT doc_id, raw,
       |         sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |           list_transform(raw, v -> v * v)), (x, y) -> x + y)) AS n
       |  FROM (SELECT doc_id, ${hashEmbeddingRawSql("th", 16)} AS raw FROM counts) r
       |)
       |SELECT ${("counts.doc_id" +: "source" +: "fetch_id AS fetch_kept" +:
                  "n_dups" +: sel).mkString(",\n       ")},
       |       round(CASE WHEN embs.n > 0.0 THEN raw[1] / embs.n ELSE raw[1] END, 6) AS emb_head,
       |       16 AS emb_dim
       |FROM counts JOIN embs ON counts.doc_id = embs.doc_id
       |ORDER BY counts.doc_id""".stripMargin
  }

  // ---- E3 read-path prune (VERDICT r11 next #1) -----------------------
  //
  // The dashboard query answers a 240-hour window, but its kernel input
  // is a ROW-framed BBANDS(20) + lag(1) crossover — so the bars it
  // actually needs are the in-window bars plus the 20 bars immediately
  // preceding each user's first in-window bar (the lag row's own
  // 19-preceding frame is a subset of those). Everything older is
  // scanned, aggregated and kerneled only to be thrown away by the
  // window filter — at 100 TB that's the difference between reading ten
  // days and reading years. The reference's own DAG reads a fixed
  // 299-row lookback for the same reason (btc_usdt_etl_dag.py:31).
  //
  // The prune is the IncrementalTick tail-read pattern: a raw `ts_ns`
  // lower bound (a parquet PushedFilter → row-group min/max pruning,
  // same as q_s4) chosen adaptively — start at 2× the warmup span and
  // DOUBLE until every user with an in-window bar has ≥ 20 bar buckets
  // before the window start, or the bound passes the table's oldest
  // row (then the "slice" is all of history and pruning simply wasn't
  // possible — correct, never worse than the unpruned plan). A fixed
  // time pad would silently under-cover series sparser than hourly;
  // the row-exact check makes the pruned plan bit-identical to the
  // full-history one (E3PruneSpec pins parity on a deliberately sparse
  // series plus the PushedFilters plan shape).
  //
  // The chosen bounds are memoized per (session, table dir) — the probe
  // jobs (hour-bucket distinct over the slice; max/min ts_ns column
  // scans) run once per session, not once per fresh lineage, mirroring
  // the Tables catalog contract.
  private val HourNs = 3600L * 1000000000L
  private val E3WindowHours = 240L

  /** Bars of warmup needed before the window: the first in-window row's
    * crossover lags the BBANDS column by 1, and that lag row's
    * Bollinger frame reaches 19 further back ⇒ 20 bars. */
  private[graft] val E3WarmupBars = 20

  private[graft] case class E3Bounds(winStartNs: Long, boundNs: Long)

  private val e3BoundsCache =
    new java.util.LinkedHashMap[(String, String), E3Bounds](16, 0.75f, true) {
      override def removeEldestEntry(
          eldest: java.util.Map.Entry[(String, String), E3Bounds]): Boolean =
        size() > 64
    }

  private def tsLit(ns: Long): Column =
    lit(java.time.Instant.ofEpochSecond(Math.floorDiv(ns, 1000000000L)))

  private[graft] def e3Bounds(s: SparkSession, dir: String): Option[E3Bounds] = {
    val key = (graft.GraftSession.sessionUuid(s), dir)
    e3BoundsCache.synchronized(Option(e3BoundsCache.get(key))).orElse {
      val ev = Tables.events(s, dir)
      val mxRow = ev.agg(max(col("ts_ns"))).first()
      if (mxRow.isNullAt(0)) None // empty table: nothing to prune
      else {
        val winStartNs =
          Math.floorDiv(mxRow.getLong(0), HourNs) * HourNs -
            E3WindowHours * HourNs
        val winStart = tsLit(winStartNs)
        var minNs = Long.MinValue
        var haveMin = false
        var padHours = 2L * E3WarmupBars
        var out: E3Bounds = null
        while (out == null) {
          val boundNs = winStartNs - padHours * HourNs
          if (haveMin && boundNs <= minNs) out = E3Bounds(winStartNs, boundNs)
          else {
            // bar-bucket coverage probe: hour-distinct is enough (warmup
            // is counted in bars, not rows) and far narrower than the
            // full OHLCV aggregation
            val deficient = Tables.eventsFrom(s, dir, boundNs)
              .select(col("user_id"), date_trunc("HOUR", col("ts")).as("bts"))
              .distinct()
              .groupBy(col("user_id"))
              .agg(
                count(when(col("bts") < winStart, 1)).as("warm"),
                max(col("bts")).as("mx"))
              .filter(col("mx") >= winStart && col("warm") < E3WarmupBars)
            if (deficient.isEmpty) out = E3Bounds(winStartNs, boundNs)
            else {
              if (!haveMin) {
                minNs = ev.agg(min(col("ts_ns"))).first().getLong(0)
                haveMin = true
              }
              if (boundNs <= minNs) out = E3Bounds(winStartNs, boundNs)
              else padHours *= 2
            }
          }
        }
        e3BoundsCache.synchronized(e3BoundsCache.put(key, out))
        Some(out)
      }
    }
  }

  /** Shared E3 tail: bands + crossovers over a bar series, then the
    * signal filter and marker projection. */
  private def signalCore(b: DataFrame): DataFrame =
    SeriesKernels.applyKernels(
        b, Seq("user_id"), Seq("bts"),
        Seq(KernelSpec(Seq("close"), Seq("bb_mid", "bb_up", "bb_lo"),
          () => new graft.operators.DecFrameKernels.BollingerKernel(20, 2.0))))
      .withColumn("buy", crossBelow(col("close"), col("bb_lo"), seriesW))
      .withColumn("sell", crossAbove(col("close"), col("bb_up"), seriesW))

  private def signalSelect(df: DataFrame): DataFrame =
    df.filter(col("buy") || col("sell"))
      .select(
        col("user_id"),
        date_format(col("bts"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("buy"), col("sell"),
        round(col("open") - col("open") * 0.01, 6).as("marker_lo"),
        round(col("close") + col("close") * 0.01, 6).as("marker_hi"))
      // total order WITHOUT a range exchange: the signal set is tiny by
      // construction (crossover rows within a 240-hour window — bounded
      // by bars, not events), but `orderBy` plans RangePartitioning
      // whose bound-sampling pass RE-EXECUTES the whole post-shuffle
      // stage (agg+kernel+filter) once more just to sample a few
      // hundred rows. Measured at the x5 replica (r16, noop sink,
      // best-of-3): orderBy 0.883s vs repartition(1)+sort 0.495s — the
      // sample pass was the plan's single biggest stage. A one-task
      // sort over a provably small filtered result is NOT the q_a2
      // anti-pattern (there the output is every input row); this is
      // the dashboard read path returning marker rows.
      .repartition(1)
      .sortWithinPartitions("user_id", "bucket")

  /** Both E3 shapes, selected by `prune` (exposed so E3PruneSpec can pin
    * bit-parity AND the pruned scan shape). prune=false is the pre-r12
    * full-history plan kept as the parity witness. */
  private[graft] def signalOverlay(
      s: SparkSession, dir: String, prune: Boolean): DataFrame =
    (if (prune) e3Bounds(s, dir) else None) match {
      case Some(bd) =>
        // ONE data exchange: hash-partition the slice by user_id up
        // front — HashPartitioning(user_id) satisfies the bar agg's
        // ClusteredDistribution(user_id, bts) (subset rule), the bar
        // aggregate preserves it, and the fused band+crossover ring
        // kernel (BollingerCrossKernel) consumes it via
        // `prePartitioned = true`, so bands AND both lag signals run in
        // one sorted mapPartitions pass with no Window operator and no
        // second exchange. At this query's constant post-prune volume
        // the plan is stage-latency-bound, so exchange count IS the
        // cost: scan → exchange(user_id) → agg+kernel+filter →
        // tiny result-sort exchange.
        val slice = Tables.eventsFrom(s, dir, bd.boundNs)
          .repartition(col("user_id"))
        signalSelect(SeriesKernels.applyKernels(
            barsOf(slice), Seq("user_id"), Seq("bts"),
            Seq(KernelSpec(Seq("close"),
              Seq("bb_mid", "bb_up", "bb_lo", "buy_d", "sell_d"),
              () => new graft.operators.DecFrameKernels.BollingerCrossKernel(20, 2.0))),
            prePartitioned = true)
          .withColumn("buy", col("buy_d") === 1.0)
          .withColumn("sell", col("sell_d") === 1.0)
          // drop the warmup bars AFTER the band/lag algebra — they exist
          // only to make the window-edge values exact
          .filter(col("bts") >= tsLit(bd.winStartNs)))
      case None =>
        // max bar bucket == hour-trunc of the max raw timestamp: a
        // column-pruned scan with partial max per partition — no reason
        // to recompute the whole bar aggregation (it cost this plan a
        // second groupBy exchange subtree)
        val mx = Tables.events(s, dir)
          .agg(date_trunc("HOUR", max(col("ts"))).as("mx_bts"))
        signalSelect(signalCore(bars(s, dir))
          .crossJoin(broadcast(mx))
          .filter(col("bts") >= col("mx_bts") - expr("INTERVAL 240 HOURS")))
    }

  override def queries: Seq[QueryDef] = Seq(
    // E1 — fully oracled since r11: the wavelet denoise chain gained a
    // bit-parity DuckDB mirror (Wavelet.denoiseSql), so all 22
    // end-to-end columns hash-match.
    QueryDef("q_e1_ohlcv_pipeline", build, Some(e1Oracle(true)),
      bench = true),

    // E2 — news strip → score fan-out → dedup → upsert projection as one
    // composed, fully-oracled plan (the last reference entry point
    // without one, VERDICT r5 next #1).
    QueryDef("q_e2_news_pipeline", e2Build, Some(e2Oracle), bench = true),

    // E1b — the SAME end-to-end DAG minus the wavelet column: the
    // 21-column composed oracle that carried E1 correctness through
    // rounds 4-10, kept as the variant witness (it also pins that
    // dropping a series transform changes nothing else in the DAG).
    QueryDef("q_e1b_pipeline_oracle",
      (s, dir) => buildCore(s, dir, includeWavelet = false),
      Some(e1Oracle(false))),

    // E3 — the dashboard signal-overlay read path as one plan
    // (2_OHLC_Signals.py:30-120): relative range scan (S5) over the bar
    // series → Bollinger band signals (W6+G2) → per-signal boolean
    // filter (P4) → marker y-positions (P8). Fully frame-expressible,
    // exact DuckDB oracle. Since r12 the registered shape is the
    // warmup-padded pruned scan (see signalOverlay) — the oracle stays
    // the shape-blind full-history SQL, so the hash gate itself proves
    // the prune is lossless.
    QueryDef(
      "q_e3_signal_overlay",
      (s, dir) => signalOverlay(s, dir, prune = true),
      Some {
        val overOrd = "(PARTITION BY user_id ORDER BY bts)"
        val f19 = "(PARTITION BY user_id ORDER BY bts ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)"
        s"""WITH b AS (
           |  SELECT user_id, date_trunc('hour', ts) AS bts,
           |         arg_min(value, ts) AS open, max(value) AS high,
           |         min(value) AS low, arg_max(value, ts) AS close
           |  FROM events GROUP BY user_id, date_trunc('hour', ts)
           |), m AS (
           |  SELECT user_id, bts, open, close,
           |         row_number() OVER $overOrd AS rn,
           |         CAST(sum(CAST(close AS DECIMAL(18,6))) OVER $f19 AS DOUBLE)
           |           / CAST(count(close) OVER $f19 AS DOUBLE) AS mean,
           |         CAST(sum(CAST(close * close AS DECIMAL(28,10))) OVER $f19 AS DOUBLE)
           |           / CAST(count(close) OVER $f19 AS DOUBLE) AS meansq
           |  FROM b
           |), sig AS (
           |  SELECT user_id, bts, open, close,
           |         coalesce(lag(close) OVER $overOrd > lag(bb_lo) OVER $overOrd
           |                  AND close < bb_lo, false) AS buy,
           |         coalesce(lag(close) OVER $overOrd < lag(bb_up) OVER $overOrd
           |                  AND close > bb_up, false) AS sell
           |  FROM (SELECT user_id, bts, open, close,
           |               CASE WHEN rn >= 20 THEN mean + 2.0 * sqrt(meansq - mean * mean) END AS bb_up,
           |               CASE WHEN rn >= 20 THEN mean - 2.0 * sqrt(meansq - mean * mean) END AS bb_lo
           |        FROM m) t
           |)
           |SELECT user_id, strftime(bts, '%Y-%m-%d %H:%M:%S') AS bucket,
           |       buy, sell,
           |       round(open - open * 0.01, 6) AS marker_lo,
           |       round(close + close * 0.01, 6) AS marker_hi
           |FROM sig
           |WHERE bts >= (SELECT max(bts) FROM b) - INTERVAL 240 HOUR
           |  AND (buy OR sell)
           |ORDER BY user_id, bucket""".stripMargin
      }),

    // E4 — the training-data pipeline end-to-end as ONE composed DAG
    // (the data-layer counterpart of E1): corpus → quality gate (token
    // floor + stopword-ratio language screen, narrow) → exact dedup
    // (first-id-wins per content fingerprint, one digest-keyed window)
    // → deterministic hash split (train/val/test, narrow) → greedy
    // 2048-token packing per (split, shard) (the n9 kernel, one
    // (split,shard) shuffle) → per-split totals incl. pack fill
    // efficiency. Every stage is an already-oracled operator; this
    // query gates their COMPOSITION with a single CTE+recursion oracle.
    // At 100 TB: two data shuffles total (fingerprint window, pack
    // shard) — filters, hashing, split assignment all ride the scan.
    QueryDef(
      "q_e4_data_pipeline",
      (s, dir) => {
        val budget = 2048L
        val toks = graft.operators.TextOps.tokens(col("text"))
        val stop = size(filter(toks,
          t => array_contains(typedLit(graft.operators.TextOps.Stopwords), t)))
          .cast("double") /
          greatest(size(toks), lit(1)).cast("double")
        val base = Tables.documents(s, dir)
          .withColumn("n_tok", size(toks))
          .withColumn("stop_ratio", stop)
          .filter(col("n_tok") >= 50 && col("stop_ratio") >= 0.08)
          .withColumn("norm", graft.operators.TextOps.normalizeText(col("text")))
          .withColumn("fp", md5(col("norm").cast("binary")))
          .withColumn("h", graft.operators.TextOps.polyHash(col("norm")))
        val deduped = base
          .withColumn("keep_id",
            min(col("doc_id")).over(Window.partitionBy("fp")))
          .filter(col("doc_id") === col("keep_id"))
          .withColumn("bucket", pmod(col("h"), lit(100L)))
          .withColumn("split",
            when(col("bucket") < 80, "train")
              .when(col("bucket") < 90, "val").otherwise("test"))
          .withColumn("shard", pmod(col("h"), lit(16L)))
          .withColumn("tok",
            ceil(length(col("text")).cast("double") / 4.0).cast("double"))
          .select("doc_id", "split", "shard", "tok")
        SeriesKernels.applyKernels(
          deduped, Seq("split", "shard"), Seq("doc_id"),
          Seq(SeriesKernels.KernelSpec(
            Seq("tok"), Seq("pack_d", "cum_d"),
            () => new graft.operators.PackKernels.GreedyPackKernel(budget))))
          .groupBy("split", "shard")
          .agg(count(lit(1)).as("nd"), sum(col("tok").cast("long")).as("tk"),
            (max(col("pack_d")) + 1).cast("long").as("np"))
          .groupBy("split")
          .agg(sum(col("nd")).as("n_docs"), sum(col("np")).as("n_packs"),
            sum(col("tk")).as("tok_total"))
          .select(col("split"), col("n_docs"), col("n_packs"), col("tok_total"),
            round(col("tok_total").cast("double") /
              (col("n_packs") * budget).cast("double"), 6).as("fill_ratio"))
          .orderBy("split")
      },
      {
        import graft.operators.TextOps.{normalizeTextSql, polyHashSql, stopwordsSqlList, tokensSql}
        Some(s"""WITH RECURSIVE base AS (
                |  SELECT doc_id, text,
                |         ${normalizeTextSql("text")} AS norm
                |  FROM (SELECT doc_id, text,
                |               len(${tokensSql("text")}) AS n_tok,
                |               CAST(len(list_filter(${tokensSql("text")},
                |                      t -> list_contains($stopwordsSqlList, t))) AS DOUBLE)
                |                 / CAST(greatest(len(${tokensSql("text")}), 1) AS DOUBLE)
                |                 AS stop_ratio
                |        FROM documents) f
                |  WHERE n_tok >= 50 AND stop_ratio >= 0.08
                |), dedup AS (
                |  SELECT doc_id, norm FROM (
                |    SELECT doc_id, norm,
                |           row_number() OVER (PARTITION BY md5(norm) ORDER BY doc_id) AS rn
                |    FROM base) x WHERE rn = 1
                |), assigned AS (
                |  SELECT b.doc_id,
                |         CASE WHEN ((h % 100) + 100) % 100 < 80 THEN 'train'
                |              WHEN ((h % 100) + 100) % 100 < 90 THEN 'val'
                |              ELSE 'test' END AS split,
                |         ((h % 16) + 16) % 16 AS shard,
                |         CAST(ceil(CAST(length(b.text) AS DOUBLE) / 4.0) AS BIGINT) AS tok
                |  FROM (SELECT d.doc_id, d.norm, ${polyHashSql("d.norm")} AS h
                |        FROM dedup d) x
                |  JOIN base b ON b.doc_id = x.doc_id
                |), d AS (
                |  SELECT doc_id, split, shard, tok,
                |         row_number() OVER (PARTITION BY split, shard ORDER BY doc_id) AS rn
                |  FROM assigned
                |), rec AS (
                |  SELECT doc_id, split, shard, tok, rn,
                |         CAST(0 AS BIGINT) AS pack_id, tok AS cum_tok
                |  FROM d WHERE rn = 1
                |  UNION ALL
                |  SELECT d.doc_id, d.split, d.shard, d.tok, d.rn,
                |         CASE WHEN r.cum_tok > 0 AND r.cum_tok + d.tok > 2048
                |              THEN r.pack_id + 1 ELSE r.pack_id END,
                |         CASE WHEN r.cum_tok > 0 AND r.cum_tok + d.tok > 2048
                |              THEN d.tok ELSE r.cum_tok + d.tok END
                |  FROM rec r JOIN d ON d.split = r.split AND d.shard = r.shard
                |                   AND d.rn = r.rn + 1
                |), per_shard AS (
                |  SELECT split, shard, count(*) AS nd,
                |         CAST(sum(tok) AS BIGINT) AS tk,
                |         max(pack_id) + 1 AS np
                |  FROM rec GROUP BY split, shard
                |)
                |SELECT split,
                |       CAST(sum(nd) AS BIGINT) AS n_docs,
                |       CAST(sum(np) AS BIGINT) AS n_packs,
                |       CAST(sum(tk) AS BIGINT) AS tok_total,
                |       round(CAST(sum(tk) AS DOUBLE)
                |             / CAST(sum(np) * 2048 AS DOUBLE), 6) AS fill_ratio
                |FROM per_shard GROUP BY split ORDER BY split""".stripMargin)
      },
      bench = true)
  )
}
