package graft.model

/** Typed row models at the engine's API boundaries (SURVEY.md §1.3):
  * `Dataset[T]` with these case classes where type safety helps callers;
  * internal operators stay `DataFrame`/`Column`-based so Catalyst
  * optimizes freely. Encoders come from `spark.implicits`.
  */

/** One OHLCV candle (reference §1.1a: the 5 raw columns + time key). */
final case class Ohlcv(
    user_id: Long,
    bts: java.sql.Timestamp,
    open: Double, high: Double, low: Double, close: Double,
    volume: Double)

/** The enriched 22-column row the reference writes per candle
  * (btc_usdt_etl_dag.py:193-201; produced by q_e1_ohlcv_pipeline). */
final case class OhlcvEnriched(
    user_id: Long,
    date: String,
    open: Double, high: Double, low: Double, close: Double, volume: Double,
    close_kalman_filter: Option[Double],
    close_savitzky_golay_filter: Option[Double],
    close_wavelet_filter: Option[Double],
    close_gaussian_smoothing: Option[Double],
    close_sma_smoothing: Option[Double],
    close_exponential_smoothing: Option[Double],
    rsi_buy_signal: Boolean, rsi_sell_signal: Boolean,
    bbands_buy_signal: Boolean, bbands_sell_signal: Boolean,
    macd_buy_signal: Boolean, macd_sell_signal: Boolean,
    ppo_buy_signal: Boolean, ppo_sell_signal: Boolean,
    adx_buy_signal: Boolean, adx_sell_signal: Boolean)

/** A cleaned news/corpus document (reference §1.1b payload shape). */
final case class NewsDoc(
    doc_id: Long,
    text: String,
    lang: String,
    source: String,
    n_chars: Long)

/** One model's (label, score) output. */
final case class ModelScore(label: String, score: Double)

/** An embedding row of the vector table. */
final case class EmbeddingRow(
    vec_id: Long,
    embedding: Seq[Float],
    label: Int)
