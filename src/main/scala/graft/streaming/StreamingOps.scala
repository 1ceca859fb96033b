package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming realizations of the reference's incremental
  * semantics (SURVEY.md §2.7):
  *
  *  - X1 trigger cadence → micro-batches (`MemoryStream` feeds in tests
  *    and the verify queries; a real deployment swaps in a file/Kafka
  *    source — the transform graph is identical).
  *  - X3 late/duplicate handling → `withWatermark` + `dropDuplicates` on
  *    the business key: the reference re-reads a 25 h window every hour
  *    and accumulates duplicate points in Qdrant (news_etl_dag.py:37-38,
  *    UUID ids); we keep the lookback semantics but fix the
  *    dup-accumulation by keying state on the content identity.
  *  - X8 tumbling alignment → `groupBy(window($"ts", "1 hour"))`.
  *  - X4 empty batches are natural no-ops.
  *
  * Scale: streaming state (dedup keys, open windows) is partitioned by
  * key across executors like any shuffle; the watermark bounds state
  * size. The event-time columns and aggregations are the same exprs the
  * batch path uses — one transform graph, two execution modes.
  */
object StreamingOps {

  /** One event row for the memory source (micros since epoch; the memory
    * source can't carry a raw nanos column's parquet type). */
  final case class Ev(event_id: Long, ts_us: Long, user_id: Long, value: Double)

  /** Tumbling 1-hour per-user counts+sums over an event-time stream with
    * a 1-hour watermark (append mode: a window emits once the watermark
    * passes its end — exactly-once per window). */
  def tumblingBars(stream: DataFrame): DataFrame =
    stream
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), window(col("ts"), "1 hour").as("w"))
      // decimal partial sums: exact and order-independent, so the result
      // is reproducible across partitionings and engines
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(
        col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("n_events"), col("sum_value"))

  /** Streaming dedup on the business key (user_id, ts_us): duplicates
    * re-delivered in later micro-batches are dropped as long as their
    * event time is above the watermark. */
  def dedupStream(stream: DataFrame): DataFrame =
    stream
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "30 days")
      .dropDuplicates("user_id", "ts_us")

  /** Runs `transform` over a two-phase memory stream of `rows` (split at
    * `splitAt`, second phase re-delivering `dups` plus a far-future
    * sentinel row that advances the watermark past every real window)
    * and returns the collected sink table. Deterministic: fixed input
    * order, processAllAvailable barriers between phases.
    */
  def runTwoPhase(
      spark: SparkSession,
      rows: Seq[Ev],
      dups: Seq[Ev],
      transform: DataFrame => DataFrame,
      outputMode: String): DataFrame = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val source = MemoryStream[Ev]
    val sinkName = s"graft_sink_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val query = transform(source.toDF())
      .writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode(outputMode)
      .start()
    try {
      val (phase1, phase2) = rows.splitAt(rows.length / 2)
      source.addData(phase1)
      query.processAllAvailable()
      val maxUs = rows.map(_.ts_us).max
      val sentinel = Ev(-1L, maxUs + 10L * 24 * 3600 * 1000000, -1L, 0.0)
      source.addData(phase2 ++ dups :+ sentinel)
      query.processAllAvailable()
    } finally query.stop()
    spark.table(sinkName).filter(col("user_id") >= 0)
  }
}
