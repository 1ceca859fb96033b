package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.FrameKernels._
import graft.sources.Sinks

/** X2 — the reference's stateful incremental recompute as a runtime
  * component (btc_usdt_etl_dag.py:55-106,217: each hourly tick re-reads
  * the last 299 rows from the sink, unions the new candle, recomputes
  * every kernel over ≤300 rows, and writes ONLY the newest row).
  *
  * Spark shape: a `foreachBatch` body — each micro-batch of new candles
  * is unioned with the per-series sink tail, enriched with the full
  * frame pack, reduced to the newest row per series, and appended to
  * the day-partitioned K1 sink. The lookback (299 rows / 299 hours)
  * covers every kernel warmup (MACD 33, ADX 27, SMA 30 — SURVEY §2.7
  * X2), which is exactly why tick outputs equal a full batch recompute
  * (the parity invariant StreamingSpec asserts; IncrementalTickSpec
  * asserts it end-to-end through this component).
  *
  * Scale: the tail read mirrors the reference's Flux
  * `range(start: last_ts − 298h)` (btc_usdt_etl_dag.py:77-92) — a TIME
  * bound, not a whole-history scan. The bound is derived from the
  * incoming batch (min new ts − lookback hours) and applied to BOTH the
  * `day` partition directory column (so the scan physically prunes to
  * the newest ⌈lookback/24⌉+1 day partitions — `PartitionFilters` in
  * the plan, asserted by IncrementalTickSpec) and `ts_ns` (row-exact
  * bound inside the boundary days). A row_number cap keeps the union
  * ≤ [[Lookback]] rows per series even when a series has more rows than
  * hours in the window. State lives in the sink, not the stream, so
  * executor state is O(0) and recovery = re-reading the sink tail. A
  * Delta/Iceberg-backed deployment swaps the append for MERGE.
  */
object IncrementalTick {

  val Lookback = 299

  /** Driver-side wall-time accounting across [[processBatch]] calls,
    * split at the component's natural execution boundaries: `probe` =
    * the eager pre-append work (new-batch min-ts aggregate + the
    * coverage-widening slice checks, each a real sink read), `append` =
    * the single fused job that reads the pruned tail, recomputes the
    * kernels over tail+new and writes the appended rows (read/kernel/
    * write execute as ONE Spark job by design — Bench decomposes them
    * post-hoc on the final sink state). Zero-cost when nobody reads it;
    * Bench snapshots + resets around its throughput probe so the tick
    * events/s number carries its own breakdown (VERDICT r11 next #7).
    */
  object Phases {
    val probeNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    val appendNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    def reset(): Unit = { probeNanos.set(0L); appendNanos.set(0L); batches.set(0) }
    def probeSec: Double = probeNanos.get / 1e9
    def appendSec: Double = appendNanos.get / 1e9
  }

  /** The per-tick enrichment over a (lookback+new) frame: the
    * frame-expressible pack (SMA30, Bollinger(20,2), band signals). */
  def enrich(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    val base = df.withColumn("rn", row_number().over(w))
    val (mid, up, lo) = bollinger(col("value"), col("rn"), 20, 2.0, w)
    base
      .withColumn("sma30", sma(col("value"), 30, w))
      .withColumn("bb_mid", mid)
      .withColumn("bb_up", up)
      .withColumn("bb_lo", lo)
      .withColumn("buy", crossBelow(col("value"), col("bb_lo"), w))
      .withColumn("sell", crossAbove(col("value"), col("bb_up"), w))
      .drop("rn")
  }

  private val InputCols = Seq("event_id", "ts", "ts_ns", "user_id", "value")

  /** The time-pruned sink slice: all sink rows within `lookbackHours`
    * of `minNewTsNs`. The day bound is a partition-directory predicate
    * (ISO yyyy-MM-dd strings compare lexicographically), so only the
    * boundary-and-newer day partitions are listed/read; `ts_ns` applies
    * the row-exact bound within them. Exposed for the spec's
    * `PartitionFilters` plan assertion.
    */
  private def boundDayOf(boundNs: Long): String = java.time.Instant
    .ofEpochSecond(Math.floorDiv(boundNs, 1000000000L))
    .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString

  private[graft] def prunedSlice(
      spark: SparkSession,
      sinkPath: String,
      minNewTsNs: Long,
      lookbackHours: Long): DataFrame = {
    val boundNs = minNewTsNs - lookbackHours * 3600L * 1000000000L
    val boundDay = boundDayOf(boundNs)
    Sinks.readPartitioned(spark, sinkPath)
      .filter(col("day") >= lit(boundDay) && col("ts_ns") >= lit(boundNs))
  }

  /** A slice guaranteed to cover each new-row series' [[Lookback]]-row
    * tail: starts at `lookbackHours` and DOUBLES the window until every
    * series in `newRows` has ≥ Lookback sink rows inside it, or the
    * window reaches the sink's oldest `day` partition (then the slice IS
    * the series' whole history and the row cap binds exactly as the
    * reference's newest-299-rows read). A fixed time bound silently
    * under-covered series sparser than hourly — fewer tail rows than
    * kernel warmup diverges tick output from the full-batch recompute
    * (ADVICE r3). The common dense case stays one pruned read; only
    * sparse series pay extra widening reads. `minDay` is the oldest
    * partition directory name (driver-side metadata, not data).
    */
  private def coveredSlice(
      spark: SparkSession,
      sinkPath: String,
      newRows: DataFrame,
      minNewTsNs: Long,
      lookbackHours: Long,
      minDay: Option[String]): DataFrame = {
    val newSeries = newRows.select("user_id").distinct()
    var hours = lookbackHours
    var rounds = 0
    while (rounds < 64) {
      val slice = prunedSlice(spark, sinkPath, minNewTsNs, hours)
      val boundDay = boundDayOf(minNewTsNs - hours * 3600L * 1000000000L)
      // strict <: the ts_ns bound can clip rows inside the boundary day
      val wholeHistory = minDay.forall(boundDay < _)
      if (wholeHistory) return slice
      // count only the series the batch touches — the deficiency
      // question is theirs alone, and at scale the sink holds far more
      // series than any one batch
      val counts = slice
        .join(broadcast(newSeries), Seq("user_id"), "leftsemi")
        .groupBy("user_id").count()
      val deficient = newSeries.join(counts, Seq("user_id"), "left")
        .filter(coalesce(col("count"), lit(0L)) < Lookback)
      if (deficient.isEmpty) return slice
      hours *= 2
      rounds += 1
    }
    throw new IllegalStateException(
      s"coveredSlice: window did not converge after $rounds doublings " +
        s"(sink=$sinkPath, start=$lookbackHours h) — sink partition layout " +
        "is inconsistent with its row timestamps")
  }

  /** The per-series tail over a pruned slice: newest ≤ [[Lookback]]
    * rows per series (a series can carry more rows than hours). */
  private def rowCap(slice: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(desc("ts_ns"), desc("event_id"))
    slice.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= Lookback)
      .select(InputCols.map(col): _*)
  }

  /** One foreachBatch body: merge `newRows` (schema: event_id, ts,
    * ts_ns, user_id, value) into the sink at `sinkPath`.
    *
    * `lookbackHours` seeds the tail's time window (reference: 299
    * hourly candles ⇒ 299 h); [[coveredSlice]] widens it automatically
    * for series sparser than hourly, so tick-vs-batch parity holds at
    * ANY series cadence. Only a missing sink path reads as "no
    * history" (first tick); any other read failure propagates so the
    * micro-batch retries instead of appending rows computed without
    * lookback (ADVICE r2).
    *
    * X5 idempotence: rows whose `event_id` already exists in the sink
    * slice are anti-joined away before the append, so re-running a
    * delivered batch (task retry, at-least-once upstream) is a no-op
    * instead of a double-append.
    */
  def processBatch(spark: SparkSession, newRows: DataFrame, sinkPath: String,
      lookbackHours: Long = Lookback.toLong): Unit = {
    if (newRows.isEmpty) return // X4: empty micro-batch no-op
    val probeT0 = System.nanoTime()
    val minNewTsNs = newRows.agg(min(col("ts_ns"))).first().getLong(0)
    // only a MISSING sink path reads as "no history" (first tick); once
    // the path exists any read failure propagates (corrupt sink ≠ empty)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(sinkPath)
    val slice =
      if (!fs.exists(root)) None
      else {
        val days = fs.listStatus(root).map(_.getPath.getName)
          .filter(_.startsWith("day=")).map(_.stripPrefix("day="))
        val minDay = if (days.isEmpty) None else Some(days.min)
        Some(coveredSlice(spark, sinkPath, newRows, minNewTsNs,
          lookbackHours, minDay))
      }
    Phases.probeNanos.addAndGet(System.nanoTime() - probeT0)
    val appendT0 = System.nanoTime()
    // kernel input prunes to the series the batch TOUCHES: appended
    // rows are leftsemi'd to new event_ids below, so untouched series
    // contribute nothing — re-kerneling them is pure waste, and at
    // scale it is THE waste (a tick touching one symbol must not
    // recompute a 10k-symbol sink; the reference ticks per-symbol,
    // btc_usdt_etl_dag.py:55-106). The per-user window kernels make
    // the cut lossless; the batch's distinct users are broadcast-sized
    // by construction (bounded by the batch itself).
    val touched = slice.map(_.join(
      broadcast(newRows.select("user_id").distinct()),
      Seq("user_id"), "leftsemi"))
    val union = touched match {
      case None    => newRows.select(InputCols.map(col): _*)
      case Some(s) => rowCap(s).unionByName(newRows.select(InputCols.map(col): _*))
    }
    val enriched = enrich(union)
    // write ONLY rows newer than the previous per-series high-water mark
    val newKeys = newRows.select(col("event_id").as("__new_id")).distinct()
    val out = enriched.join(
      broadcast(newKeys), col("event_id") === col("__new_id"), "leftsemi")
    // X5: drop rows already present in the sink (idempotent re-delivery)
    // — `out` carries only touched-series rows, so the seen-set needs
    // only their slice
    val guarded = touched match {
      case None    => out
      case Some(s) => out.join(s.select(col("event_id").as("__seen")),
        col("event_id") === col("__seen"), "left_anti")
    }
    Sinks.appendPartitioned(guarded, "ts", sinkPath)
    Phases.appendNanos.addAndGet(System.nanoTime() - appendT0)
    Phases.batches.incrementAndGet()
  }

  /** Drives a sequence of micro-batches (driver-sequenced, the
    * Trigger.ProcessingTime analog for tests/backfills). */
  def run(spark: SparkSession, batches: Seq[DataFrame], sinkPath: String,
      lookbackHours: Long = Lookback.toLong): Unit =
    batches.foreach(b => processBatch(spark, b, sinkPath, lookbackHours))

  /** The production entry point: attaches [[processBatch]] as the
    * foreachBatch body of a streaming source (file dir, Kafka, rate…)
    * and starts the checkpointed query. The reference's hourly cadence
    * is `Trigger.ProcessingTime("1 hour")`; tests use AvailableNow
    * (IncrementalTickSpec drives a parquet file source through this).
    */
  def startStream(
      source: DataFrame,
      sinkPath: String,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger,
      lookbackHours: Long = Lookback.toLong)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(source.isStreaming, "startStream needs a streaming DataFrame")
    source.writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        processBatch(df.sparkSession, df.toDF(), sinkPath, lookbackHours)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
