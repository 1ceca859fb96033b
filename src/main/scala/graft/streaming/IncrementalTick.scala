package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, StructField, StructType}

import graft.sources.{DriverParquetAppend, Sinks}

/** X2 — the reference's stateful incremental recompute as a runtime
  * component (btc_usdt_etl_dag.py:55-106,217: each hourly tick re-reads
  * the last 299 rows from the sink, unions the new candle, recomputes
  * every kernel over ≤300 rows, and writes ONLY the newest row).
  *
  * Spark shape: a `foreachBatch` body — each micro-batch of new candles
  * is unioned with the per-series tail, enriched with the full frame
  * pack, reduced to the newest rows, and appended to the day-partitioned
  * K1 sink. The lookback (299 rows / 299 hours) covers every kernel
  * warmup (MACD 33, ADX 27, SMA 30 — SURVEY §2.7 X2), which is exactly
  * why tick outputs equal a full batch recompute (the parity invariant
  * StreamingSpec asserts; IncrementalTickSpec asserts it end-to-end
  * through this component).
  *
  * The SINK is always the source of truth; the per-series tail is the
  * tick's memo of its own appends (valid because the tick is the sink's
  * only writer — the K1 contract), seeded and re-seeded from the sink,
  * so recovery = re-reading the sink tail, exactly as before. Two tail
  * SHAPES, the q_j1b map-side/shuffle dual (r16, VERDICT r15 next #6 —
  * the per-batch sink scan + its scheduling was 88% of tick time):
  *
  *  - DRIVER-RESIDENT (the reference's actual regime: symbol-count
  *    series, candle-sized batches): the tail lives as plain rows on
  *    the driver while (tail + batch) stays under
  *    [[TickDriverTailMaxRows]]; since r17 the kernel pack ALSO runs
  *    on the driver (SeriesKernels.runSequential — the same state
  *    machine applyKernels runs on executors), so a steady-state tick
  *    is collect-the-batch plus ONE small append job with no exchange.
  *    No sink read, no shuffle of history, no per-use broadcast builds.
  *  - EXECUTOR DATAFRAME (high-cardinality series / data-sized
  *    batches): the tail is a persisted, localCheckpoint-truncated
  *    DataFrame null-safe-maintained on executors; seeds and unions
  *    happen as plans. Entered automatically when a batch or seed
  *    overflows the driver budget; never downgrades back mid-stream.
  *
  * Scale: the seed read mirrors the reference's Flux
  * `range(start: last_ts − 298h)` (btc_usdt_etl_dag.py:77-92) — a TIME
  * bound, not a whole-history scan. The bound is derived from the
  * incoming batch (min new ts − lookback hours) and applied to BOTH the
  * `day` partition directory column (so the scan physically prunes to
  * the newest ⌈lookback/24⌉+1 day partitions — `PartitionFilters` in
  * the plan, asserted by IncrementalTickSpec) and `ts_ns` (row-exact
  * bound inside the boundary days). A row_number cap keeps the tail
  * ≤ [[Lookback]] rows per series even when a series has more rows than
  * hours in the window. A Delta/Iceberg-backed deployment swaps the
  * append for MERGE.
  */
object IncrementalTick {

  val Lookback = 299

  /** Driver-tail budget: the map-side/shuffle switch (the q_j1b
    * StarMapSideMaxOrders precedent). ~100 B/row ⇒ ~100 MB of driver
    * heap at the cap; the reference regime (tens of symbols × 299 rows)
    * sits four orders of magnitude below it. */
  val TickDriverTailMaxRows: Int = 1 << 20

  /** Driver-side wall-time accounting across [[processBatch]] calls,
    * split at the component's natural execution boundaries: `probe` =
    * the eager pre-append work (batch collect/stats + any sink seed
    * reads), `append` = the kernel+write job plus tail maintenance.
    * Zero-cost when nobody reads it; Bench snapshots + resets around
    * its throughput probe so the tick events/s number carries its own
    * breakdown (VERDICT r11 next #7).
    */
  object Phases {
    val probeNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    val appendNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    def reset(): Unit = { probeNanos.set(0L); appendNanos.set(0L); batches.set(0) }
    def probeSec: Double = probeNanos.get / 1e9
    def appendSec: Double = appendNanos.get / 1e9
  }

  /** The X2 frame pack — the SINGLE source of truth for both execution
    * sites (the distributed [[enrich]] plan and the driver-resident
    * fast path in [[runLocal]], which feeds the same specs through
    * [[graft.operators.SeriesKernels.runSequential]]). */
  private def kernelSpecs: Seq[graft.operators.SeriesKernels.KernelSpec] = {
    import graft.operators.{DecFrameKernels, SeriesKernels}
    Seq(
      SeriesKernels.KernelSpec(Seq("value"), Seq("sma30"),
        () => new DecFrameKernels.SmaDecKernel(30)),
      SeriesKernels.KernelSpec(Seq("value"),
        Seq("bb_mid", "bb_up", "bb_lo", "__buy_d", "__sell_d"),
        () => new DecFrameKernels.BollingerCrossKernel(20, 2.0)))
  }

  /** The per-tick enrichment over a (lookback+new) frame: the frame
    * pack (SMA30, Bollinger(20,2), band signals) as ONE sorted
    * mapPartitions pass of O(frame)-state ring kernels. r16: this was a
    * WindowExec pack whose sliding decimal aggregates re-summed each
    * 20/30-row frame per row — measured ~2 s per 40k-row tick batch,
    * the single biggest tick cost; the ring kernels are bit-identical
    * (DecFrameParitySpec) at O(1) per row, the same swap q_e1/q_e3 made
    * in r4/r12. Signals are 1.0/0.0 from the fused crossover kernel
    * (never null — NaN warmup state compares false, the crossBelow /
    * crossAbove coalesce(…, false) contract). */
  def enrich(df: DataFrame): DataFrame = {
    import graft.operators.SeriesKernels
    SeriesKernels.applyKernels(
        df, Seq("user_id"), Seq("ts_ns", "event_id"), kernelSpecs)
      .withColumn("buy", col("__buy_d") === 1.0)
      .withColumn("sell", col("__sell_d") === 1.0)
      .drop("__buy_d", "__sell_d")
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

  /** A slice guaranteed to cover each seed series' [[Lookback]]-row
    * tail: starts at `lookbackHours` and DOUBLES the window until every
    * series in `newSeries` has ≥ Lookback sink rows inside it, or the
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
      newSeries: DataFrame,
      minNewTsNs: Long,
      lookbackHours: Long,
      minDay: Option[String]): DataFrame = {
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

  /** Maintained tail state, keyed by (session, sinkPath). */
  private sealed trait TailState
  private final case class LocalTail(byUser: Map[Any, Vector[Row]]) extends TailState
  private final case class DfTail(df: DataFrame) extends TailState

  private val tailCache =
    new java.util.LinkedHashMap[(String, String), TailState](16, 0.75f, true) {
      override def removeEldestEntry(
          eldest: java.util.Map.Entry[(String, String), TailState]): Boolean = {
        val evict = size() > 64
        if (evict) eldest.getValue match {
          case DfTail(df) => df.unpersist()
          case _          => ()
        }
        evict
      }
    }

  /** Test/ops hook: drop the maintained tail for `sinkPath` (all
    * sessions), forcing the next tick to re-seed from the sink. */
  private[graft] def invalidateTail(sinkPath: String): Unit =
    tailCache.synchronized {
      val it = tailCache.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey._2 == sinkPath) {
          e.getValue match { case DfTail(df) => df.unpersist(); case _ => () }
          it.remove()
        }
      }
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
    * X5 idempotence: rows whose `event_id` already exists in the
    * lookback tail are dropped before the kernel pass, so re-running a
    * delivered batch (task retry, at-least-once upstream) is a no-op
    * instead of a double-append.
    *
    * `appendFiles` coarsens the append granularity: a tick emits one
    * row per new event of the touched series — writing that through
    * all shuffle.partitions tasks costs a many-file commit per batch
    * AND makes every later seed read list/open those shards. One file
    * per day per tick matches the reference's append cadence; it is the
    * FLOOR — the executor-DataFrame shape scales the fan-out
    * automatically from the measured batch row count
    * ([[TickAppendRowsPerFile]]), so a data-sized tick never funnels
    * through one task even on the automatic overflow handoff.
    */
  def processBatch(spark: SparkSession, newRows: DataFrame, sinkPath: String,
      lookbackHours: Long = Lookback.toLong,
      appendFiles: Int = 1): Unit = {
    val nr = newRows.select(InputCols.map(col): _*)
    val key = (graft.GraftSession.sessionUuid(spark), sinkPath)
    tailCache.synchronized(Option(tailCache.get(key))) match {
      case Some(DfTail(df))   => runDf(spark, nr, sinkPath, lookbackHours,
        appendFiles, key, Some(df))
      case Some(LocalTail(m)) => runLocal(spark, nr, sinkPath, lookbackHours,
        appendFiles, key, m)
      case None               => runLocal(spark, nr, sinkPath, lookbackHours,
        appendFiles, key, Map.empty)
    }
  }

  /** Test hook: run a batch through the executor-DataFrame tail shape
    * unconditionally (small corpora otherwise always take the
    * driver-resident path, leaving the scale shape spec-untested). */
  private[graft] def processBatchForceDf(spark: SparkSession,
      newRows: DataFrame, sinkPath: String,
      lookbackHours: Long = Lookback.toLong): Unit = {
    val nr = newRows.select(InputCols.map(col): _*)
    val key = (graft.GraftSession.sessionUuid(spark), sinkPath)
    val cached = tailCache.synchronized(Option(tailCache.get(key))) match {
      case Some(DfTail(df)) => Some(df)
      case _                => None
    }
    runDf(spark, nr, sinkPath, lookbackHours, appendFiles = 1, key, cached)
  }

  /** Sink metadata for the seed path: None = sink path missing (first
    * tick, "no history"); Some(minDay) = oldest day partition. */
  private def sinkMinDay(spark: SparkSession, sinkPath: String)
      : Option[Option[String]] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(sinkPath)
    if (!fs.exists(root)) None
    else {
      val days = fs.listStatus(root).map(_.getPath.getName)
        .filter(_.startsWith("day=")).map(_.stripPrefix("day="))
      Some(if (days.isEmpty) None else Some(days.min))
    }
  }

  // ---------------------------------------------------------------- //
  // Driver-resident tail: the reference regime. Steady state is two   //
  // Spark jobs per tick — collect the batch, one LocalRelation →      //
  // kernel → append job.                                              //
  // ---------------------------------------------------------------- //
  private def runLocal(spark: SparkSession, nr: DataFrame, sinkPath: String,
      lookbackHours: Long, appendFiles: Int,
      key: (String, String), tail0: Map[Any, Vector[Row]]): Unit = {
    val probeT0 = System.nanoTime()
    val batchRows = nr.take(TickDriverTailMaxRows + 1)
    if (batchRows.isEmpty) return // X4: empty micro-batch no-op
    if (batchRows.length > TickDriverTailMaxRows) {
      // data-sized batch: hand the whole stream over to the executor
      // DataFrame shape (the driver tail is discardable — the sink has
      // everything the cache had, because the tick appends before
      // caching)
      tailCache.synchronized(tailCache.remove(key))
      Phases.probeNanos.addAndGet(System.nanoTime() - probeT0)
      runDf(spark, nr, sinkPath, lookbackHours, appendFiles, key, None)
      return
    }
    val schema = nr.schema
    val ui = schema.fieldIndex("user_id")
    val ti = schema.fieldIndex("ts_ns")
    val ei = schema.fieldIndex("event_id")
    val batchSeries: Set[Any] = batchRows.iterator.map(_.get(ui)).toSet
    val minNewTsNs = batchRows.iterator.map(_.getLong(ti)).min

    // seed series the tail doesn't hold yet (cold start, restart, or a
    // symbol first seen by this stream) from the sink
    var tail = tail0
    val missing = batchSeries -- tail.keySet
    if (missing.nonEmpty) {
      sinkMinDay(spark, sinkPath) match {
        case None => () // no sink yet: genuinely no history
        case Some(minDay) =>
          val msDf = spark.createDataFrame(
            java.util.Arrays.asList(missing.toSeq.map(Row(_)): _*),
            StructType(Seq(schema("user_id"))))
          val seedRows = rowCap(
            coveredSlice(spark, sinkPath, msDf, minNewTsNs, lookbackHours,
              minDay)
              .join(broadcast(msDf), Seq("user_id"), "leftsemi"))
            .take(TickDriverTailMaxRows + 1)
          if (seedRows.length > TickDriverTailMaxRows) {
            // too many series for the driver shape: switch to DataFrame
            tailCache.synchronized(tailCache.remove(key))
            Phases.probeNanos.addAndGet(System.nanoTime() - probeT0)
            runDf(spark, nr, sinkPath, lookbackHours, appendFiles, key, None)
            return
          }
          tail = tail ++ seedRows.groupBy(_.get(ui)).view.mapValues(rs =>
            rs.sortBy(r => (r.getLong(ti), r.getLong(ei))).toVector)
      }
    }
    // X5: drop re-delivered rows (event_id already in the lookback tail)
    val seenIds: Set[Any] = batchSeries.iterator
      .flatMap(u => tail.getOrElse(u, Vector.empty))
      .map(_.get(ei)).toSet
    val fresh = batchRows.filter(r => !seenIds.contains(r.get(ei)))
    Phases.probeNanos.addAndGet(System.nanoTime() - probeT0)
    val appendT0 = System.nanoTime()
    if (fresh.nonEmpty) {
      // DRIVER-SIDE enrichment (r17, VERDICT r16 next #4): the tails
      // and the batch are already plain rows on the driver, and the
      // kernel pack is O(1)-state Scala — running
      // SeriesKernels.runSequential here (the SAME state machine
      // applyKernels runs on executors, same specs via [[kernelSpecs]])
      // removes the per-tick LocalRelation → exchange(user_id) →
      // kernel → exchange(appendFiles) job whose scheduling and plan
      // cost dominated tick_append_sec. The ONLY Spark job left in a
      // steady-state tick is the appendFiles-task parquet append of the
      // new rows. Kernel input stays pruned to the series the batch
      // TOUCHES (btc_usdt_etl_dag.py:55-106); bit-parity with the
      // distributed path is by shared implementation, pinned end-to-end
      // by IncrementalTickSpec's ticked-sink == batch-recompute gates.
      import graft.operators.SeriesKernels
      val specs = kernelSpecs
      val inIdx = specs.map(_.inputCols.map(schema.fieldIndex).toArray).toArray
      val outLen = schema.length + specs.flatMap(_.outputCols).length
      val freshBySeries = fresh.groupBy(_.get(ui))
      // per series: tail ++ fresh merged in (ts_ns, event_id) order with
      // a fresh flag riding along; series concatenated back-to-back
      // (kernels reset on the key change, exactly as in a partition)
      val mergedWithFlag: Vector[(Row, Boolean)] =
        batchSeries.toSeq.sortBy(_.toString).iterator.flatMap { u =>
          (tail.getOrElse(u, Vector.empty).map((_, false)) ++
            freshBySeries.getOrElse(u, Array.empty[Row]).map((_, true)))
            .sortBy { case (r, _) => (r.getLong(ti), r.getLong(ei)) }
        }.toVector
      val enrichedIt = SeriesKernels.runSequential(
        mergedWithFlag.iterator.map(_._1), schema.length,
        Array(ui), inIdx, specs.map(_.make()).toArray, outLen)
      // keep only this batch's rows; finalize __buy_d/__sell_d doubles
      // to the booleans the distributed path writes
      val buyIdx = outLen - 2
      val outRows: Seq[Row] = enrichedIt.zip(mergedWithFlag.iterator.map(_._2))
        .collect { case (r, true) =>
          val vals = r.toSeq
          def asBool(v: Any): Any =
            if (v == null) null
            else java.lang.Boolean.valueOf(v.asInstanceOf[Double] == 1.0)
          Row.fromSeq(vals.take(buyIdx) :+ asBool(vals(buyIdx)) :+
            asBool(vals(buyIdx + 1)))
        }.toVector
      val outSchema = StructType(
        schema.fields ++
          specs.flatMap(_.outputCols).dropRight(2)
            .map(c => StructField(c, org.apache.spark.sql.types.DoubleType,
              nullable = true)) ++
          Seq(StructField("buy", BooleanType, nullable = true),
            StructField("sell", BooleanType, nullable = true)))
      // r18 (VERDICT r17 next #8): the rows are ALREADY on the driver —
      // write the day-partitioned parquet directly through Spark's own
      // row codec instead of launching a 1-task Spark job per tick
      // (plan + schedule + task-side writer init + commit protocol were
      // ~0.25-0.8 s of pure fixed cost per micro-batch, 79% of tick
      // time in the r17 record). Same layout, same visibility contract
      // (hidden-then-rename); bit-parity with the distributed path is
      // pinned by IncrementalTickSpec's ticked-sink == batch-recompute
      // gates, which read this sink back through the executor path.
      DriverParquetAppend.append(spark, outRows, outSchema, "ts", sinkPath)
      // driver-side tail maintenance: merge fresh rows, keep the newest
      // ≤ Lookback per series (ascending (ts_ns, event_id), takeRight —
      // the same order rowCap pins)
      tail = tail ++ fresh.groupBy(_.get(ui)).map { case (u, rs) =>
        val merged = (tail.getOrElse(u, Vector.empty) ++ rs)
          .sortBy(r => (r.getLong(ti), r.getLong(ei)))
        u -> merged.takeRight(Lookback)
      }
    }
    tailCache.synchronized(tailCache.put(key, LocalTail(tail)))
    Phases.appendNanos.addAndGet(System.nanoTime() - appendT0)
    Phases.batches.incrementAndGet()
  }

  // ---------------------------------------------------------------- //
  // Executor DataFrame tail: high-cardinality series / data-sized     //
  // batches. Everything stays distributed; the carried tail never     //
  // lands on the driver (the ChunkedKernels r16 contract).            //
  // ---------------------------------------------------------------- //
  private[graft] def runDf(spark: SparkSession, nr: DataFrame,
      sinkPath: String, lookbackHours: Long, appendFiles: Int,
      key: (String, String), cached: Option[DataFrame]): Unit =
    try {
      runDfBody(spark, nr, sinkPath, lookbackHours, appendFiles, key, cached)
    } catch {
      case e: Throwable =>
        // the DfTail lives in NON-reliable localCheckpoint blocks: if an
        // executor holding them died, every action against the stale
        // handle fails — and would keep failing on each micro-batch
        // retry until JVM restart. Dropping the tail here makes the
        // docstring's recovery contract ("recovery = re-reading the
        // sink tail") automatic: the foreachBatch retry re-seeds from
        // the sink, and the X5 pre-kernel guard keeps the retry
        // idempotent. (ADVICE r16; the manual invalidateTail hook and
        // its mid-stream cache-death spec stay.)
        invalidateTail(sinkPath)
        throw e
    }

  /** Target rows per append file when a batch is data-sized: the
    * automatic overflow handoff from the driver shape arrives with the
    * caller's driver-regime `appendFiles` (default 1), which would push
    * the whole tick output through one task (ADVICE r16). ~100 B/row ⇒
    * ~100 MB parquet per file at this target. */
  val TickAppendRowsPerFile: Long = 1L << 20

  private def runDfBody(spark: SparkSession, nr: DataFrame,
      sinkPath: String, lookbackHours: Long, appendFiles: Int,
      key: (String, String), cached: Option[DataFrame]): Unit = {
    val probeT0 = System.nanoTime()
    // ONE aggregation job yields emptiness (X4), the min new ts AND the
    // touched-series set. Driver-bounded by the batch's distinct series
    // — the same bound a broadcast() build already imposes.
    val stats = nr.groupBy(col("user_id"))
      .agg(min(col("ts_ns")).as("__mn"), count(lit(1)).as("__n")).collect()
    if (stats.isEmpty) return // X4: empty micro-batch no-op
    val minNewTsNs = stats.iterator.map(_.getLong(1)).min
    // scale the append fan-out with the MEASURED batch size so the
    // data-sized overflow handoff never funnels through the caller's
    // driver-regime default (ADVICE r16); the caller's value stays the
    // floor, 256 caps the commit at a sane file count
    val batchRowCount = stats.iterator.map(_.getLong(2)).sum
    val effAppendFiles = math.max(appendFiles, math.min(256L,
      (batchRowCount + TickAppendRowsPerFile - 1) / TickAppendRowsPerFile).toInt)
    // the touched-series set as a LocalRelation: broadcast joins against
    // it build driver-side with NO Spark job
    val newSeries = spark.createDataFrame(
      java.util.Arrays.asList(stats.map(r => Row(r.get(0))): _*),
      StructType(Seq(nr.schema("user_id"))))
    // series the maintained tail cannot serve → sink seed (executor-side
    // set difference — never a driver-side series set)
    val seedSeries: Option[DataFrame] = cached match {
      case None => Some(newSeries)
      case Some(t) =>
        val missing = newSeries.except(t.select("user_id").distinct())
        if (missing.isEmpty) None else Some(missing)
    }
    val seeded: Option[DataFrame] = seedSeries.flatMap { ms =>
      sinkMinDay(spark, sinkPath).map { minDay =>
        rowCap(coveredSlice(spark, sinkPath, ms, minNewTsNs, lookbackHours,
          minDay)
          .join(broadcast(ms), Seq("user_id"), "leftsemi"))
      }
    }
    Phases.probeNanos.addAndGet(System.nanoTime() - probeT0)
    val appendT0 = System.nanoTime()
    val tailRelevant: Option[DataFrame] =
      (cached.map(_.join(broadcast(newSeries), Seq("user_id"), "leftsemi")),
        seeded) match {
        case (Some(c), Some(sd)) => Some(c.unionByName(sd))
        case (Some(c), None)     => Some(c)
        case (None, sd)          => sd
      }
    // X5: drop re-delivered rows (event_id already in the lookback
    // tail) BEFORE the kernel pass, mirroring runLocal's seenIds filter
    // (ADVICE r16): a duplicate entering the union twice — once from
    // the tail as history, once as __new — would shift the frames of
    // every co-batched new row of that series. AQE broadcasts the
    // bounded tail side when small; the anti-join is the idempotence
    // price of an at-least-once source.
    val fresh = tailRelevant match {
      case None    => nr
      case Some(t) => nr.join(t.select(col("event_id").as("__seen")),
        col("event_id") === col("__seen"), "left_anti")
    }
    // provenance flag instead of a newest-row semi-join: only rows that
    // arrived in THIS batch leave the kernel pass — no key broadcast,
    // no join
    val union = tailRelevant match {
      case None    => fresh.withColumn("__new", lit(true))
      case Some(t) => t.withColumn("__new", lit(false))
        .unionByName(fresh.withColumn("__new", lit(true)))
    }
    val out = enrich(union).filter(col("__new")).drop("__new")
    // repartition, NOT coalesce: coalesce(1) folds the whole enrich
    // stage into one task (measured 2s/batch single-threaded kernels);
    // the tiny output exchange keeps the kernel pass parallel
    Sinks.appendPartitioned(out.repartition(effAppendFiles), "ts", sinkPath)
    // maintain the tail: newest ≤ Lookback rows per touched series
    // (event_id-deduped — a re-delivered row must not enter twice and
    // shift later frames), untouched series keep theirs. localCheckpoint
    // (eager) both materializes the new tail BEFORE the old one is
    // unpersisted and truncates the plan — without it each batch nests
    // the previous tail's lineage and analyzer cost grows per tick.
    val touchedTail = rowCap(tailRelevant match {
      case None    => fresh
      case Some(t) => t.unionByName(fresh).dropDuplicates("event_id")
    })
    val newTail = (cached.map(_.join(
        broadcast(newSeries), Seq("user_id"), "left_anti")).toSeq :+ touchedTail)
      .reduce(_ unionByName _)
      .localCheckpoint()
    tailCache.synchronized(tailCache.put(key, DfTail(newTail)))
    cached.foreach(_.unpersist())
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
