package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FrameKernels._
import graft.operators.SeriesKernels._
import graft.sources.Tables
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Ev

/** Streaming semantics (SURVEY.md §2.7): X2 incremental-tick parity —
  * the invariant the reference assumes but never checks — plus X4
  * empty-batch no-op.
  */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)
  private val sf = "/root/testdata/sf0.001"

  /** The reference's per-tick enrichment over a (≤300-row) frame:
    * SMA30 + Bollinger(20,2) + band signals (btc_usdt_etl_dag.py:109-172,
    * frame-expressible subset). */
  private def enrich(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    val rn = row_number().over(w)
    val base = df.withColumn("rn", rn)
    val (mid, up, lo) = bollinger(col("value"), col("rn"), 20, 2.0, w)
    base
      .withColumn("sma30", sma(col("value"), 30, w))
      .withColumn("bb_up", up)
      .withColumn("bb_lo", lo)
      .withColumn("buy", crossBelow(col("value"), col("bb_lo"), w))
      .withColumn("sell", crossAbove(col("value"), col("bb_up"), w))
  }

  test("X2: incremental tick (lookback window + 1 new row) equals batch recompute") {
    // one series, driver-sequenced ticks — the foreachBatch shape
    val series = Tables.events(spark, sf)
      .filter(col("user_id") === 3)
      .orderBy("ts_ns", "event_id")
      .select("event_id", "ts_ns", "user_id", "value")
      .collect()
    assert(series.length > 45)
    import spark.implicits._
    val full = enrich(
      series.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq.toDF("event_id", "ts_ns", "user_id", "value"))
      .select("event_id", "sma30", "bb_up", "bb_lo", "buy", "sell")
      .collect().map(r => r.getLong(0) -> r).toMap

    val lookback = 299
    for (t <- 40 until series.length) {
      val windowRows = series.slice(math.max(0, t - lookback), t + 1)
      val ticked = enrich(
        windowRows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
          .toSeq.toDF("event_id", "ts_ns", "user_id", "value"))
        .orderBy(desc("ts_ns"), desc("event_id")).limit(1)
        .select("event_id", "sma30", "bb_up", "bb_lo", "buy", "sell")
        .head()
      val batch = full(ticked.getLong(0))
      for (i <- 1 to 3)
        assert(math.abs(ticked.getDouble(i) - batch.getDouble(i)) < 1e-12,
          s"tick $t col $i: ${ticked.getDouble(i)} vs ${batch.getDouble(i)}")
      for (i <- 4 to 5)
        assert(ticked.getBoolean(i) == batch.getBoolean(i), s"tick $t signal col $i")
    }
  }

  test("stream-stream join state is evicted once the watermark passes (X10/X12 finite-state contract)") {
    // VERDICT r4 next #6: the scaladoc claims watermarks bound join
    // state; assert it via lastProgress.stateOperators rather than
    // trusting the plan. Left-outer interval join, 1 h delay.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ls = MemoryStream[Ev]
    val rs = MemoryStream[Ev]
    val sink = s"graft_state_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val query = StreamingOps.intervalJoinLeftOuter(ls.toDF(), rs.toDF())
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    def stateRows(): Long = {
      val p = query.lastProgress
      assert(p != null && p.stateOperators.nonEmpty, "no state operator progress")
      p.stateOperators.map(_.numRowsTotal).sum
    }
    try {
      val hourUs = 3600L * 1000000
      val rows = (0 until 50).map(i => Ev(i.toLong, i * hourUs / 10, i % 5, 1.0))
      ls.addData(rows)
      rs.addData(rows.map(e => e.copy(event_id = e.event_id + 1000)))
      query.processAllAvailable()
      // some early rows are already evicted within phase 1 (the
      // watermark advances as batches process) — the invariant under
      // test is the drop to sentinel-only, not the exact resident count
      val before = stateRows()
      assert(before >= 20, s"expected a populated join state, got $before")
      // two sentinel rounds: the first advances the watermark past all
      // real data, the second gives the store a batch in which to purge
      val far = rows.map(_.ts_us).max + 30L * 24 * hourUs
      for (k <- 0 to 1) {
        ls.addData(Ev(-1, far + k * hourUs, -1, 0.0))
        rs.addData(Ev(-1, far + k * hourUs, -1, 0.0))
        query.processAllAvailable()
      }
      val after = stateRows()
      assert(after < before,
        s"state rows did not drop after watermark passed: $before -> $after")
      assert(after <= 8, s"only sentinel rows may remain in state, got $after")
    } finally query.stop()
  }

  test("X4: an empty micro-batch is a no-op") {
    val rows = Seq(
      Ev(1, 1704067200000000L, 1, 10.0),
      Ev(2, 1704070800000000L, 1, 11.0),
      Ev(3, 1704074400000000L, 2, 12.0),
      Ev(4, 1704078000000000L, 2, 13.0))
    // phase 2 delivers only the sentinel (dups empty, second half empty
    // after split) — output must still be exactly the distinct input
    val out = StreamingOps.runTwoPhase(
      spark, rows, Seq.empty, StreamingOps.dedupStream, "append")
    assert(out.count() == 4)
  }

  test("X3: duplicate re-delivery across micro-batches is dropped") {
    val rows = (1 to 20).map(i => Ev(i.toLong, 1704067200000000L + i * 60000000L, 1L, i * 1.0))
    val out = StreamingOps.runTwoPhase(
      spark, rows, rows.take(10), StreamingOps.dedupStream, "append")
    assert(out.count() == 20)
  }

  test("X1 ingest boundary: file-source stream (3 micro-batches) equals batch aggregation") {
    // the real ingest boundary (S1/S6 in a deployment): a watched
    // directory of parquet files, one micro-batch per file — no
    // driver-side collect anywhere in the data path
    import spark.implicits._
    val watch = java.nio.file.Files.createTempDirectory("graft_filesrc")
    val stage = java.nio.file.Files.createTempDirectory("graft_filesrc_stage")
    val rows = (1 to 300).map(i =>
      Ev(i.toLong, 1704067200000000L + i.toLong * 60000000L, (i % 3).toLong, i * 1.0))
    // far-future sentinel advances the watermark so append mode flushes
    val sentinel = Ev(-1L, 1704067200000000L + 365L * 24 * 3600 * 1000000L, -1L, 0.0)
    val parts = Seq(rows.take(100), rows.slice(100, 200), rows.drop(200) :+ sentinel)
    parts.zipWithIndex.foreach { case (g, i) =>
      val tmp = s"$stage/b$i"
      g.toDF().coalesce(1).write.parquet(tmp)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.move(part, watch.resolve(s"f$i.parquet"))
    }
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Ev]].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(watch.toString)
    val sinkName = "graft_filesrc_sink"
    val q = StreamingOps.tumblingBars(stream)
      .writeStream.format("memory").queryName(sinkName).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table(sinkName).filter(col("user_id") >= 0)
    val want = StreamingOps.tumblingBars(rows.toDF()) // withWatermark no-ops on batch
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
