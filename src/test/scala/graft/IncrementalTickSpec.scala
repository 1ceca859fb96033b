package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.streaming.IncrementalTick

/** End-to-end X2: the foreachBatch incremental pipeline's sink must
  * equal a full batch recompute over the same rows (the reference's
  * unchecked invariant), including the typed-model boundary.
  */
class IncrementalTickSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)
  private val sf = "/root/testdata/sf0.001"

  test("X2 end-to-end: ticked sink equals batch recompute on enriched columns") {
    val sinkPath = Files.createTempDirectory("graft_tick").toString + "/sink"
    val events = Tables.events(spark, sf)
      .filter(col("user_id") < 5)
      .select("event_id", "ts", "ts_ns", "user_id", "value")

    // drive: first 80% as the "backfill" batch, then 5 ticks of the rest
    val ordered = events.orderBy("ts_ns", "event_id").collect()
    val cut = (ordered.length * 0.8).toInt
    import spark.implicits._
    def toDf(rows: Array[org.apache.spark.sql.Row]) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq), events.schema)
    val tickSize = math.max(1, (ordered.length - cut) / 5)
    val batches = toDf(ordered.take(cut)) +:
      ordered.drop(cut).grouped(tickSize).map(g => toDf(g.toArray)).toSeq
    IncrementalTick.run(spark, batches, sinkPath)

    val sink = spark.read.parquet(sinkPath)
      .select("event_id", "sma30", "bb_up", "bb_lo", "buy", "sell")
    val batch = IncrementalTick.enrich(events)
      .select("event_id", "sma30", "bb_up", "bb_lo", "buy", "sell")

    assert(sink.count() == batch.count())
    // anti-join on all compared values: must be empty both ways
    val mismatch = sink.as("s").join(batch.as("b"),
        col("s.event_id") === col("b.event_id"))
      .filter(
        (col("s.sma30") =!= col("b.sma30")) ||
        (col("s.bb_up").isNull =!= col("b.bb_up").isNull) ||
        coalesce(abs(col("s.bb_up") - col("b.bb_up")) > 1e-9, lit(false)) ||
        coalesce(abs(col("s.bb_lo") - col("b.bb_lo")) > 1e-9, lit(false)) ||
        (col("s.buy") =!= col("b.buy")) ||
        (col("s.sell") =!= col("b.sell")))
    assert(mismatch.isEmpty)
  }

  test("typed model boundary: enriched pipeline rows round-trip as Dataset[OhlcvEnriched]") {
    import spark.implicits._
    val ds = SparkEntry.queries("q_e1_ohlcv_pipeline")(spark, sf)
      .as[graft.model.OhlcvEnriched]
    val rows = ds.take(50)
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.high >= r.low && r.volume > 0))
  }
}
