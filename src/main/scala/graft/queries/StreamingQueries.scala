package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Ev

/** Streaming-semantics queries (SURVEY.md §2.7): each runs a REAL
  * Structured Streaming job (memory source → watermark/stateful
  * transform → memory sink, two micro-batch phases) whose final output
  * must equal the equivalent batch query — which is exactly what the
  * DuckDB oracle computes. The stream/batch agreement is the core
  * guarantee of the Structured Streaming model, and these queries gate
  * it per operator.
  */
object StreamingQueries extends QueryPack {

  /** Deterministic FIXED-SIZE event sample for the streams: every 7th
    * event, capped at [[SampleCap]] rows. The cap keeps the memory-source
    * harness (a driver-side collect is unavoidable for `MemoryStream`)
    * constant-cost at any SF — at sf0.1 the uncapped sample was ~14k rows
    * and the collect+stream plumbing dominated the whole bench run
    * (VERDICT r2 finding #4). The REAL ingest boundary is exercised by
    * StreamingSpec's file-source test; these queries gate stream/batch
    * semantics, not ingest throughput.
    */
  val SampleCap = 2000

  private def sample(s: SparkSession, dir: String): Seq[Ev] = {
    import s.implicits._
    Tables.events(s, dir)
      .filter(col("event_id") % 7 === 0)
      .orderBy("event_id")
      .limit(SampleCap)
      // integer div: epoch-nanos exceed double mantissa range, so a
      // float division here would drop the low microsecond digit
      .select(col("event_id"),
        expr("(ts_ns - pmod(ts_ns, 1000)) div 1000").as("ts_us"),
        col("user_id"), col("value"))
      .as[Ev]
      .collect()
      // feed in EVENT-TIME order (ties by id): the reference's ingest is
      // time-ordered, and the watermark queries' oracles are batch SQL
      // with no drop semantics. An id-ordered feed broke at the x10
      // key-shifted replica of a tiny SF (r16): the 2000-row sample
      // crossed the replica boundary, time jumped back to day 1, and
      // the stream dropped every "late" row the oracle kept. Late /
      // re-delivered arrival is gated by its own queries (q_x3's
      // phase-2 re-delivery), not by accidental sample order.
      .sortBy(e => (e.ts_us, e.event_id))
      .toSeq
  }

  private val sampleSql =
    s"SELECT * FROM events WHERE event_id % 7 = 0 ORDER BY event_id LIMIT $SampleCap"

  override def queries: Seq[QueryDef] = Seq(

    // X1/X8 — streaming tumbling 1-hour bars with event-time watermark
    // (append mode; a far-future sentinel flushes the last windows).
    // Oracle: the same aggregation as a batch query.
    QueryDef(
      "q_x1_stream_tumbling",
      (s, dir) => StreamingOps.runTwoPhase(
        s, sample(s, dir), Seq.empty, StreamingOps.tumblingBars, "append")
        .orderBy("user_id", "bucket"),
      Some(s"""SELECT user_id,
              |       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
              |       count(*) AS n_events,
              |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
              |FROM ($sampleSql) t
              |GROUP BY user_id, date_trunc('hour', ts)
              |ORDER BY user_id, bucket""".stripMargin)),

    // X3 — late/duplicate delivery: phase 2 re-delivers the first 200
    // events (the reference's 24h-overlap window re-reads articles and
    // accumulates duplicates — news_etl_dag.py:37-38; we dedup on the
    // business key instead). Oracle: batch DISTINCT.
    QueryDef(
      "q_x3_stream_dedup",
      (s, dir) => {
        val rows = sample(s, dir)
        StreamingOps.runTwoPhase(
          s, rows, rows.take(200), StreamingOps.dedupStream, "append")
          .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, user_id,
              |       epoch_us(date_trunc('microseconds', ts)) AS ts_us, value
              |FROM ($sampleSql) t
              |ORDER BY event_id""".stripMargin)),

    // X10 — stream-stream interval join (StreamingOps.intervalJoin
    // scaladoc): even-id events join odd-id events of the same user
    // within 4 hours, both sides real watermarked streams advancing
    // in two micro-batch phases. Oracle: the same interval join as a
    // batch query.
    QueryDef(
      "q_x10_stream_join",
      (s, dir) => {
        val rows = sample(s, dir)
        StreamingOps.runTwoPhaseTwoStreams(
          s,
          rows.filter(_.event_id % 2 == 0),
          rows.filter(_.event_id % 2 == 1),
          StreamingOps.intervalJoin, "append")
          .orderBy("user_id", "l_id", "r_id")
      },
      Some(s"""WITH s AS ($sampleSql),
              |l AS (SELECT event_id AS l_id, user_id,
              |             epoch_us(date_trunc('microseconds', ts)) AS l_ts_us
              |      FROM s WHERE event_id % 2 = 0),
              |r AS (SELECT event_id AS r_id, user_id,
              |             epoch_us(date_trunc('microseconds', ts)) AS r_ts_us
              |      FROM s WHERE event_id % 2 = 1)
              |SELECT l.user_id, l_id, r_id, l_ts_us, r_ts_us
              |FROM l JOIN r ON l.user_id = r.user_id
              | AND r_ts_us >= l_ts_us AND r_ts_us <= l_ts_us + 14400000000
              |ORDER BY l.user_id, l_id, r_id""".stripMargin)),

    // X12 — stream-stream LEFT OUTER interval join: like X10 but
    // unmatched left events must ALSO emit (with null right columns)
    // once the watermark passes their window — the outer-emission
    // semantics that distinguish a streaming outer join from a batch
    // one. Oracle: the same LEFT JOIN as a batch query. r_id uses -1
    // for the null side so the hash compare has no nullable-int column.
    QueryDef(
      "q_x12_stream_left_join",
      (s, dir) => {
        val rows = sample(s, dir)
        StreamingOps.runTwoPhaseTwoStreams(
          s,
          rows.filter(_.event_id % 2 == 0),
          rows.filter(_.event_id % 2 == 1),
          StreamingOps.intervalJoinLeftOuter, "append")
          .select(col("user_id"), col("l_id"),
            coalesce(col("r_id"), lit(-1L)).as("r_id"),
            col("l_ts_us"))
          .orderBy("user_id", "l_id", "r_id")
      },
      Some(s"""WITH s AS ($sampleSql),
              |l AS (SELECT event_id AS l_id, user_id,
              |             epoch_us(date_trunc('microseconds', ts)) AS l_ts_us
              |      FROM s WHERE event_id % 2 = 0),
              |r AS (SELECT event_id AS r_id, user_id,
              |             epoch_us(date_trunc('microseconds', ts)) AS r_ts_us
              |      FROM s WHERE event_id % 2 = 1)
              |SELECT l.user_id, l_id, coalesce(r_id, -1) AS r_id, l_ts_us
              |FROM l LEFT JOIN r ON l.user_id = r.user_id
              | AND r_ts_us >= l_ts_us AND r_ts_us <= l_ts_us + 14400000000
              |ORDER BY l.user_id, l_id, r_id""".stripMargin)),

    // X13 — streaming session windows (StreamingOps.sessionBars
    // scaladoc): data-driven merging windows, closed and emitted as the
    // watermark passes. Oracle: gap->flag->running-sum sessionization
    // with the >= boundary rule over the same sample.
    QueryDef(
      "q_x13_stream_session",
      (s, dir) => StreamingOps.runTwoPhase(
        s, sample(s, dir), Seq.empty, StreamingOps.sessionBars, "append")
        .orderBy("user_id", "start_us"),
      Some(s"""WITH e AS (
              |  SELECT user_id, epoch_us(date_trunc('microseconds', ts)) AS ts_us,
              |         event_id
              |  FROM ($sampleSql) t
              |), flagged AS (
              |  SELECT event_id, user_id, ts_us,
              |         CASE WHEN ts_us - lag(ts_us) OVER
              |                (PARTITION BY user_id ORDER BY ts_us, event_id)
              |              >= 1800000000 THEN 1 ELSE 0 END AS new_sess
              |  FROM e
              |), assigned AS (
              |  SELECT user_id, ts_us,
              |         CAST(sum(new_sess) OVER
              |           (PARTITION BY user_id ORDER BY ts_us, event_id
              |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |           AS BIGINT) AS sess_id
              |  FROM flagged
              |)
              |SELECT user_id, min(ts_us) AS start_us, max(ts_us) AS end_us,
              |       max(ts_us) - min(ts_us) AS dur_us, count(*) AS n_events
              |FROM assigned GROUP BY user_id, sess_id
              |ORDER BY user_id, start_us""".stripMargin)),

    // X11 — sliding 2h/1h windows (each event in two overlapping
    // windows). Oracle: duplicate each row into its two window starts.
    QueryDef(
      "q_x11_stream_sliding",
      (s, dir) => StreamingOps.runTwoPhase(
        s, sample(s, dir), Seq.empty, StreamingOps.slidingBars, "append")
        .orderBy("user_id", "bucket"),
      Some(s"""SELECT user_id,
              |       strftime(date_trunc('hour', ts) - o * INTERVAL 1 HOUR,
              |                '%Y-%m-%d %H:%M:%S') AS bucket,
              |       count(*) AS n_events,
              |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
              |FROM ($sampleSql) t
              |CROSS JOIN (SELECT unnest([0, 1]) AS o) os
              |GROUP BY user_id, date_trunc('hour', ts) - o * INTERVAL 1 HOUR
              |ORDER BY user_id, bucket""".stripMargin))
  )
}
