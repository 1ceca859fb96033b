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

  /** Sliding 2-hour windows advancing hourly (each event lands in two
    * overlapping windows) — same watermark/append contract as
    * [[tumblingBars]]; Spark expands the slide inside the aggregation,
    * so state is (user, open windows) and no input row is duplicated
    * upstream of the shuffle. */
  def slidingBars(stream: DataFrame): DataFrame =
    stream
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), window(col("ts"), "2 hours", "1 hour").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(
        col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("n_events"), col("sum_value"))

  /** Streaming SESSION windows (30-min inactivity gap): the third
    * windowing kind after tumbling/sliding — windows are data-driven and
    * MERGE as events arrive; a session closes (and emits, append mode)
    * once the watermark passes its end. Boundary rule: `session_window`
    * windows are [ts, ts+gap) and merge only on OVERLAP, so an event
    * exactly `gap` after the last starts a NEW session (>= semantics —
    * the batch q_x9 sessionizer uses strict >; the oracle mirrors this
    * variant's rule). */
  def sessionBars(stream: DataFrame): DataFrame =
    stream
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .select(col("user_id"), col("start_us"), col("end_us"),
        (col("end_us") - col("start_us")).as("dur_us"), col("n_events"))

  /** Watermarked stream-stream INNER interval join: for every left event,
    * the right-stream events of the same user within [l_ts, l_ts+4 h].
    * The equality key partitions join state; the time-range condition plus
    * the watermarks bound how long each side's rows are retained — the
    * only way a stream-stream join holds finite state at 100 TB/day. The
    * delay here is sized far above the test data's span so no test row is
    * ever dropped as too-late (the state-eviction CONTRACT is what the
    * plan exercises; eviction timing itself is engine-internal).
    */
  def intervalJoin(left: DataFrame, right: DataFrame): DataFrame =
    intervalJoinOf(left, right, "inner", "30 days")

  /** LEFT OUTER variant: unmatched left events emit with null right
    * columns once the watermark passes their join window — so unlike the
    * inner form the watermark DELAY must be short enough that the
    * far-future sentinel actually advances past all real data (sentinel
    * − 30 days would sit below the stream's tail and hold every
    * unmatched row back in state forever). */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame): DataFrame =
    intervalJoinOf(left, right, "left_outer", "1 hour")

  private def intervalJoinOf(
      left: DataFrame, right: DataFrame,
      joinType: String, delay: String): DataFrame = {
    val l = left
      .withColumn("l_ts", timestamp_micros(col("ts_us")))
      .withWatermark("l_ts", delay)
      .select(col("event_id").as("l_id"), col("user_id"),
        col("ts_us").as("l_ts_us"), col("l_ts"))
    val r = right
      .withColumn("r_ts", timestamp_micros(col("ts_us")))
      .withWatermark("r_ts", delay)
      .select(col("event_id").as("r_id"), col("user_id").as("r_user"),
        col("ts_us").as("r_ts_us"), col("r_ts"))
    l.join(r,
        col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr("INTERVAL 4 HOURS"),
        joinType)
      .select(col("user_id"), col("l_id"), col("r_id"),
        col("l_ts_us"), col("r_ts_us"))
  }

  /** Session clone with state partitions sized to the (capped) sample
    * instead of the session's shuffle default. The gate streams feed at
    * most [[graft.queries.StreamingQueries.SampleCap]] rows by
    * construction, but a stateful operator initializes, loads and
    * commits one state store PER shuffle partition PER micro-batch (a
    * stream-stream join holds four stores per partition) — at the
    * session's core-count default that is hundreds of store lifecycles
    * per query for a 2000-row stream, and the fixed cost dominated the
    * cold sweep (q_x10 ~40 s, q_x12 ~34 s measured r18). Partitions
    * derive from the actual row count (~1000 rows per state partition,
    * floor 1, capped by the session default so a genuinely large feed
    * keeps full parallelism) — scale-adaptive, not a local[] constant.
    * Output is identical under any partitioning (decimal-exact partial
    * aggs, exact joins); the DuckDB oracles re-verify it per query.
    * A cloned session scopes the override: the caller's conf (and any
    * parallel Verify workers sharing it) never see the change. */
  private def streamSession(spark: SparkSession, nRows: Int): SparkSession = {
    val parts = math.max(1L, math.min(
      spark.sessionState.conf.numShufflePartitions.toLong, nRows / 1000L))
    val ss = spark.newSession()
    // propagate EVERY caller session-level override (ADVICE r18 #4 —
    // the clone used to hand-copy only the timezone, so any future
    // result-affecting conf set at session level would silently not
    // reach the gate streams): newSession rebuilds SQLConf from the
    // SparkContext conf, so copy each caller entry the clone disagrees
    // on. The session-identity key stays per-session (copying it would
    // alias DataFrame cache keys), and static confs are skipped (they
    // cannot differ within one SparkContext anyway).
    val base = ss.conf.getAll
    spark.conf.getAll.foreach { case (k, v) =>
      if (!base.get(k).contains(v) && k != "spark.graft.session.uuid") {
        try ss.conf.set(k, v)
        catch { case _: org.apache.spark.sql.AnalysisException => () }
      }
    }
    ss.conf.set("spark.sql.shuffle.partitions", parts.toString)
    // RAM-backed checkpoint files for the gate harness (r19): every
    // micro-batch paid ~85 ms of offset/commit WAL plus 150–400 ms of
    // state-store delta commits through the Hadoop checkpoint file
    // manager (metadata-path overhead — a tmpfs location changed
    // nothing). The gates' checkpoints are throwaway by construction
    // (two-phase MemoryStream feed, dropped after the query), so they
    // live in a JVM map; the production file-source probe keeps the
    // durable default. Opt-out: SPARK_GRAFT_GATE_RAM_CKPT=0.
    if (ramCkptEnabled)
      ss.conf.set("spark.sql.streaming.checkpointFileManagerClass",
        classOf[RamCheckpointFileManager].getName)
    ss
  }

  private def ramCkptEnabled: Boolean =
    !Set("0", "false", "no", "off").contains(
      sys.env.getOrElse("SPARK_GRAFT_GATE_RAM_CKPT", "1").trim.toLowerCase)

  /** Fresh throwaway checkpoint root for one gate query (a unique path
    * string — with the RAM manager nothing is ever created on disk). */
  private def gateCkptDir(): String =
    System.getProperty("java.io.tmpdir").stripSuffix("/") +
      s"/graft_gate_ckpt/${java.util.UUID.randomUUID().toString.take(12)}"

  /** Two-stream variant of [[runTwoPhase]]: both memory sources advance in
    * two phases, each closed by a far-future sentinel (the join's own
    * user_id = -1 sentinel pair is filtered from the sink). */
  def runTwoPhaseTwoStreams(
      caller: SparkSession,
      leftRows: Seq[Ev],
      rightRows: Seq[Ev],
      transform: (DataFrame, DataFrame) => DataFrame,
      outputMode: String): DataFrame = {
    val spark = streamSession(caller, leftRows.length + rightRows.length)
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ls = MemoryStream[Ev]
    val rs = MemoryStream[Ev]
    val sinkName = s"graft_sink_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val ckpt = gateCkptDir()
    val query = transform(ls.toDF(), rs.toDF())
      .writeStream
      .format("memory")
      .queryName(sinkName)
      .option("checkpointLocation", ckpt)
      .outputMode(outputMode)
      .start()
    try {
      val (l1, l2) = leftRows.splitAt(leftRows.length / 2)
      val (r1, r2) = rightRows.splitAt(rightRows.length / 2)
      ls.addData(l1)
      rs.addData(r1)
      query.processAllAvailable()
      val maxUs = (leftRows ++ rightRows).map(_.ts_us).max
      val sentinel = Ev(-1L, maxUs + 10L * 24 * 3600 * 1000000, -1L, 0.0)
      ls.addData(l2 :+ sentinel)
      rs.addData(r2 :+ sentinel)
      query.processAllAvailable()
    } finally {
      query.stop()
      RamCheckpointFileManager.drop(ckpt)
    }
    spark.table(sinkName).filter(col("user_id") >= 0)
  }

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
      caller: SparkSession,
      rows: Seq[Ev],
      dups: Seq[Ev],
      transform: DataFrame => DataFrame,
      outputMode: String): DataFrame = {
    val spark = streamSession(caller, rows.length + dups.length)
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val source = MemoryStream[Ev]
    val sinkName = s"graft_sink_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val ckpt = gateCkptDir()
    val query = transform(source.toDF())
      .writeStream
      .format("memory")
      .queryName(sinkName)
      .option("checkpointLocation", ckpt)
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
    } finally {
      query.stop()
      RamCheckpointFileManager.drop(ckpt)
    }
    spark.table(sinkName).filter(col("user_id") >= 0)
  }
}
