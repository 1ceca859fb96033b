package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All tables are plain parquet; Spark's DataSource V2 parquet reader gives
  * us predicate pushdown, column pruning and (for partitioned layouts)
  * partition pruning for free — at 100 TB the same `spark.read.parquet`
  * call works against a directory of thousands of files, so nothing here
  * assumes single-file inputs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session-scoped table catalog: the relation for a given path is built
    * once per session and reused — `spark.read.parquet` re-lists the
    * directory and re-reads parquet footers on every call, a fixed
    * ~50–300 ms tax per table per query that a real deployment pays once
    * at registration (metastore / DuckDB `CREATE VIEW`; the driver's own
    * oracle registers its tables once, so this also keeps the benchmark
    * comparison symmetric). DataFrames are immutable plan handles, so
    * reuse is safe.
    *
    * Keying: an earlier revision keyed a WeakHashMap by the session
    * object, but the cached DataFrames strongly reference their session
    * via QueryExecution — the classic value→key pitfall that makes weak
    * keys never collectible (ADVICE r4). Keys are now plain identity
    * strings, and each session's entries are evicted eagerly by a
    * context listener when the application ends; a bounded LRU backstops
    * the pathological many-sessions-one-JVM case regardless.
    */
  private val MaxCatalogEntries = 256
  private val catalog =
    new java.util.LinkedHashMap[String, DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          eldest: java.util.Map.Entry[String, DataFrame]): Boolean =
        size() > MaxCatalogEntries
    }
  private val hooked = scala.collection.mutable.HashSet.empty[String]

  // identityHashCode is reusable after GC (ADVICE r5) — key by the
  // conf-pinned per-session UUID instead.
  private def sessionKey(spark: SparkSession): String =
    graft.GraftSession.sessionUuid(spark)

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    catalog.synchronized {
      val sk = sessionKey(spark)
      if (!hooked.contains(sk)) {
        hooked += sk
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onApplicationEnd(
                e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
              catalog.synchronized {
                val it = catalog.keySet().iterator()
                while (it.hasNext) if (it.next().startsWith(sk + "@")) it.remove()
                hooked -= sk
              }
          })
      }
      val key = s"$sk@$dir/$name.parquet"
      val hit = catalog.get(key)
      if (hit != null) hit
      else {
        val df = spark.read.parquet(s"$dir/$name.parquet")
        catalog.put(key, df)
        df
      }
    }

  /** Normalizes whatever physical encoding `events.ts` arrives in to a
    * session-UTC TimestampType `ts` plus epoch-nanos Long `ts_ns`:
    *  - parquet INT64 TIMESTAMP(NANOS) surfaces as Long epoch-nanos via
    *    `spark.sql.legacy.parquet.nanosAsLong` (set in [[graft.GraftSession]]);
    *    we floor to micros for `ts` and keep the raw nanos in `ts_ns`.
    *  - parquet timestamp[us] without timezone surfaces as TIMESTAMP_NTZ;
    *    the cast to TimestampType interprets the wall-clock in the session
    *    timezone (pinned UTC), matching DuckDB's naive-timestamp reading.
    *  - TIMESTAMP (LTZ) passes through unchanged.
    */
  /** Memoized row counts per (session, dir, table). q_j1b's topology
    * switch consults |orders| on every DataFrame build; the catalog
    * memoized only the relation handle, so each fresh lineage re-ran a
    * count job at query-build time (ADVICE r11). A count is a parquet
    * metadata fast path, but "fast" still means a full Spark job. */
  private val countCache =
    new java.util.LinkedHashMap[String, java.lang.Long](16, 0.75f, true) {
      override def removeEldestEntry(
          eldest: java.util.Map.Entry[String, java.lang.Long]): Boolean =
        size() > 256
    }

  def rowCount(spark: SparkSession, dir: String, name: String): Long = {
    val key = s"${sessionKey(spark)}@$dir/$name"
    countCache.synchronized(Option(countCache.get(key)))
      .map(_.longValue).getOrElse {
        val n = load(spark, dir, name).count()
        countCache.synchronized(countCache.put(key, java.lang.Long.valueOf(n)))
        n
      }
  }

  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEvents(load(spark, dir, "events"))

  /** The narrow per-series kernel input: (event_id, user_id, ts_ns,
    * value). Series-kernel queries run through an opaque mapPartitions
    * pass ([[graft.operators.SeriesKernels.applyKernels]] and friends)
    * that Catalyst cannot prune columns THROUGH — a query that outputs
    * only event_id + kernel columns but feeds the full table would scan
    * AND shuffle the two string columns (event_type, props) end-to-end.
    * Projecting before the kernel keeps the series exchange at four
    * fixed-width columns; at 100 TB the exchange is the dominant
    * movement, so this is a direct shuffled-bytes cut, not a micro-opt.
    */
  def eventsSeries(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts_ns"), col("value"))
  }

  /** `events` restricted to rows at/after `boundNs` (epoch nanos, must
    * be whole microseconds — hour-aligned in practice): the bound is
    * applied to the RAW on-disk column in its native type BEFORE the
    * `ts`/`ts_ns` normalization, so it reaches the parquet scan as a
    * PushedFilter (→ row-group min/max pruning) under EVERY encoding.
    * A bound on the derived `ts_ns` only pushes for the int64-nanos
    * encoding, where `ts_ns` is a plain alias of the file column; for
    * timestamp[us] files it is `unix_micros(cast(ts)) * 1000` and the
    * predicate stays above the scan — the E3 read-path prune (r12) hit
    * exactly that.
    */
  def eventsFrom(spark: SparkSession, dir: String, boundNs: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    require(boundNs % 1000L == 0,
      s"eventsFrom: bound must be whole microseconds, got $boundNs ns")
    val raw = load(spark, dir, "events")
    val sec = Math.floorDiv(boundNs, 1000000000L)
    val nanoAdj = Math.floorMod(boundNs, 1000000000L)
    val bounded = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.filter(col("ts") >= boundNs)
      case org.apache.spark.sql.types.TimestampNTZType =>
        // the wall-clock of boundNs at UTC — normalization interprets
        // NTZ wall-clocks in the (pinned UTC) session zone, so the two
        // bounds select identical rows
        raw.filter(col("ts") >= lit(java.time.LocalDateTime
          .ofEpochSecond(sec, nanoAdj.toInt, java.time.ZoneOffset.UTC)))
      case _ =>
        raw.filter(col("ts") >=
          lit(java.time.Instant.ofEpochSecond(sec, nanoAdj)))
    }
    normalizeEvents(bounded)
  }

  private def normalizeEvents(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // floor-to-micros (pmod keeps pre-1970 negative nanos correct;
        // plain `div` truncates toward zero and would round those up).
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case _ => raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
