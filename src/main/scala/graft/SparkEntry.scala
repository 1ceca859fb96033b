package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query surface is assembled from per-domain packs; each pack row maps
  * one operator of SURVEY.md §2's inventory to a named query, with DuckDB
  * oracle SQL wherever the operator is SQL-expressible.
  */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    TimeSeriesFrameQueries,
    RecursiveKernelQueries,
    TextQueries,
    TextAnalysisQueries,
    VectorQueries,
    DedupQueries,
    ScorerQueries,
    FirKernelQueries,
    PipelineQueries,
    StreamingQueries,
    MultimodalQueries)

  private lazy val all: Seq[QueryDef] = packs.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_j1b_star_join")(spark, "/root/testdata/sf0.001")

  /** Per-(session, sfDir, name) memo of built DataFrames: a DataFrame
    * is an immutable handle to its analyzed/optimized plan, so repeated
    * calls to the same query over the same (static) data reuse the plan
    * instead of paying Catalyst's ~0.3–1 s analyze/optimize/codegen
    * floor again — the plan-caching the VERDICT r4 #9 serving model
    * asks of the engine surface itself (PlanCache does the same for
    * raw SQL text). Bounded LRU; keys carry the session's identity so
    * stopped sessions age out. Measurements that need a FRESH lineage
    * (Bench's unbiased execution metric) use [[freshQueries]]. */
  private val builtCache =
    new java.util.LinkedHashMap[(String, String, String), DataFrame](32, 0.75f, true) {
      override def removeEldestEntry(
          eldest: java.util.Map.Entry[(String, String, String), DataFrame]): Boolean =
        size() > 512
    }

  /** Per-key build locks (ADVICE r13 #3): parallel Verify workers
    * building DIFFERENT queries must not serialize on one global lock —
    * some builders run multi-second driver-side Spark actions (index
    * buildIfAbsent, e3 bound probes) that previously stalled all six
    * workers. The global cache lock now guards only the map get/put
    * (microseconds); the build itself runs under its key's own monitor,
    * created atomically, so only same-key callers contend and share one
    * build. A lock left behind by a throwing build is reused by the next
    * caller (bounded by key count — harmless). */
  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), Object]()

  private def memoized(name: String,
      build: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (s, dir) => {
      // conf-pinned UUID, not identityHashCode: hash reuse after GC could
      // hand a dead session's DataFrame to a fresh one (ADVICE r5).
      val key = (GraftSession.sessionUuid(s), dir, name)
      val hit = builtCache.synchronized(builtCache.get(key))
      if (hit != null) hit
      else buildLocks.computeIfAbsent(key, _ => new Object).synchronized {
        // double-check: a same-key racer may have finished the build
        // while this thread waited on the key monitor
        val again = builtCache.synchronized(builtCache.get(key))
        if (again != null) again
        else {
          val df = build(s, dir)
          builtCache.synchronized(builtCache.put(key, df))
          buildLocks.remove(key)
          df
        }
      }
    }

  /** One entry per implemented operator from SURVEY.md §2. Plan-cached
    * per (session, sfDir): repeated calls return the same handle. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> memoized(q.name, q.build)).toMap

  /** The uncached builders — a fresh plan/lineage every call. For
    * planning-cost measurement and fresh-execution benchmarks only. */
  def freshQueries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql.stripMargin)).toMap

  /** Headline subset timed by [[Bench]]. */
  def benchQueries: Seq[String] = all.filter(_.bench).map(_.name)
}
