package graft

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** Resolved-plan cache for the SQL-text surface (VERDICT r4 next #9).
  *
  * Catalyst's analyze/optimize/codegen floor is ~0.3–1 s per call — at
  * interactive scale that dominates small-query latency (BENCH r4:
  * per-call heavy ratio 3.7 vs DuckDB while the execution-only ratio was
  * well under 1). A deployment running the same query text repeatedly
  * should pay planning once: a DataFrame is an immutable handle to its
  * analyzed plan, so caching it per (session, sfDir, sql) and calling
  * actions on the SAME handle reuses analysis, optimization, and
  * generated code. (Spark may additionally skip unchanged shuffle map
  * stages across re-executions of one handle — real serving behavior on
  * static data, flagged explicitly in Bench's cached metric.)
  *
  * Keys carry the session UUID, not the session object, and the cache is
  * bounded LRU — entries from stopped sessions age out instead of
  * pinning the JVM (the WeakHashMap value→key pitfall this repo hit in
  * [[graft.sources.Tables]], ADVICE r4).
  */
object PlanCache {
  private val MaxEntries = 128

  private val cache =
    new java.util.LinkedHashMap[(String, String, String), DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          eldest: java.util.Map.Entry[(String, String, String), DataFrame]): Boolean =
        size() > MaxEntries
    }

  /** Sessions whose testdata views are already registered, by
    * (sessionUUID, sfDir). */
  private val registered = scala.collection.mutable.HashSet.empty[(String, String)]

  private def sessionId(spark: SparkSession): String =
    spark.conf.get("spark.app.id", "") + "/" + System.identityHashCode(spark).toHexString

  /** Register every testdata table as a bare-name temp view once per
    * (session, sfDir). */
  private def ensureViews(spark: SparkSession, sfDir: String): Unit = {
    val key = (sessionId(spark), sfDir)
    if (!registered.contains(key)) {
      Tables.names.foreach { n =>
        val df = if (n == "events") Tables.events(spark, sfDir)
                 else Tables.load(spark, sfDir, n)
        df.createOrReplaceTempView(n)
      }
      registered += key
    }
  }

  /** The cached SQL entry point: same (session, sfDir, sql) → same
    * DataFrame handle, planned once. */
  def sql(spark: SparkSession, sqlText: String, sfDir: String): DataFrame =
    cache.synchronized {
      val key = (sessionId(spark), sfDir, sqlText)
      val hit = cache.get(key)
      if (hit != null) hit
      else {
        ensureViews(spark, sfDir)
        val df = spark.sql(sqlText)
        df.queryExecution.executedPlan // force full planning at insert
        cache.put(key, df)
        df
      }
    }

  /** Cache size, for tests. */
  def entries: Int = cache.synchronized(cache.size())

  /** Drop everything (tests / reconfiguration). */
  def clear(): Unit = cache.synchronized {
    cache.clear(); registered.clear()
  }
}
