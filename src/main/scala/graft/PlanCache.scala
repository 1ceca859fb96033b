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

  /** The sfDir whose tables are CURRENTLY registered as bare-name temp
    * views, per session. Views are session-global, so "registered once
    * per (session, sfDir)" is the wrong invariant: after serving sfDir B,
    * a later call for previously-seen sfDir A would skip re-registration
    * and silently resolve A's SQL against B's data, poisoning the cache
    * (ADVICE r5, high). Tracking the one live sfDir and re-registering on
    * every change keeps views and requests in lockstep. Bounded LRU like
    * its sibling caches (VERDICT r5 what's-wrong #3).
    */
  private val registeredDir =
    new java.util.LinkedHashMap[String, String](16, 0.75f, true) {
      override def removeEldestEntry(
          eldest: java.util.Map.Entry[String, String]): Boolean =
        size() > MaxEntries
    }

  private def sessionId(spark: SparkSession): String =
    graft.GraftSession.sessionUuid(spark)

  /** Make the bare-name temp views point at `sfDir`'s tables, re-registering
    * whenever the session's live view set was built for a different dir. */
  private def ensureViews(spark: SparkSession, sfDir: String): Unit = {
    val sid = sessionId(spark)
    if (registeredDir.get(sid) != sfDir) {
      Tables.names.foreach { n =>
        val df = if (n == "events") Tables.events(spark, sfDir)
                 else Tables.load(spark, sfDir, n)
        df.createOrReplaceTempView(n)
      }
      registeredDir.put(sid, sfDir)
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
    cache.clear(); registeredDir.clear()
  }
}
