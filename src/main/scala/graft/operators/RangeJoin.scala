package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed left interval join: pair every left row with the right
  * rows of the same `key` whose timestamp falls in the trailing window
  * `(leftTs - windowMicros, leftTs]` — "events in the preceding hour" —
  * without the per-key cross product Spark plans for a raw range
  * predicate.
  *
  * Shape (the 100 TB story): both sides are bucketed by
  * `ts div windowMicros` and the join key becomes (key, bucket) — the
  * standard interval-join blocking. A right row can only serve left rows
  * in its own bucket or the next one, so the right side is exploded into
  * exactly those two bucket ids: bounded 2× fan-out, shuffle keyed on
  * (key, bucket) so hot keys spread across time buckets, and the exact
  * range predicate filters residues inside the join. No driver state, no
  * window sort; cost is one hash join at 2× right cardinality.
  *
  * Timestamps must be non-negative epoch values (`div` truncation and
  * floor agree there); `right` payload columns come through as-is, null
  * for left rows with no match (left-join semantics).
  */
object RangeJoin {

  def leftPairsInWindow(left: DataFrame, right: DataFrame, key: String,
                        leftTs: String, rightTs: String, windowMicros: Long,
                        payload: Seq[String]): DataFrame = {
    require(windowMicros > 0, "windowMicros must be positive")
    val lb = left.withColumn("__bucket", expr(s"$leftTs div $windowMicros"))
    val rb = right
      .withColumn("__bucket",
        explode(array(expr(s"$rightTs div $windowMicros"),
          expr(s"$rightTs div $windowMicros") + lit(1L))))
      .select((Seq(col(key).as("__rk"), col("__bucket"),
        col(rightTs).as("__rts")) ++
        payload.filterNot(_ == rightTs).map(col)): _*)
    lb.join(rb,
        lb(key) === rb("__rk") && lb("__bucket") === rb("__bucket") &&
        rb("__rts") > lb(leftTs) - windowMicros &&
        rb("__rts") <= lb(leftTs),
        "left")
      .select(left.columns.map(col).toIndexedSeq ++
        payload.map(p => (if (p == rightTs) col("__rts") else col(p)).as(s"win_$p")): _*)
  }
}
