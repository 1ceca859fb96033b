package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed left as-of join: for every left row, attach the newest
  * right row whose `ts` is <= the left row's `ts` within the same `key`
  * (the financial tick↔quote / price↔news-sentiment merge).
  *
  * Shape (the 100 TB story): instead of a range join — which Spark plans
  * as a per-key cross product with a post-filter, quadratic in per-key
  * row counts — both sides are UNIONed with a side tag and processed by
  * ONE window pass: hash-partition on `key`, sort by (ts, side), and
  * `last(payload, ignoreNulls)` carries the newest right payload forward
  * into each left row. One exchange + one sort, O(1) state per row, no
  * fan-out; skew behavior is that of any per-key window (a key's rows
  * sort within one partition, payloads stay narrow).
  *
  * Tie semantics: a right row at exactly left's `ts` sorts BEFORE the
  * left row (side 0 < 1), so equal timestamps match — the same >=
  * inclusive rule as DuckDB's `ASOF LEFT JOIN ... ON l.ts >= r.ts`,
  * which is the oracle for `q_j2_asof_join`.
  *
  * `right` must be unique per (key, ts) — pre-aggregate if it is not —
  * otherwise "the" as-of row is ill-defined in any engine.
  */
object AsofJoin {

  /** @param payload right columns to carry; each emitted as `asof_<name>`,
    *                 null where the left row has no prior right row. */
  def leftAsof(left: DataFrame, right: DataFrame,
               key: String, ts: String, payload: Seq[String]): DataFrame = {
    val r = right.select(col(key), col(ts),
      struct(payload.map(col): _*).as("__p"))
    val pType = r.schema("__p").dataType
    val lCols = left.columns
    val l = left.select(
      Seq(col(key), col(ts), lit(1).as("__side"),
        struct(lCols.map(col).toIndexedSeq: _*).as("__l"),
        lit(null).cast(pType).as("__p")): _*)
    val rTagged = r.select(
      Seq(col(key), col(ts), lit(0).as("__side"),
        lit(null).cast(l.schema("__l").dataType).as("__l"),
        col("__p")): _*)
    windowTail(l.unionByName(rTagged), key, ts, Nil, lCols, payload)
  }

  /** One-source variant: left and right rows are discriminated out of the
    * SAME input by a predicate — the two-DataFrame shape above plans a
    * union of two scans of that source; this plans ONE scan feeding one
    * exchange + one sort, which at any scale halves the read and at small
    * per-query volumes removes most of the fixed per-stage cost (q_j2 at
    * the x5 tier: 3 exchanges + 2 scans → 1 + 1).
    *
    * `rightTie` columns order right rows WITHIN an equal (key, ts) group
    * (ascending, nulls first), so the LAST right row at the as-of
    * timestamp supplies the payload. Passing the value column makes the
    * carried payload the per-(key, ts) MAX without the pre-aggregation
    * exchange `leftAsof`'s uniqueness contract would otherwise force —
    * max-of-ties composes into the same sort the window already pays.
    * With `rightTie` empty the uniqueness contract of [[leftAsof]]
    * applies unchanged. */
  def leftAsofOneSource(src: DataFrame, isLeft: Column,
      key: String, ts: String, leftCols: Seq[String],
      payload: Seq[String], rightTie: Seq[String] = Nil): DataFrame = {
    // a NULL discriminator classifies as RIGHT (ADVICE r14 #2): the
    // coalesce makes the three-valued `when` explicit instead of
    // falling through `otherwise` by accident — callers with rows that
    // are neither side must filter them out beforehand
    val isL = coalesce(isLeft, lit(false))
    // both structs are nulled on the side that never reads them — right
    // rows are dropped by the __side filter, so carrying their __l
    // through the exchange+sort would roughly double the shuffled width
    // of the right side for nothing (left rows' __p likewise)
    val lType = src.select(struct(leftCols.map(col): _*).as("__l"))
      .schema("__l").dataType
    val tagged = src.select(
      Seq(col(key), col(ts),
        when(isL, lit(1)).otherwise(lit(0)).as("__side"),
        when(isL, struct(leftCols.map(col): _*))
          .otherwise(lit(null).cast(lType)).as("__l"),
        when(isL, lit(null)).otherwise(struct(payload.map(col): _*))
          .as("__p")) ++
      rightTie.map(c =>
        when(isL, lit(null)).otherwise(col(c)).as(s"__tb_$c")): _*)
    windowTail(tagged, key, ts, rightTie.map(c => s"__tb_$c"),
      leftCols, payload)
  }

  /** The shared core: one hash exchange on `key`, one sort on
    * (ts, side, tie...), a running `last(payload, ignoreNulls)`. */
  private def windowTail(tagged: DataFrame, key: String, ts: String,
      tieCols: Seq[String], leftCols: Seq[String],
      payload: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy((col(ts) +: col("__side") +: tieCols.map(col)).map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)).toIndexedSeq ++
        payload.map(p => col(s"__asof.$p").as(s"asof_$p")): _*)
  }
}
