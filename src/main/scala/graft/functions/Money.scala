package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, DoubleType, LongType}

/** Exact fixed-point money arithmetic for large aggregations.
  *
  * `sum(cast(x as decimal(18,4)))` is bit-exact but runs the whole
  * aggregation on Decimal values — object churn + overflow checks on
  * every row (measured: the decimal sum alone doubles q_j1b's
  * fact-side aggregate cost vs a primitive sum over the same scan).
  * The fixed-point form splits the work:
  *
  *  1. per row, [[MoneyScaled]] rounds the double to `scale` decimal
  *     places EXACTLY like Spark's double→decimal cast (same
  *     `BigDecimal.valueOf(x).setScale(scale, HALF_UP)` — bit-identical
  *     results by construction) and returns the UNSCALED int64;
  *  2. the hot partial aggregation is a codegen'd primitive
  *     `sum(long)` — per-partition partials are exact because
  *     `spark.sql.files.maxPartitionBytes` bounds partition rows
  *     (~1e7) and money magnitudes are ≤ ~1e9 scaled units, so a
  *     partition's sum stays far below 2^63;
  *  3. the final merge converts each per-partition long back to
  *     decimal via [[LongToMoney]] and decimal-sums THOSE — O(groups ×
  *     partitions) rows, so the unbounded-cardinality tier runs in
  *     exact decimal where int64 headroom can no longer be proven.
  *
  * This is the shape Spark's own DecimalAggregates optimization uses
  * for small precisions (sum of UnscaledValue + MakeDecimal) — that
  * rule caps at precision 8 because it must assume adversarial
  * magnitudes; the two-tier form keeps the primitive fast path at any
  * scale by moving the headroom argument to the partition level, where
  * the input format bounds it.
  */
object Money {
  /** `x` rounded to `scale` decimal places, returned as the unscaled
    * int64 — bit-for-bit the value Spark's `cast(x as decimal(p,s))`
    * would hold. HALF_UP on the shortest decimal representation of the
    * double, exactly as `Decimal.set(BigDecimal.valueOf(x), p, s)`.
    *
    * Edge inputs follow Spark's NON-ANSI cast (ADVICE r12 #2 — the
    * function is registered session-wide as `graft_money_scaled`, so
    * arbitrary SQL can feed it arbitrary doubles): NaN/±Infinity → null
    * (`BigDecimal.valueOf` would throw), and a value whose unscaled form
    * exceeds decimal(18,s) precision — |unscaled| >= 10^18 — → null,
    * exactly where the non-ANSI cast nulls (ADVICE r13 #1: the earlier
    * 2^63 bound left a [1e18, 2^63) window where the UDF returned a
    * value the cast would null — the contract is now bit-for-bit on the
    * WHOLE double domain, not just bounded callers). 10^18 < 2^63, so
    * the surviving unscaled value always fits the returned long. */
  private val MaxUnscaled = java.math.BigInteger.TEN.pow(18)

  def scaledLongOrNull(x: Double, scale: Int): java.lang.Long = {
    if (!java.lang.Double.isFinite(x)) return null
    val unscaled = java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP)
      .unscaledValue()
    if (unscaled.abs().compareTo(MaxUnscaled) >= 0) null
    else java.lang.Long.valueOf(unscaled.longValue())
  }
}

/** Codegen'd per-row money scaling (tier 1 of [[Money]]). Nullable even
  * over non-null input: NaN/±Infinity and int64-overflowing magnitudes
  * yield null, mirroring the non-ANSI double→decimal cast (see
  * [[Money.scaledLongOrNull]]). */
final case class MoneyScaled(child: Expression, scale: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"MoneyScaled expects DOUBLE, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    Money.scaledLongOrNull(input.asInstanceOf[Double], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_r =
        graft.functions.Money.scaledLongOrNull($c, $scale);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r.longValue();
      }""")

  override protected def withNewChildInternal(newChild: Expression): MoneyScaled =
    copy(child = newChild)
}

/** Unscaled int64 → decimal(precision, scale), exact (tier 3 of
  * [[Money]] — the per-partition partial rejoining the decimal
  * domain). */
final case class LongToMoney(child: Expression, precision: Int, scale: Int)
    extends UnaryExpression {

  override def dataType: DataType = DecimalType(precision, scale)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"LongToMoney expects BIGINT, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    Decimal(input.asInstanceOf[Long], precision, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.types.Decimal.apply($c, $precision, $scale);")

  override protected def withNewChildInternal(newChild: Expression): LongToMoney =
    copy(child = newChild)
}
