package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** The fixed-point money path's two promises (graft.functions.Money):
  * bit-parity with `cast(double as decimal)` including the NaN/Infinity/
  * overflow null edges (ADVICE r12 #2), and the tier-1 `sum(long)`
  * headroom assumption measured against the ACTUAL lineitem scan
  * (ADVICE r12 #4 — the overflow-safety invariant was previously
  * asserted in prose only).
  */
class MoneySpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)
  private val sf = "/root/testdata/sf0.001"

  test("graft_money_scaled is bit-identical to cast(x as decimal(18,4))") {
    import spark.implicits._
    val xs = Seq(0.0, -0.0, 1.23455, -1.23455, 0.00005, -0.00005,
      123456.78901, 99999999999.9999, -99999999999.9999, 1e-12, 7.777777)
    val df = xs.toDF("x")
    val got = df.select(
      call_function("graft_long_to_money",
        call_function("graft_money_scaled", col("x"), lit(4)),
        lit(18), lit(4)).as("m"),
      col("x").cast("decimal(18,4)").as("c")).collect()
    got.foreach { r =>
      assert(r.getDecimal(0) == r.getDecimal(1),
        s"mismatch: money=${r.getDecimal(0)} cast=${r.getDecimal(1)}")
    }
  }

  test("the [1e18, 2^63) precision-overflow window nulls like the cast") {
    // ADVICE r13 #1: unscaled values in [10^18, 2^63) fit int64 but
    // overflow decimal(18,4) — the cast nulls there, so must the UDF.
    // 5e14 @ scale 4 → unscaled 5e18; 9e14 → 9e18; both inside the
    // window. 9.99e13 → 9.99e17 stays valid on both sides.
    import spark.implicits._
    // try_cast: the session is ANSI, where a plain cast THROWS on
    // precision overflow; try_cast nulls there — the exact non-ANSI
    // cast semantics the UDF contract names
    val rows = Seq(5e14, -5e14, 9e14, 9.99e13, -9.99e13).toDF("x")
      .select(
        call_function("graft_money_scaled", col("x"), lit(4)).as("m"),
        expr("try_cast(x as decimal(18,4))").as("c")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"null-edge mismatch at ${r}")
    }
    assert(rows.count(_.isNullAt(0)) == 3)
  }

  test("NaN/Infinity/overflow yield null, like the non-ANSI cast") {
    import spark.implicits._
    val df = Seq(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 1e300, -1e300).toDF("x")
    val rows = df.select(
      call_function("graft_money_scaled", col("x"), lit(4)).as("m")).collect()
    assert(rows.forall(_.isNullAt(0)),
      s"expected all null, got ${rows.mkString(",")}")
    // null input stays null (UnaryExpression null propagation)
    val n = Seq[Option[Double]](None).toDF("x")
      .select(call_function("graft_money_scaled", col("x"), lit(4)).as("m"))
      .collect()
    assert(n.head.isNullAt(0))
  }

  test("tier-1 sum(long) headroom holds on the actual lineitem scan") {
    // per-partition count * max|cents| is the worst-case magnitude a
    // partition partial can reach; the q_j1b fast path is sound only
    // while that stays far below 2^63. Measured per partition of the
    // REAL scan (spark_partition_id after the parquet read), with a
    // 1000x safety factor — a future upstream change that repartitions
    // lineitem into giant partitions or widens money magnitudes fails
    // here loudly instead of wrapping silently in production.
    val cents = call_function("graft_money_scaled",
      col("l_extendedprice") * (lit(1.0) - col("l_discount")), lit(4))
    val perPart = Tables.lineitem(spark, sf)
      .select(cents.as("cents"))
      .withColumn("__pid", spark_partition_id())
      .groupBy("__pid")
      .agg(count(lit(1)).as("n"), max(abs(col("cents"))).as("maxAbs"))
      .collect()
    assert(perPart.nonEmpty)
    perPart.foreach { r =>
      val worst = BigInt(r.getLong(1)) * BigInt(r.getLong(2))
      assert(worst * 1000 < BigInt(Long.MaxValue),
        s"partition ${r.getInt(0)}: n=${r.getLong(1)} maxAbs=${r.getLong(2)} " +
          s"worst=$worst approaches Long.MaxValue")
    }
  }
}
