package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity contract of the fused `graft_dequant_cosine` expression
  * (functions/DequantCosine) against the composed HOF form it replaces
  * in the int8 serve paths:
  * `cosine(transform(q, b -> double(b) * scale), typedLit(y))`.
  * Exact `==` on doubles — this is what keeps q_v6f's DuckDB hash
  * oracle green across the swap.
  */
class DequantCosineSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)

  private val dim = 64

  /** Deterministic int8 rows spanning sign changes, clipping range and a
    * scale spread. */
  private def rows(n: Int, zeroRow: Long = -1L) = {
    import spark.implicits._
    (0 until n).map { i =>
      val q =
        if (i.toLong == zeroRow) Seq.fill(dim)(0.toByte)
        else Seq.tabulate(dim)(d =>
          (math.sin(i * 3.7 + d * 1.3) * 127.0).round.toByte)
      val scale = 1e-3 + (i % 11) * 7e-3
      (i.toLong, q, scale)
    }.toDF("vec_id", "q", "scale")
  }

  private val y: Seq[Double] = (0 until dim).map(d => math.cos(d * 0.61) * 0.8)

  test("fused == composed, bit-exact") {
    val df = rows(40)
    val composed = graft.operators.VectorOps.cosine(
      transform(col("q"), b => b.cast("double") * col("scale")),
      typedLit(y))
    val got = df.select(
      col("vec_id"),
      call_function("graft_dequant_cosine",
        col("q"), col("scale"), typedLit(y)).as("fused"),
      composed.as("composed")).collect()
    assert(got.length == 40)
    got.foreach { r =>
      val (f, c) = (r.getDouble(1), r.getDouble(2))
      assert(java.lang.Double.doubleToRawLongBits(f) ==
        java.lang.Double.doubleToRawLongBits(c),
        s"row ${r.getLong(0)}: fused=$f composed=$c")
    }
  }

  test("zero vector: fused yields NaN where the ANSI composed form throws") {
    // the one documented divergence — cos of the all-zero vector is
    // 0/0. Under ANSI the HOF composition raises DIVIDE_BY_ZERO; the
    // fused expression computes the double division (NaN), so a single
    // degenerate row can't kill a million-row index serve.
    val df = rows(3, zeroRow = 1L)
    val fused = df.select(col("vec_id"),
      call_function("graft_dequant_cosine",
        col("q"), col("scale"), typedLit(y)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fused(1L).isNaN)
    assert(!fused(0L).isNaN && !fused(2L).isNaN)
    val composed = graft.operators.VectorOps.cosine(
      transform(col("q"), b => b.cast("double") * col("scale")),
      typedLit(y))
    val thrown = intercept[Exception] {
      df.select(composed.as("s")).collect()
    }
    assert(thrown.getMessage.contains("DIVIDE_BY_ZERO"),
      s"expected ANSI DIVIDE_BY_ZERO, got: ${thrown.getMessage.take(200)}")
  }

  test("interpreted eval matches codegen") {
    // force the interpreted path through a non-codegen context: eval on
    // the driver via a collected-literal round trip
    val q = Seq.tabulate(dim)(d => ((d * 37 % 255) - 127).toByte)
    val scale = 0.013
    val expr = graft.functions.DequantCosine(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          q.map(b => b: Any).toArray),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.ByteType, containsNull = false)),
      org.apache.spark.sql.catalyst.expressions.Literal(scale),
      y.toArray)
    val interp = expr.eval(null).asInstanceOf[Double]
    val viaPlan = rows(1).select(
      call_function("graft_dequant_cosine",
        typedLit(q), lit(scale), typedLit(y)).as("s"))
      .head().getDouble(0)
    assert(java.lang.Double.doubleToRawLongBits(interp) ==
      java.lang.Double.doubleToRawLongBits(viaPlan))
  }

  test("null array or null scale yields null") {
    val df = rows(3)
      .withColumn("qn", when(col("vec_id") === 0, col("q")))
      .withColumn("sn", when(col("vec_id") === 1, col("scale")))
    val got = df.select(
      call_function("graft_dequant_cosine",
        col("qn"), col("sn"), typedLit(y)).as("s"))
      .collect().map(r => r.isNullAt(0))
    // row 0: scale null; row 1: q null; row 2: both null
    assert(got.forall(identity))
  }
}
