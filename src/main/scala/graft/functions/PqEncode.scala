package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused product-quantization encoder:
  * `graft_pq_encode(vec, flatCb, s, k, d)` = ARRAY&lt;TINYINT&gt; of `s`
  * codes, where code s0 = argmin_j ||vec[s0·d .. s0·d+d) − cb[s0][j]||²
  * (ties → smallest j) over a codebook passed FLAT
  * (cb[s0][j][i] = flatCb[(s0·k + j)·d + i], a constant folded into the
  * plan and referenced as one double[] — 1024 doubles at the 8×16×8
  * default geometry).
  *
  * This is the "fused codebook expression" production path that
  * q_v10's scaladoc promised (VERDICT r6 plan audit: the encode argmin
  * over nested per-(s,j) literal expression chains was the dominant
  * cost of the two slowest bench queries — S×K×D = 1024 scalar
  * sub-expressions per row for Catalyst to carry vs one tight loop
  * here). Bit-parity contract with the literal chain it replaces
  * (PqEncodeSpec): distances accumulate diff² in ascending-i order
  * (the chain's reduceLeft), the argmin keeps the FIRST minimum
  * (strict `<`, ascending j — exactly `array_min` over (dist, j)
  * structs), and all-NaN distances resolve to code 0 like the struct
  * ordering's tie rule.
  */
final case class PqEncode(child: Expression, cbFlat: Array[Double],
    s: Int, k: Int, d: Int) extends UnaryExpression {

  require(cbFlat.length == s * k * d,
    s"graft_pq_encode: codebook length ${cbFlat.length} != s*k*d = ${s * k * d}")
  require(k <= 128, s"graft_pq_encode: k=$k does not fit a tinyint code")

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode expects ARRAY<DOUBLE>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    // on UnsafeArrayData an out-of-bounds getDouble can silently read
    // garbage instead of throwing, and the function is SQL-registered —
    // fail loudly on a short vector (ADVICE r7, low)
    if (v.numElements() < s * d)
      throw new IllegalArgumentException(
        s"graft_pq_encode: vector has ${v.numElements()} elements, " +
          s"need at least s*d = ${s * d}")
    val codes = new Array[Byte](s)
    var s0 = 0
    while (s0 < s) {
      var best = 0
      var bestDist = Double.PositiveInfinity
      var j = 0
      while (j < k) {
        val base = (s0 * k + j) * d
        var dist = 0.0
        var i = 0
        while (i < d) {
          val diff = v.getDouble(s0 * d + i) - cbFlat(base + i)
          dist += diff * diff
          i += 1
        }
        if (dist < bestDist) { bestDist = dist; best = j }
        j += 1
      }
      codes(s0) = best.toByte
      s0 += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", cbFlat, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val codes = ctx.freshName("codes")
      val s0 = ctx.freshName("s0")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val base = ctx.freshName("base")
      val dist = ctx.freshName("dist")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestDist = ctx.freshName("bestDist")
      s"""
         |if ($c.numElements() < ${s * d}) {
         |  throw new IllegalArgumentException(
         |    "graft_pq_encode: vector has " + $c.numElements() +
         |    " elements, need at least s*d = " + ${s * d});
         |}
         |byte[] $codes = new byte[$s];
         |for (int $s0 = 0; $s0 < $s; $s0++) {
         |  int $best = 0; double $bestDist = Double.POSITIVE_INFINITY;
         |  for (int $j = 0; $j < $k; $j++) {
         |    int $base = ($s0 * $k + $j) * $d;
         |    double $dist = 0.0;
         |    for (int $i = 0; $i < $d; $i++) {
         |      double $diff = $c.getDouble($s0 * $d + $i) - $cbRef[$base + $i];
         |      $dist += $diff * $diff;
         |    }
         |    if ($dist < $bestDist) { $bestDist = $dist; $best = $j; }
         |  }
         |  $codes[$s0] = (byte) $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}
