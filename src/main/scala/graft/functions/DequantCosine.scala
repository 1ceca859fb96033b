package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused int8-dequantize → cosine against a constant query vector:
  * `graft_dequant_cosine(q, scale, y)` ≡
  * `cosine(transform(q, b -> double(b) * scale), typedLit(y))`
  * for `q ARRAY<TINYINT>`, `scale DOUBLE` — the quantized-cell serve
  * score of [[graft.operators.IvfIndex]] / [[graft.operators.NswIndex]].
  *
  * Exists because the composed form carries an ArrayTransform HOF, which
  * is CodegenFallback: it disqualifies the whole projection from
  * whole-stage codegen AND materializes the dequantized array per row —
  * twice, since `cosine` expands its argument into both the dot and the
  * norm — putting an interpreted ~O(dim) allocation pipeline inside the
  * partition-pruned scan that is the int8 index's entire hot path. This
  * expression is one codegen'd loop, no allocation.
  *
  * Bit-parity contract with the composed form (DequantCosineSpec, and
  * transitively q_v6f's DuckDB hash oracle): the dot accumulates
  * left-to-right from 0.0 over the common prefix of `q` and `y` with
  * each term `((double) q_i * scale) * y_i`; ‖a‖² accumulates over all
  * of `q`; ‖y‖² over all of `y` (computed once — the fold is
  * deterministic, so once == per-row); the result is
  * `dot / (sqrt(‖a‖²) * sqrt(‖y‖²))` — the identical IEEE sequence as
  * `graft_dotp(a, y) / (sqrt(graft_dotp(a, a)) * sqrt(graft_dotp(y, y)))`.
  *
  * All query-dependent state (`y`, ‖y‖²) rides in codegen REFERENCES, so
  * repeated searches with different query vectors produce byte-identical
  * generated code and hit the codegen cache (no per-query janino
  * compile) — the same plan-stability discipline as [[AdcScore]].
  *
  * Registered as SQL function `graft_dequant_cosine` via
  * [[graft.GraftSession]].
  */
final case class DequantCosine(q: Expression, scale: Expression,
    y: Array[Double]) extends BinaryExpression {

  override def left: Expression = q
  override def right: Expression = scale

  override def dataType: DataType = DoubleType

  /** Σ yᵢ², the same left fold from 0.0 as `graft_dotp(y, y)`. */
  private lazy val yn2: Double = {
    var acc = 0.0
    var i = 0
    while (i < y.length) { acc += y(i) * y(i); i += 1 }
    acc
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (q.dataType, scale.dataType) match {
      case (ArrayType(ByteType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, s) => TypeCheckResult.TypeCheckFailure(
        s"graft_dequant_cosine expects (ARRAY<TINYINT>, DOUBLE), " +
          s"got (${a.catalogString}, ${s.catalogString})")
    }

  override protected def nullSafeEval(qv: Any, scaleV: Any): Any = {
    val codes = qv.asInstanceOf[ArrayData]
    val sc = scaleV.asInstanceOf[Double]
    val nq = codes.numElements()
    val dotN = math.min(nq, y.length)
    var dot = 0.0
    var i = 0
    while (i < dotN) {
      dot += (codes.getByte(i).toDouble * sc) * y(i)
      i += 1
    }
    var n2 = 0.0
    i = 0
    while (i < nq) {
      val a = codes.getByte(i).toDouble * sc
      n2 += a * a
      i += 1
    }
    dot / (math.sqrt(n2) * math.sqrt(yn2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val yRef = ctx.addReferenceObj("dqcY", y, "double[]")
    val yn2Ref = ctx.addReferenceObj("dqcYn2", Array(yn2), "double[]")
    nullSafeCodeGen(ctx, ev, (c, sc) => {
      val nq = ctx.freshName("nq")
      val dotN = ctx.freshName("dotN")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val n2 = ctx.freshName("n2")
      val a = ctx.freshName("a")
      s"""
         |int $nq = $c.numElements();
         |int $dotN = java.lang.Math.min($nq, $yRef.length);
         |double $dot = 0.0;
         |for (int $i = 0; $i < $dotN; $i++) {
         |  $dot += ((double) $c.getByte($i) * $sc) * $yRef[$i];
         |}
         |double $n2 = 0.0;
         |for (int $i = 0; $i < $nq; $i++) {
         |  double $a = (double) $c.getByte($i) * $sc;
         |  $n2 += $a * $a;
         |}
         |${ev.value} = $dot /
         |  (java.lang.Math.sqrt($n2) * java.lang.Math.sqrt($yn2Ref[0]));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DequantCosine =
    copy(q = newLeft, scale = newRight)
}

/** Column-`y` variant of [[DequantCosine]] for BATCH serving, where the
  * query vector arrives joined per row (the probe-table broadcast join
  * of `IvfIndex.searchTopKBatch`) instead of as a per-plan constant:
  * `graft_dequant_cosine_col(q, scale, y)` ≡
  * `cosine(transform(q, b -> double(b) * scale), y)` for
  * `q ARRAY<TINYINT>`, `scale DOUBLE`, `y ARRAY<DOUBLE>` — identical
  * IEEE fold orders (dot over the common prefix, each norm over its own
  * full array), ‖y‖² recomputed per row exactly as the composed
  * `graft_dotp(y, y)` does. Same NaN-on-zero-vector divergence from the
  * ANSI composition as the constant form.
  */
final case class DequantCosineCol(q: Expression, scale: Expression,
    y: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = q
  override def second: Expression = scale
  override def third: Expression = y

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (q.dataType, scale.dataType, y.dataType) match {
      case (ArrayType(ByteType, _), DoubleType,
            ArrayType(DoubleType | FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, s, yv) => TypeCheckResult.TypeCheckFailure(
        s"graft_dequant_cosine_col expects (ARRAY<TINYINT>, DOUBLE, " +
          s"ARRAY<FLOAT|DOUBLE>), got (${a.catalogString}, " +
          s"${s.catalogString}, ${yv.catalogString})")
    }

  private def yIsFloat: Boolean = y.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(qv: Any, scaleV: Any, yv: Any): Any = {
    val codes = qv.asInstanceOf[ArrayData]
    val sc = scaleV.asInstanceOf[Double]
    val ys = yv.asInstanceOf[ArrayData]
    val fl = yIsFloat
    def yAt(i: Int): Double =
      if (fl) ys.getFloat(i).toDouble else ys.getDouble(i)
    val nq = codes.numElements()
    val ny = ys.numElements()
    val dotN = math.min(nq, ny)
    var dot = 0.0
    var i = 0
    while (i < dotN) {
      dot += (codes.getByte(i).toDouble * sc) * yAt(i)
      i += 1
    }
    var n2 = 0.0
    i = 0
    while (i < nq) {
      val a = codes.getByte(i).toDouble * sc
      n2 += a * a
      i += 1
    }
    var yn2 = 0.0
    i = 0
    while (i < ny) { yn2 += yAt(i) * yAt(i); i += 1 }
    dot / (math.sqrt(n2) * math.sqrt(yn2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, sc, yv) => {
      val nq = ctx.freshName("nq")
      val ny = ctx.freshName("ny")
      val dotN = ctx.freshName("dotN")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val n2 = ctx.freshName("n2")
      val yn2 = ctx.freshName("yn2")
      val a = ctx.freshName("a")
      val yd = ctx.freshName("yd")
      val yGet =
        if (yIsFloat) s"(double) $yv.getFloat($i)" else s"$yv.getDouble($i)"
      s"""
         |int $nq = $c.numElements();
         |int $ny = $yv.numElements();
         |int $dotN = java.lang.Math.min($nq, $ny);
         |double $dot = 0.0;
         |for (int $i = 0; $i < $dotN; $i++) {
         |  $dot += ((double) $c.getByte($i) * $sc) * ($yGet);
         |}
         |double $n2 = 0.0;
         |for (int $i = 0; $i < $nq; $i++) {
         |  double $a = (double) $c.getByte($i) * $sc;
         |  $n2 += $a * $a;
         |}
         |double $yn2 = 0.0;
         |for (int $i = 0; $i < $ny; $i++) {
         |  double $yd = $yGet;
         |  $yn2 += $yd * $yd;
         |}
         |${ev.value} = $dot /
         |  (java.lang.Math.sqrt($n2) * java.lang.Math.sqrt($yn2));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): DequantCosineCol =
    copy(q = newFirst, scale = newSecond, y = newThird)
}
