package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product of two ARRAY<FLOAT|DOUBLE> columns, accumulated
  * left-to-right from 0.0 with each element widened to double before the
  * multiply — the identical IEEE sequence as the declarative
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0.0, +)` fold
  * and its DuckDB `list_reduce(list_prepend(0.0, …))` mirror, so every
  * oracled cosine stays bit-exact (VectorOpsSpec pins the equality).
  *
  * Exists because the HOF form evaluates its lambdas interpreted, per
  * element — the same cost class HashEmbed eliminated for embeddings
  * (~60 µs/row vs ~1 µs fused). Every cosine in the vector family (exact
  * kNN, batch kNN, LSH/IVF/NSW rescoring, near-dup verification) runs on
  * this one tight loop, and unlike a per-dimension expression chain it
  * neither overflows Catalyst's recursion nor busts the codegen method
  * limit at high dimensionality (see DotConst).
  *
  * Elements are assumed non-null (embedding vectors are dense); a null
  * ARRAY on either side yields null. Lengths may differ — the fold runs
  * over the common prefix (zip semantics).
  *
  * Registered as SQL function `graft_dotp(a, b)` via [[graft.GraftSession]].
  */
final case class DotPair(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression) = e.dataType match {
    case ArrayType(t, _) => t
    case other => other
  }

  override def checkInputDataTypes() = {
    val ok = Seq(left, right).forall(e => elemType(e) match {
      case FloatType | DoubleType => e.dataType.isInstanceOf[ArrayType]
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dotp expects two ARRAY<FLOAT|DOUBLE>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    val n = math.min(av.numElements(), bv.numElements())
    val aFloat = elemType(left) == FloatType
    val bFloat = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) av.getFloat(i).toDouble else av.getDouble(i)
      val y = if (bFloat) bv.getFloat(i).toDouble else bv.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(src: String, e: Expression) =
        if (elemType(e) == FloatType) s"(double)$src.getFloat($i)"
        else s"$src.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(a, left)} * ${get(b, right)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotPair =
    copy(left = newLeft, right = newRight)
}
