package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product of an ARRAY<DOUBLE> column with a CONSTANT query
  * vector, accumulated left-to-right from 0.0 (the same IEEE sequence as
  * the declarative `element_at(v,1)*q1 + element_at(v,2)*q2 + …` chain and
  * the oracle's `list_dot_product`-style fold).
  *
  * Exists because the declarative chain stops being an option at high
  * dimensionality: a 768-term expression tree overflows Catalyst's
  * tree-transform recursion when built left-deep, and balanced it still
  * exceeds the codegen method-size limit, dropping the whole stage to
  * interpreted eval (~10× slower — measured 1.25 s vs 0.1 s for the
  * 1e5 × 768-d kNN probe). This is one tight double loop with the query
  * vector held as a codegen reference object; scoring stays inside
  * WholeStageCodegen at any dimensionality.
  *
  * Registered as SQL function `graft_dot(v, constVec)` via
  * [[graft.GraftSession]]; `constVec` must be a foldable array literal,
  * evaluated once at resolution.
  */
final case class DotConst(child: Expression, qv: Seq[Double]) extends UnaryExpression {

  @transient private lazy val qvArr: Array[Double] = qv.toArray

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes() =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_dot expects ARRAY<DOUBLE>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), qvArr.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += v.getDouble(i) * qvArr(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val qvRef = ctx.addReferenceObj("qv", qvArr, "double[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($c.numElements(), $qvRef.length);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $c.getDouble($i) * $qvRef[$i];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DotConst =
    copy(child = newChild)
}
