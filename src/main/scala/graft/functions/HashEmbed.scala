package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Codegen'd hash-projection embedding (the M2 CLS-vector stand-in):
  * given a token-hash array `th` (int64s in [0, 2³¹−1)), emits the
  * un-normalized `dim`-component projection
  *
  *   out[d] = Σ_h ( ((h · (2d+3)) mod P) / P − 0.5 ),   P = 2³¹−1
  *
  * with the per-dimension sum accumulated left-to-right from 0.0 — the
  * identical IEEE sequence as the declarative
  * `aggregate(th, 0.0, (acc,h) -> acc + …)` fold and its DuckDB
  * `list_reduce` mirror, so oracle results are bit-exact.
  *
  * Exists because the declarative form is a per-dimension higher-order
  * fold: lambdas evaluate interpreted, and any non-trivial expression a
  * lambda captures is re-evaluated per array element — the 16-dim
  * embedding of a 40-token document costs ~10⁴ interpreted steps per row
  * (~80 ms/1k rows measured). This expression is one fused
  * tokens × dims double loop (~1 µs/row): the difference between an
  * embedding sweep being scan-bound or lambda-bound at 100 TB.
  *
  * Registered as SQL function `graft_hash_embed(th)` (dim fixed by the
  * registration, default 16) via [[graft.GraftSession]].
  */
final case class HashEmbed(child: Expression, dim: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes() =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_hash_embed expects ARRAY<BIGINT>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val th = input.asInstanceOf[ArrayData]
    val n = th.numElements()
    val out = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      val m = 2L * d + 3L
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += ((th.getLong(i) * m) % HashEmbed.P).toDouble / HashEmbed.P - 0.5
        i += 1
      }
      out(d) = acc
      d += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val m = ctx.freshName("m")
      s"""
         |int $n = $c.numElements();
         |double[] $out = new double[$dim];
         |for (int $d = 0; $d < $dim; $d++) {
         |  long $m = 2L * $d + 3L;
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double)(($c.getLong($i) * $m) % ${HashEmbed.P}L) / ${HashEmbed.P}L - 0.5;
         |  }
         |  $out[$d] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HashEmbed =
    copy(child = newChild)
}

object HashEmbed {
  val P = 2147483647L
}
