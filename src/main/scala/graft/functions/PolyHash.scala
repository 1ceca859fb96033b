package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial string hash:
  * `acc₀ = 7; accᵢ = (accᵢ₋₁ · 31 + byteᵢ) mod (2³¹−1)`.
  *
  * Semantically identical (for ASCII input — the testdata guarantee) to
  * the declarative form `aggregate(split(s, ''), 7, (a, c) -> (a*31 +
  * ascii(c)) % P)` and to its DuckDB mirror in
  * [[graft.operators.TextOps.polyHashSql]], but runs as a tight
  * whole-stage-codegen'd byte loop instead of an interpreted
  * higher-order-function fold. The HOF form costs ~60 µs per character
  * (per-element lambda binding, single-char UTF8String allocation from
  * `split`); this is ~1 ns per byte — the difference between a text
  * fingerprint sweep being scan-bound or hash-bound at 100 TB.
  *
  * Registered as SQL function `graft_polyhash` via
  * [[graft.GraftSession]]'s `SparkSessionExtensions` so every entry point
  * (and plain `spark.sql`) can use it.
  */
final case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_polyhash expects STRING, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    var acc = PolyHash.Seed
    var i = 0
    val n = s.numBytes()
    while (i < n) {
      acc = (acc * 31L + (s.getByte(i) & 0xff)) % PolyHash.P
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |long $acc = ${PolyHash.Seed}L;
         |int $n = $c.numBytes();
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc = ($acc * 31L + ($c.getByte($i) & 0xff)) % ${PolyHash.P}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  val Seed = 7L
  val P = 2147483647L
}
