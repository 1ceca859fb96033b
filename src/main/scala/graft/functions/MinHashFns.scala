package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd MinHash signature: given an array of shingle hashes
  * (int64 in [0, 2³¹−1)), emits the 32-component signature
  * (4 bands × 8 rows — see the companion's banding doc)
  * sig[i] = min_h (h·aᵢ + bᵢ) mod P with the fixed coefficient set
  * [[MinHashSig.Coeffs]] (seeded LCG, identical literals in the DuckDB
  * oracle). One fused hashes × 32 loop — the declarative form
  * (32 × array_min(transform(…))) pays an interpreted lambda step per
  * hash per component and dominated the dedup sweep (~6 ms/doc).
  * Empty input ⇒ null (mirrors list_min of an empty list).
  */
final case class MinHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects ARRAY<BIGINT>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val k = MinHashSig.Coeffs.length
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val v = (h * MinHashSig.A(j) + MinHashSig.B(j)) % MinHashSig.P
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", MinHashSig.A, "long[]")
    val bRef = ctx.addReferenceObj("mhB", MinHashSig.B, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val k = MinHashSig.Coeffs.length
      s"""
         |int $n = $c.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $out = new long[$k];
         |  java.util.Arrays.fill($out, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $c.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($h * $aRef[$j] + $bRef[$j]) % ${MinHashSig.P}L;
         |      if ($v < $out[$j]) $out[$j] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val P = 2147483647L

  /** 32 affine functions from java.util.Random(101) — the exact values
    * the oracle SQL embeds as literals. 32 components = 4 bands × 8 rows:
    * 8-row bands keep per-band collisions selective (J⁸), 4 bands lift
    * pair recall at J≈0.95 to ~0.99 (2 bands measured 22/25 on the
    * injected near-dups, right on the 1−(1−J⁸)² curve). */
  val Coeffs: Seq[(Long, Long)] = {
    val rnd = new java.util.Random(101L)
    Seq.fill(32)((1L + math.abs(rnd.nextLong()) % (P - 1), math.abs(rnd.nextLong()) % P))
  }
  val A: Array[Long] = Coeffs.map(_._1).toArray
  val B: Array[Long] = Coeffs.map(_._2).toArray
}

/** Codegen'd word-shingle hashing: given a token array, emits the
  * polyHash (seed 7, ×31, mod 2³¹−1) of every `n`-token shingle joined
  * by single spaces — without materializing the shingle strings. For a
  * document of m tokens that saves m string concats + m interpreted
  * polyHash dispatches per pass; the fold sequence is byte-identical to
  * `polyHash(concat_ws(' ', …))`, so oracle parity is unchanged.
  * Documents with fewer than n tokens yield an empty array (same as the
  * declarative shingles()).
  */
final case class ShingleHash(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hash expects ARRAY<STRING>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m - n + 1)
    var i = 0
    while (i <= m - n) {
      var acc = 7L
      var k = 0
      while (k < n) {
        if (k > 0) acc = (acc * 31L + 32L) % MinHashSig.P // ' ' separator
        val t = toks.getUTF8String(i + k)
        var b = 0
        val nb = t.numBytes()
        while (b < nb) {
          acc = (acc * 31L + (t.getByte(b) & 0xff)) % MinHashSig.P
          b += 1
        }
        k += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val nb = ctx.freshName("nb")
      s"""
         |int $m = $c.numElements();
         |if ($m < $n) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $out = new long[$m - $n + 1];
         |  for (int $i = 0; $i <= $m - $n; $i++) {
         |    long $acc = 7L;
         |    for (int $k = 0; $k < $n; $k++) {
         |      if ($k > 0) $acc = ($acc * 31L + 32L) % ${MinHashSig.P}L;
         |      org.apache.spark.unsafe.types.UTF8String $t = $c.getUTF8String($i + $k);
         |      int $nb = $t.numBytes();
         |      for (int $b = 0; $b < $nb; $b++) {
         |        $acc = ($acc * 31L + ($t.getByte($b) & 0xff)) % ${MinHashSig.P}L;
         |      }
         |    }
         |    $out[$i] = $acc;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}
