package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd token-array helpers for the scoring hot path. Both replace
  * interpreted higher-order folds that cost ~1 µs per token per lambda —
  * at ~200 tokens/doc × 4 count passes that dominated the 100k-doc
  * scoring sweep.
  *
  * r7: the scoring fan-out itself moved onto the single-pass
  * [[FieldStats]] struct, which fuses this counting with normalization
  * and hashing. [[TokenLexCount]] remains the SQL-callable
  * (`graft_lexcount`) compositional form and the executable parity
  * reference FieldStatsSpec checks the fused loop against — same role
  * `TextOps.normalizeTextRegex` plays for `graft_norm`.
  * [[TokenHashes]] stays the hot path wherever only token hashes are
  * needed (q_m2, dup-n-gram windows).
  */

/** Counts positive/negative lexicon hits over a token array in one pass:
  * returns `array(posCount, negCount)`. Token comparison is exact
  * UTF8String equality against the baked lexicons (same semantics as the
  * oracle's `list_contains(['fast', …], t)`).
  */
final case class TokenLexCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lexcount expects ARRAY<STRING>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    var pos = 0; var neg = 0
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (TokenLexCount.PosSet.contains(t)) pos += 1
      else if (TokenLexCount.NegSet.contains(t)) neg += 1
      i += 1
    }
    new GenericArrayData(Array(pos, neg))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val posRef = ctx.addReferenceObj("lexPos", TokenLexCount.PosSet, "java.util.HashSet")
    val negRef = ctx.addReferenceObj("lexNeg", TokenLexCount.NegSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val pos = ctx.freshName("pos")
      val neg = ctx.freshName("neg")
      val t = ctx.freshName("t")
      s"""
         |int $n = $c.numElements();
         |int $pos = 0; int $neg = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $t = $c.getUTF8String($i);
         |  if ($posRef.contains($t)) $pos++;
         |  else if ($negRef.contains($t)) $neg++;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new int[]{$pos, $neg});
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TokenLexCount =
    copy(child = newChild)
}

object TokenLexCount {
  /** The deterministic scoring lexicons (kept here so the expression can
    * bake them; [[graft.operators.Scorers]] re-exports). */
  val Positive: Seq[String] = Seq("fast", "big", "spark", "merge", "join")
  val Negative: Seq[String] = Seq("slow", "small", "hash", "filter")

  val PosSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    Positive.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  val NegSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    Negative.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
}

/** polyHash of every token in one pass (replaces
  * `transform(toks, polyHash)` whose per-element lambda dispatch is
  * interpreted). Identical values to [[PolyHash]] per token.
  */
final case class TokenHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_token_hashes expects ARRAY<STRING>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      var acc = PolyHash.Seed
      var b = 0
      val nb = t.numBytes()
      while (b < nb) {
        acc = (acc * 31L + (t.getByte(b) & 0xff)) % PolyHash.P
        b += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val acc = ctx.freshName("acc")
      val b = ctx.freshName("b")
      val nb = ctx.freshName("nb")
      s"""
         |int $n = $c.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $t = $c.getUTF8String($i);
         |  long $acc = ${PolyHash.Seed}L;
         |  int $nb = $t.numBytes();
         |  for (int $b = 0; $b < $nb; $b++) {
         |    $acc = ($acc * 31L + ($t.getByte($b) & 0xff)) % ${PolyHash.P}L;
         |  }
         |  $out[$i] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
}
