package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused IVFADC scorer:
  * `graft_adc_score(code, cent_id, centIds, qc, cn2, cdotrFlat,
  * qdotrFlat, rn2Flat, qNorm, s, k)` = the approximate cosine of the
  * query against the PQ-coded residual in cell `cent_id`:
  * {{{
  *   (qc[p] + Σ_s qdotr[s][code_s]) /
  *     (qNorm · sqrt(cn2[p] + 2·Σ_s cdotr[p][s][code_s] + Σ_s rn2[s][code_s]))
  * }}}
  * where `p` is `cent_id`'s position in the probe list. All tables are
  * driver-computed per query and folded into the plan as constants
  * (flattened: `qdotr[s][j] = qdotrFlat[s·k + j]`,
  * `cdotr[p][s][j] = cdotrFlat[(p·s̄ + s)·k + j]` with s̄ = subspace
  * count) — nprobe·s·k + 2·s·k + 2·nprobe doubles, the same bounded
  * driver state the pre-fused plan broadcast per query.
  *
  * This replaces the serve plan VERDICT r9 flagged as 13× slower than
  * the int8 path it exists to beat: a per-query broadcast join against
  * an nprobe-row probe table plus 3·s nested
  * `element_at(typedLit(...), element_at(code, ...))` chains per row —
  * Catalyst carried ~24 array-literal probes per row where this loop
  * does 3·s flat-array reads inside whole-stage codegen, no join at
  * all (scan → filter → score → TakeOrderedAndProject).
  *
  * Bit-parity contract with the joined element_at form it replaces
  * (AdcScoreSpec, and transitively the q_v11 family's DuckDB hash
  * oracle): each of the three Σ_s accumulates in ascending-s order
  * (the chains' reduceLeft), the numerator adds qc first, and the
  * denominator folds `(cn2 + 2·cdr) + rn2s` — identical IEEE-754 op
  * order, identical doubles.
  */
final case class AdcScore(code: Expression, centId: Expression,
    centIds: Array[Long], qc: Array[Double], cn2: Array[Double],
    cdotrFlat: Array[Double], qdotrFlat: Array[Double],
    rn2Flat: Array[Double], qNorm: Double, s: Int, k: Int)
  extends BinaryExpression {

  require(centIds.length == qc.length && centIds.length == cn2.length,
    s"graft_adc_score: probe tables disagree — ${centIds.length} cells, " +
      s"${qc.length} qc, ${cn2.length} cn2")
  require(qdotrFlat.length == s * k && rn2Flat.length == s * k,
    s"graft_adc_score: per-subspace tables must be s*k = ${s * k} doubles, " +
      s"got qdotr ${qdotrFlat.length} / rn2 ${rn2Flat.length}")
  require(cdotrFlat.length == centIds.length * s * k,
    s"graft_adc_score: cdotr must be nprobe*s*k = ${centIds.length * s * k} " +
      s"doubles, got ${cdotrFlat.length}")

  override def left: Expression = code
  override def right: Expression = centId

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (code.dataType, centId.dataType) match {
    case (ArrayType(ByteType, _), ByteType | ShortType | IntegerType | LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case (c, i) => TypeCheckResult.TypeCheckFailure(
      s"graft_adc_score expects (ARRAY<TINYINT>, integral cent_id), " +
        s"got (${c.catalogString}, ${i.catalogString})")
  }

  override protected def nullSafeEval(codeV: Any, centV: Any): Any = {
    val codes = codeV.asInstanceOf[ArrayData]
    if (codes.numElements() < s)
      throw new IllegalArgumentException(
        s"graft_adc_score: code has ${codes.numElements()} entries, need $s")
    val cid = centV.asInstanceOf[Number].longValue
    var p = -1
    var ii = 0
    while (p < 0 && ii < centIds.length) {
      if (centIds(ii) == cid) p = ii
      ii += 1
    }
    if (p < 0) throw new IllegalStateException(
      s"graft_adc_score: cent_id $cid is not in the probe set")
    var dotr = 0.0
    var cdr = 0.0
    var rn2s = 0.0
    var s0 = 0
    while (s0 < s) {
      val cj = codes.getByte(s0).toInt
      dotr += qdotrFlat(s0 * k + cj)
      cdr += cdotrFlat((p * s + s0) * k + cj)
      rn2s += rn2Flat(s0 * k + cj)
      s0 += 1
    }
    (qc(p) + dotr) / (qNorm * math.sqrt(cn2(p) + 2.0 * cdr + rn2s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centIdsRef = ctx.addReferenceObj("adcCentIds", centIds, "long[]")
    val qcRef = ctx.addReferenceObj("adcQc", qc, "double[]")
    val cn2Ref = ctx.addReferenceObj("adcCn2", cn2, "double[]")
    val cdotrRef = ctx.addReferenceObj("adcCdotr", cdotrFlat, "double[]")
    val qdotrRef = ctx.addReferenceObj("adcQdotr", qdotrFlat, "double[]")
    val rn2Ref = ctx.addReferenceObj("adcRn2", rn2Flat, "double[]")
    // qNorm rides in a reference too (not a literal in the code text):
    // with every table referenced, the generated code is byte-identical
    // across queries at fixed (s, k, nprobe), so repeated searches hit
    // the codegen cache instead of recompiling. Loading the double from
    // a 1-element array is the same IEEE value — bit parity holds.
    val qNormRef = ctx.addReferenceObj("adcQNorm", Array(qNorm), "double[]")
    nullSafeCodeGen(ctx, ev, (c, cid) => {
      val p = ctx.freshName("p")
      val ii = ctx.freshName("ii")
      val cidL = ctx.freshName("cidL")
      val s0 = ctx.freshName("s0")
      val cj = ctx.freshName("cj")
      val dotr = ctx.freshName("dotr")
      val cdr = ctx.freshName("cdr")
      val rn2s = ctx.freshName("rn2s")
      s"""
         |if ($c.numElements() < $s) {
         |  throw new IllegalArgumentException(
         |    "graft_adc_score: code has " + $c.numElements() +
         |    " entries, need " + $s);
         |}
         |long $cidL = (long) $cid;
         |int $p = -1;
         |for (int $ii = 0; $p < 0 && $ii < $centIdsRef.length; $ii++) {
         |  if ($centIdsRef[$ii] == $cidL) $p = $ii;
         |}
         |if ($p < 0) {
         |  throw new IllegalStateException(
         |    "graft_adc_score: cent_id " + $cidL + " is not in the probe set");
         |}
         |double $dotr = 0.0; double $cdr = 0.0; double $rn2s = 0.0;
         |for (int $s0 = 0; $s0 < $s; $s0++) {
         |  int $cj = (int) $c.getByte($s0);
         |  $dotr += $qdotrRef[$s0 * $k + $cj];
         |  $cdr += $cdotrRef[($p * $s + $s0) * $k + $cj];
         |  $rn2s += $rn2Ref[$s0 * $k + $cj];
         |}
         |${ev.value} = ($qcRef[$p] + $dotr) /
         |  ($qNormRef[0] * java.lang.Math.sqrt($cn2Ref[$p] + 2.0 * $cdr + $rn2s));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScore =
    copy(code = newLeft, centId = newRight)
}

/** BATCH variant of [[AdcScore]] for multi-query serving
  * (`IvfIndex.searchTopKBatch` on PQ layouts): instead of finding the
  * probed cell's table position by scanning a cent-id list, the probe
  * join carries a precomputed GLOBAL PROBE POSITION
  * `gp = queryIndex · nprobe + probeRank`, and every table is indexed
  * directly — `qc[gp]`, `cn2[gp]`, `cdotr[(gp·s̄ + s)·k + j]`,
  * `qdotr[((gp/nprobe)·s̄ + s)·k + j]`, `qNorm[gp/nprobe]`; `rn2` is
  * codebook-only and shared across the batch. Tables for the whole
  * batch are |queries|·nprobe·s̄·k doubles — bounded driver state, the
  * per-query tables concatenated.
  *
  * Per-query bit-parity with [[AdcScore]] (AdcBatchSpec → transitively
  * the q_v11 family's oracle): identical ascending-s fold orders,
  * identical (qc + dotr) / (qNorm · sqrt(cn2 + 2·cdr + rn2s)) shape.
  * All state rides in codegen references, so the generated code is
  * byte-identical across batches at fixed (nprobe, s, k).
  */
final case class AdcScoreAt(code: Expression, gp: Expression,
    qcB: Array[Double], cn2B: Array[Double], cdotrB: Array[Double],
    qdotrB: Array[Double], rn2Flat: Array[Double], qNormB: Array[Double],
    nprobe: Int, s: Int, k: Int)
  extends BinaryExpression {

  require(qcB.length == cn2B.length && qcB.length % math.max(nprobe, 1) == 0,
    s"graft_adc_score_at: qc/cn2 must be |queries|*nprobe entries, " +
      s"got ${qcB.length}/${cn2B.length} at nprobe=$nprobe")
  require(cdotrB.length == qcB.length * s * k,
    s"graft_adc_score_at: cdotr must be |gp|*s*k = ${qcB.length * s * k} " +
      s"doubles, got ${cdotrB.length}")
  require(qdotrB.length == qNormB.length * s * k,
    s"graft_adc_score_at: qdotr must be |queries|*s*k = " +
      s"${qNormB.length * s * k} doubles, got ${qdotrB.length}")
  require(rn2Flat.length == s * k,
    s"graft_adc_score_at: rn2 must be s*k = ${s * k} doubles, " +
      s"got ${rn2Flat.length}")

  override def left: Expression = code
  override def right: Expression = gp

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (code.dataType, gp.dataType) match {
    case (ArrayType(ByteType, _), ByteType | ShortType | IntegerType | LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case (c, i) => TypeCheckResult.TypeCheckFailure(
      s"graft_adc_score_at expects (ARRAY<TINYINT>, integral gp), " +
        s"got (${c.catalogString}, ${i.catalogString})")
  }

  override protected def nullSafeEval(codeV: Any, gpV: Any): Any = {
    val codes = codeV.asInstanceOf[ArrayData]
    if (codes.numElements() < s)
      throw new IllegalArgumentException(
        s"graft_adc_score_at: code has ${codes.numElements()} entries, need $s")
    val p = gpV.asInstanceOf[Number].intValue
    if (p < 0 || p >= qcB.length) throw new IllegalStateException(
      s"graft_adc_score_at: gp $p out of range [0, ${qcB.length})")
    val qi = p / nprobe
    var dotr = 0.0
    var cdr = 0.0
    var rn2s = 0.0
    var s0 = 0
    while (s0 < s) {
      val cj = codes.getByte(s0).toInt
      dotr += qdotrB((qi * s + s0) * k + cj)
      cdr += cdotrB((p * s + s0) * k + cj)
      rn2s += rn2Flat(s0 * k + cj)
      s0 += 1
    }
    (qcB(p) + dotr) / (qNormB(qi) * math.sqrt(cn2B(p) + 2.0 * cdr + rn2s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qcRef = ctx.addReferenceObj("adcbQc", qcB, "double[]")
    val cn2Ref = ctx.addReferenceObj("adcbCn2", cn2B, "double[]")
    val cdotrRef = ctx.addReferenceObj("adcbCdotr", cdotrB, "double[]")
    val qdotrRef = ctx.addReferenceObj("adcbQdotr", qdotrB, "double[]")
    val rn2Ref = ctx.addReferenceObj("adcbRn2", rn2Flat, "double[]")
    val qNormRef = ctx.addReferenceObj("adcbQNorm", qNormB, "double[]")
    nullSafeCodeGen(ctx, ev, (c, g) => {
      val p = ctx.freshName("p")
      val qi = ctx.freshName("qi")
      val s0 = ctx.freshName("s0")
      val cj = ctx.freshName("cj")
      val dotr = ctx.freshName("dotr")
      val cdr = ctx.freshName("cdr")
      val rn2s = ctx.freshName("rn2s")
      s"""
         |if ($c.numElements() < $s) {
         |  throw new IllegalArgumentException(
         |    "graft_adc_score_at: code has " + $c.numElements() +
         |    " entries, need " + $s);
         |}
         |int $p = (int) $g;
         |if ($p < 0 || $p >= $qcRef.length) {
         |  throw new IllegalStateException(
         |    "graft_adc_score_at: gp " + $p + " out of range");
         |}
         |int $qi = $p / $nprobe;
         |double $dotr = 0.0; double $cdr = 0.0; double $rn2s = 0.0;
         |for (int $s0 = 0; $s0 < $s; $s0++) {
         |  int $cj = (int) $c.getByte($s0);
         |  $dotr += $qdotrRef[($qi * $s + $s0) * $k + $cj];
         |  $cdr += $cdotrRef[($p * $s + $s0) * $k + $cj];
         |  $rn2s += $rn2Ref[$s0 * $k + $cj];
         |}
         |${ev.value} = ($qcRef[$p] + $dotr) /
         |  ($qNormRef[$qi] * java.lang.Math.sqrt($cn2Ref[$p] + 2.0 * $cdr + $rn2s));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScoreAt =
    copy(code = newLeft, gp = newRight)
}
