package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import TextOps._

/** The model-scoring surface of the reference's sentiment service
  * (SURVEY.md §2.6 M1–M4: the sentiment_analysis_service/logic modules)
  * as a pluggable `Scorer` interface.
  *
  * The reference runs CryptoBERT/FinBERT/3 HF-API LLMs per article
  * (make_analysis.py:12-98). Model inference itself is out of scope in a
  * zero-egress build, so the shipped implementations are *deterministic
  * stand-ins* with the same output contract — `struct(label, score)` per
  * (model, text) — built entirely from codegen'd column expressions:
  *
  *  - [[LexiconScorer]] (M1 stand-in): label from a positive/negative
  *    lexicon count difference, score a bounded ratio; per-model `alpha`
  *    varies the score so the 5 "models" disagree like real ones.
  *  - [[LexiconScorer]] with `failEvery > 0` (M3 stand-in): simulates the
  *    per-row LLM timeout path — rows whose content hash falls on the
  *    model's residue emit the reference's fallback `('None', 0.0)`
  *    (llm.py:73-76,100-106) — failure isolation as column logic, X6.
  *  - [[hashEmbedding]] (M2 stand-in): deterministic hash-projection
  *    embedding (dim configurable), L2-normalized like a CLS vector.
  *
  * A model-backed implementation plugs in behind the same interface as a
  * Scala UDF (or `mapPartitions` batch scorer) returning the identical
  * struct — nothing downstream changes. Every stand-in has an exact
  * DuckDB-SQL mirror so the full 20-output fan-out is oracle-checkable.
  *
  * Scale: all scorers are narrow per-row expressions; the fan-out of
  * 5 models × 2 fields is one projection (no joins, no shuffle) — the
  * reference's per-article HTTP loop (news_etl_dag.py:100) becomes a
  * single map stage over the corpus scan.
  */
object Scorers {

  val Positive: Seq[String] = graft.functions.TokenLexCount.Positive
  val Negative: Seq[String] = graft.functions.TokenLexCount.Negative

  private def posList = Positive.map(w => s"'$w'").mkString("[", ", ", "]")
  private def negList = Negative.map(w => s"'$w'").mkString("[", ", ", "]")

  /** One deterministic scorer = one "model". `alpha` perturbs the score
    * formula per model; `failEvery`/`failResidue` simulate M3's per-row
    * LLM failure channel (0 = never fails, the BERT-like M1 path).
    */
  final case class LexiconScorer(
      name: String,
      alpha: Double,
      failEvery: Int = 0,
      failResidue: Int = 0) {

    /** struct(label string, score double) from PRE-MATERIALIZED
      * pos-count / neg-count / content-hash columns. The expensive
      * tokenize+hash expressions must be computed once per field in a
      * prior projection (see [[Scorers.withFieldStats]]) — inlining them
      * per model multiplies the codegen'd expression tree 10× and blows
      * whole-stage codegen out of the JIT-able range.
      */
    def scoreFromCounts(pos: Column, neg: Column, textHash: Column): Column = {
      val label = when(pos > neg, "Positive")
        .when(neg > pos, "Negative")
        .otherwise("Neutral")
      val s = round(
        (greatest(pos, neg).cast("double") + alpha) /
          ((pos + neg).cast("double") + 2.0 * alpha), 6)
      val ok = struct(label.as("label"), s.as("score"))
      if (failEvery <= 0) ok
      else {
        val failed = textHash % failEvery === failResidue
        when(failed, struct(lit("None").as("label"), lit(0.0).as("score")))
          .otherwise(ok)
      }
    }

    /** DuckDB mirror: SQL for (label, score) over text expr `t`.
      * Returns (labelSql, scoreSql) built over shared subexprs — callers
      * should alias `t`'s token list once via [[toksSql]].
      */
    def labelSql(pos: String, neg: String, fail: String): String = {
      val base = s"CASE WHEN $pos > $neg THEN 'Positive' WHEN $neg > $pos THEN 'Negative' ELSE 'Neutral' END"
      if (failEvery <= 0) base
      else s"CASE WHEN $fail THEN 'None' ELSE $base END"
    }

    def scoreSql(pos: String, neg: String, fail: String): String = {
      val a = VectorOps.dl(alpha)
      val base =
        s"round((CAST(greatest($pos, $neg) AS DOUBLE) + $a) / (CAST($pos + $neg AS DOUBLE) + 2.0 * $a), 6)"
      if (failEvery <= 0) base
      else s"CASE WHEN $fail THEN 0.0 ELSE $base END"
    }

    def failSql(textHash: String): String =
      if (failEvery <= 0) "false" else s"($textHash % $failEvery) = $failResidue"
  }

  /** The reference's 5 kept models (notebook cell 87): 2 BERT-like (never
    * fail) + 3 LLM-like (each with its own simulated failure residue). */
  val Models: Seq[LexiconScorer] = Seq(
    LexiconScorer("cryptobert", alpha = 0.5),
    LexiconScorer("finbert", alpha = 1.0),
    LexiconScorer("llama", alpha = 1.5, failEvery = 13, failResidue = 0),
    LexiconScorer("phi", alpha = 2.0, failEvery = 13, failResidue = 1),
    LexiconScorer("mistral", alpha = 2.5, failEvery = 13, failResidue = 2))

  /** SQL for pos/neg token counts over a token-list expr. */
  def posCountSql(toks: String): String =
    s"len(list_filter($toks, t -> list_contains($posList, t)))"
  def negCountSql(toks: String): String =
    s"len(list_filter($toks, t -> list_contains($negList, t)))"

  /** Fused per-field statistics: `graft_field_stats(text)` — ONE byte
    * pass producing struct(pos, neg, hash, th); see
    * [[graft.functions.FieldStats]] for the exact-parity contract with
    * the composed normalize→tokenize→count/hash pipeline it replaces
    * (VERDICT r6 next #1 — the q_e2 scoring fan-out outlier). */
  def fieldStats(text: Column): Column =
    call_function("graft_field_stats", text)

  /** Materialize the per-field scoring statistics once: given a text
    * column, adds `<p>_pos`, `<p>_neg` (lexicon counts) and `<p>_hash`
    * (polyHash of the normalized text); with `keepTh` also `<p>_th`
    * (per-token hashes — the M2 embedding input). All models then score
    * from these cheap columns. Backed by the single-pass
    * [[graft.functions.FieldStats]] expression: the struct is computed
    * once per row (CollapseProject never clones a non-cheap expression
    * used by several consumers), so the WHOLE fan-out costs one text
    * traversal per field, with no regex anywhere.
    */
  def withFieldStats(df: org.apache.spark.sql.DataFrame, p: String,
      text: Column, keepTh: Boolean = false): org.apache.spark.sql.DataFrame = {
    val fs = s"${p}_fs"
    val base = df.withColumn(fs, fieldStats(text))
      .withColumn(s"${p}_pos", col(s"$fs.pos"))
      .withColumn(s"${p}_neg", col(s"$fs.neg"))
      .withColumn(s"${p}_hash", col(s"$fs.hash"))
    (if (keepTh) base.withColumn(s"${p}_th", col(s"$fs.th")) else base)
      .drop(fs)
  }

  // ------------------------------------------------------------ M2

  /** Deterministic hash-projection embedding (CLS-vector stand-in,
    * cryptobert.py:26-44): component d = Σ_tokens proj(hash(tok), d),
    * then L2-normalized. proj maps a token hash to (-0.5, 0.5) via an
    * odd-multiplier remix mod P — exactly mirrorable in SQL.
    */
  def tokenHashes(text: Column): Column =
    call_function("graft_token_hashes", tokens(normalizeText(text)))

  /** Un-normalized embedding from a token-hash array: the codegen'd
    * [[graft.functions.HashEmbed]] expression (one fused tokens × dims
    * loop). The declarative per-dimension HOF folds it replaces are kept
    * as [[rawEmbeddingHof]] for cross-checking. */
  def rawEmbeddingFromHashes(th: Column, dim: Int): Column =
    call_function("graft_hash_embed", th, lit(dim))

  /** Reference HOF implementation of [[rawEmbeddingFromHashes]] (slow:
    * interpreted lambda per element per dimension; tests only). The
    * parens around the per-token term matter: `acc + (term)` is the fold
    * order of both the codegen'd expression and the oracle's
    * list_transform-then-reduce; `acc + div - 0.5` would instead group as
    * `(acc + div) - 0.5` and drift by float non-associativity. */
  def rawEmbeddingHof(th: Column, dim: Int): Column =
    array((0 until dim).map { d =>
      aggregate(th, lit(0.0),
        (acc, h) => acc + (((h * (2 * d + 3)) % HashP).cast("double") / HashP - 0.5))
    }: _*)

  /** L2 norm of a double-array column (same left fold as the oracle). */
  def l2Norm(arr: Column): Column =
    sqrt(aggregate(arr, lit(0.0), (acc, v) => acc + v * v))

  /** Normalize by a pre-materialized norm column. */
  def normalized(arr: Column, n: Column): Column =
    transform(arr, v => when(n > 0.0, v / n).otherwise(v))

  /** DuckDB mirror of [[hashEmbedding]] as (rawSql, normSql) pieces:
    * callers select `raw` once, then normalize. `th` must be a token-hash
    * list expr.
    */
  def hashEmbeddingRawSql(th: String, dim: Int): String =
    // list_reduce over a 0.0-prepended list = Spark aggregate's exact
    // left-fold order (list_sum's summation order is unspecified).
    (0 until dim).map { d =>
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |  list_transform($th, h -> CAST((h * ${2 * d + 3}) % $HashP AS DOUBLE) / $HashP - 0.5)),
         |  (x, y) -> x + y)""".stripMargin
    }.mkString("[", ", ", "]")

  def tokenHashesSql(text: String): String =
    s"list_transform(${tokensSql(normalizeTextSql(text))}, t -> ${polyHashSql("t")})"
}
