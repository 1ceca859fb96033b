package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the text / dedup / analysis packs
  * (SURVEY.md §2.6 T-family + the training-data-pipeline extensions).
  *
  * Every primitive here is built from codegen'd Spark SQL functions (no
  * UDFs), and each has an exact DuckDB-SQL mirror used by the oracles: the
  * arithmetic is written so both engines evaluate the identical IEEE/int64
  * operation sequence.
  *
  * Scale: all ops are narrow per-row expressions — they pipeline inside
  * WholeStageCodegen with no shuffle, so they cost the same per-row on a
  * 1000-executor 100 TB scan as they do locally.
  */
object TextOps {

  /** Modulus for the shared polynomial string hash: 2^31 - 1 (prime).
    * acc fits in int64: acc < 2^31, acc*31 + 255 < 2^36. */
  val HashP = 2147483647L

  /** Seed for the polynomial hash fold (non-zero so "" hashes stably). */
  val HashSeed = 7L

  /** Deterministic polynomial string hash, identical in Spark and DuckDB:
    * fold over characters, acc = (acc*31 + ascii(c)) mod (2^31-1), seed 7.
    *
    * Used (instead of murmur3/xxhash) because the DuckDB oracle must
    * compute bit-identical values; both engines fold left over the same
    * char sequence. ASCII-safe (testdata text is ASCII).
    *
    * Backed by the codegen'd [[graft.functions.PolyHash]] expression
    * (registered by GraftSession); the declarative HOF fold
    * [[polyHashHof]] is semantically identical but ~4 orders of magnitude
    * slower per char and is kept only as a cross-check in tests.
    */
  def polyHash(s: Column): Column = call_function("graft_polyhash", s)

  /** Reference HOF implementation of [[polyHash]] (tests cross-check the
    * codegen'd expression against this). */
  def polyHashHof(s: Column): Column =
    aggregate(
      split(s, ""),
      lit(HashSeed),
      (acc, c) => (acc * 31L + ascii(c)) % HashP)

  /** DuckDB mirror of [[polyHash]]. */
  def polyHashSql(s: String): String =
    s"""list_reduce(
       |  list_prepend(CAST(${HashSeed} AS BIGINT),
       |    list_transform(string_split($s, ''), c -> CAST(ascii(c) AS BIGINT))),
       |  (a, b) -> (a * 31 + b) % ${HashP})""".stripMargin

  /** Lowercase, strip non-[a-z0-9 ], collapse runs of spaces, trim —
    * the canonical normalization before fingerprint/dedup. r7: backed by
    * the single-pass codegen'd [[graft.functions.Normalize]] (one byte
    * scan instead of two interpreted regex traversals — this sits under
    * every dedup fingerprint and q_e2's pre-window `fp`); byte-identical
    * to the regex form on ASCII, which the corpus and the oracles'
    * polyhash mirror already require (FieldStatsSpec asserts parity). */
  def normalizeText(c: Column): Column = call_function("graft_norm", c)

  /** The regex form of [[normalizeText]] (the oracle-SQL semantics
    * verbatim; parity cross-check in FieldStatsSpec). */
  def normalizeTextRegex(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  def normalizeTextSql(c: String): String =
    s"trim(regexp_replace(regexp_replace(lower($c), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"

  /** Whitespace tokenization (split on runs of whitespace). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokensSql(c: String): String = s"string_split_regex(trim($c), '\\s+')"

  /** Word n-shingles from a token array: element i joins tokens i..i+n-1
    * with single spaces. Empty when the doc has fewer than n tokens. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))
      .otherwise(array().cast("array<string>"))

  def shinglesSql(toks: String, n: Int): String = {
    val parts = (0 until n).map(k => s"$toks[i + $k]").mkString(" || ' ' || ")
    s"""CASE WHEN len($toks) >= $n THEN
       |  list_transform(generate_series(1, len($toks) - ${n - 1}), i -> $parts)
       |ELSE [] END""".stripMargin
  }

  /** Tiny English stopword list for the language-ID heuristic and quality
    * ratios. Deliberately small + fixed: the point is the *operator shape*
    * (broadcast lexicon membership test), not linguistic accuracy.
    */
  val Stopwords: Seq[String] = Seq(
    "a", "an", "the", "of", "to", "and", "in", "is", "on", "for", "it",
    "with", "as", "by", "at", "or", "be", "this", "that", "are")

  def stopwordsSqlList: String =
    Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
}
