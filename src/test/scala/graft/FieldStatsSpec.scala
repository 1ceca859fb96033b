package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Scorers, TextOps}
import graft.sources.Tables

/** The fused single-pass graft_field_stats expression must agree
  * BIT-FOR-BIT with the composed pipeline it replaces
  * (tokens/normalize/lexcount/polyhash/token_hashes — the values the
  * DuckDB oracles mirror), on real corpus text, generated ASCII, and
  * the degenerate shapes (empty, whitespace-only, punctuation-glued).
  */
class FieldStatsSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)

  /** The pre-r7 composed form over the REGEX normalize (the exact
    * oracle-mirrored reference semantics, no fused expressions). */
  private def composed(df: org.apache.spark.sql.DataFrame, text: org.apache.spark.sql.Column) = {
    import TextOps._
    df.withColumn("lc", call_function("graft_lexcount", tokens(normalizeTextRegex(text))))
      .withColumn("ref_pos", element_at(col("lc"), 1))
      .withColumn("ref_neg", element_at(col("lc"), 2))
      .withColumn("ref_hash", polyHash(normalizeTextRegex(text)))
      .withColumn("ref_th",
        call_function("graft_token_hashes", tokens(normalizeTextRegex(text))))
      .drop("lc")
  }

  private def assertNormParity(df: org.apache.spark.sql.DataFrame,
      text: org.apache.spark.sql.Column): Unit = {
    val both = df.withColumn("fast", TextOps.normalizeText(text))
      .withColumn("slow", TextOps.normalizeTextRegex(text))
    val bad = both.filter(col("fast") =!= col("slow"))
    assert(bad.isEmpty,
      s"normalize mismatch:\n${bad.limit(5).collect().mkString("\n")}")
  }

  private def assertParity(df: org.apache.spark.sql.DataFrame,
      text: org.apache.spark.sql.Column): Unit = {
    val both = composed(df, text).withColumn("fs", Scorers.fieldStats(text))
    val bad = both.filter(
      col("fs.pos") =!= col("ref_pos") or
      col("fs.neg") =!= col("ref_neg") or
      col("fs.hash") =!= col("ref_hash") or
      not(col("fs.th") === col("ref_th")))
    assert(bad.isEmpty, s"fused/composed mismatch:\n${bad.limit(5).collect().mkString("\n")}")
  }

  test("parity on the corpus (markup-wrapped like q_e2's strip output)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    assertParity(docs, col("text"))
    // the full e2 field shape: strip of adversarially-wrapped text
    assertParity(
      docs.withColumn("content", call_function("graft_html_strip",
        concat(lit("<article data-x=\"a>b\"><script>t(\"<p>x</p>\");</script>"),
          col("text"), lit("</article>")))),
      col("content"))
  }

  test("parity on generated ASCII including lexicon words and degenerate shapes") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val lex = Scorers.Positive ++ Scorers.Negative
    val chars = "abcXYZ012 .,!?-:;\t\n'\"()" // kept, cased, stripped, whitespace
    val gen = (1 to 400).map { _ =>
      val n = rnd.nextInt(60)
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        if (rnd.nextInt(8) == 0) sb.append(' ').append(lex(rnd.nextInt(lex.length))).append(' ')
        else sb.append(chars(rnd.nextInt(chars.length)))
      }
      sb.toString
    }
    val edge = Seq("", " ", "   ", ".", ". .", "a", "A", "a.b", "a .b", "a. b",
      "a . b", "  fast  ", "FAST slow", "fast.slow", "tab\there", "nl\nhere",
      "0123456789", "hash hash hash", "x" * 3000)
    assertParity((gen ++ edge).toDF("t"), col("t"))
    assertNormParity((gen ++ edge).toDF("t"), col("t"))
  }

  test("fused normalize equals the regex normalize on the corpus") {
    assertNormParity(Tables.documents(spark, "/root/testdata/sf0.001"), col("text"))
  }

  test("null in, null out; usable from spark.sql") {
    import spark.implicits._
    val r = Seq[Option[String]](None, Some("fast slow")).toDF("t")
      .withColumn("fs", Scorers.fieldStats(col("t")))
      .select("fs").collect()
    assert(r(0).isNullAt(0))
    assert(!r(1).isNullAt(0))
    val row = spark.sql("SELECT graft_field_stats('Big FAST, slow!') AS fs")
      .select("fs.pos", "fs.neg", "fs.hash", "fs.th").head
    assert(row.getInt(0) == 2 && row.getInt(1) == 1)
    assert(row.getSeq[Long](3).length == 3)
  }

  test("the scoring fan-out computes the struct once per field (no expression cloning)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val staged = Scorers.withFieldStats(docs, "c", col("text"), keepTh = true)
      .select(col("doc_id"), col("c_pos"), col("c_neg"), col("c_hash"), col("c_th"))
    val plan = staged.queryExecution.optimizedPlan.toString
    val n = "fieldstats\\(".r.findAllIn(plan).length
    assert(n == 1, s"expected 1 fieldstats(...) in the optimized plan, got $n:\n$plan")
  }
}
