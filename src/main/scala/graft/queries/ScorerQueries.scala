package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Scorers
import graft.operators.Scorers._
import graft.operators.TextOps._
import graft.sources.Tables

/** The model-scoring pipeline (SURVEY.md §2.6 M1–M4, §3 E2) with the
  * deterministic stand-in scorers of [[graft.operators.Scorers]].
  *
  * The reference scores one article at a time over HTTP
  * (news_etl_dag.py:100, make_analysis.py:12-98); here the whole fan-out
  * — 5 models × 2 text fields + an embedding — is a map-only pipeline
  * over the corpus scan: no shuffle, the same plan at sf0.01 and 100 TB.
  * Expensive text expressions (tokenize, hash) are materialized once per
  * field; each model reads three cheap int columns — both engines share
  * this staging (Spark withColumn chain ≙ SQL CTE chain).
  */
object ScorerQueries extends QueryPack {

  private val contentSql = "text"
  private val titleSql = "substring(text, 1, 80)"

  /** Stage the per-field stats for content + title-stand-in fields
    * (reference's content / title_and_description, news_etl_dag.py:78-83).
    */
  private def staged(df: DataFrame): DataFrame = {
    val withC = Scorers.withFieldStats(df, "c", col("text"))
    Scorers.withFieldStats(withC, "t", substring(col("text"), 1, 80))
  }

  /** Flattened (label, score) columns for one model over staged stats.
    * Shared with the E2 composed pipeline (PipelineQueries.q_e2). */
  private[queries] def modelCols(m: LexiconScorer, p: String, prefix: String): Seq[Column] = {
    val s = m.scoreFromCounts(col(s"${p}_pos"), col(s"${p}_neg"), col(s"${p}_hash"))
    Seq(s.getField("label").as(s"${prefix}_label"),
      s.getField("score").as(s"${prefix}_score"))
  }

  /** SQL CTE computing per-field token lists + counts + hash once. */
  private val countsCte =
    s"""counts AS (
       |  SELECT doc_id, source,
       |         ${posCountSql("toks_c")} AS pc, ${negCountSql("toks_c")} AS nc,
       |         ${posCountSql("toks_t")} AS pt, ${negCountSql("toks_t")} AS nt,
       |         hc, ht
       |  FROM (SELECT doc_id, source,
       |               ${tokensSql(normalizeTextSql(contentSql))} AS toks_c,
       |               ${tokensSql(normalizeTextSql(titleSql))} AS toks_t,
       |               ${polyHashSql(normalizeTextSql(contentSql))} AS hc,
       |               ${polyHashSql(normalizeTextSql(titleSql))} AS ht
       |        FROM documents) t)""".stripMargin

  /** SQL label+score select-exprs for one model over (pos,neg,hash).
    * Shared with the E2 composed pipeline (PipelineQueries.q_e2). */
  private[queries] def modelSql(m: LexiconScorer, pos: String, neg: String,
      hash: String, prefix: String): Seq[String] = {
    val fail = m.failSql(hash)
    Seq(s"${m.labelSql(pos, neg, fail)} AS ${prefix}_label",
      s"${m.scoreSql(pos, neg, fail)} AS ${prefix}_score")
  }

  override def queries: Seq[QueryDef] = Seq(

    // M1 — BERT-like scoring: 2 models × 2 fields, (label, score) each
    // (cryptobert.py:6-23, finbert.py:5-17, make_analysis.py:15-27).
    QueryDef(
      "q_m1_bert_score",
      (s, dir) => {
        val berts = Models.take(2)
        staged(Tables.documents(s, dir))
          .select(
            col("doc_id") +:
            berts.flatMap(m =>
              modelCols(m, "c", s"${m.name}_content") ++
              modelCols(m, "t", s"${m.name}_title")): _*)
          .orderBy("doc_id")
      },
      Some({
        val sel = Models.take(2).flatMap(m =>
          modelSql(m, "pc", "nc", "hc", s"${m.name}_content") ++
          modelSql(m, "pt", "nt", "ht", s"${m.name}_title"))
        s"""WITH $countsCte
           |SELECT ${("doc_id" +: sel).mkString(",\n       ")}
           |FROM counts ORDER BY doc_id""".stripMargin
      })),

    // M2 — deterministic hash-projection embedding (CLS stand-in,
    // cryptobert.py:26-44): L2-normalized dim-16 vector; the output
    // checks norm and four components. Stages: token hashes → raw →
    // norm → normalized, one materialized column each.
    QueryDef(
      "q_m2_embedding",
      (s, dir) => Tables.documents(s, dir)
        .withColumn("th", tokenHashes(col("text")))
        .withColumn("raw", rawEmbeddingFromHashes(col("th"), 16))
        .withColumn("n", l2Norm(col("raw")))
        .withColumn("e", normalized(col("raw"), col("n")))
        .select(
          col("doc_id"),
          round(l2Norm(col("e")), 6).as("l2"),
          round(element_at(col("e"), 1), 6).as("e0"),
          round(element_at(col("e"), 6), 6).as("e5"),
          round(element_at(col("e"), 11), 6).as("e10"),
          round(element_at(col("e"), 16), 6).as("e15"))
        .orderBy("doc_id"),
      Some({
        val raw = hashEmbeddingRawSql("th", 16)
        s"""WITH th_t AS (
           |  SELECT doc_id, ${tokenHashesSql(contentSql)} AS th FROM documents
           |), raw_t AS (
           |  SELECT doc_id, $raw AS raw FROM th_t
           |), norm_t AS (
           |  SELECT doc_id, raw,
           |         sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |           list_transform(raw, v -> v * v)), (x, y) -> x + y)) AS n
           |  FROM raw_t
           |), e_t AS (
           |  SELECT doc_id,
           |         list_transform(raw, v -> CASE WHEN n > 0.0 THEN v / n ELSE v END) AS e
           |  FROM norm_t
           |)
           |SELECT doc_id,
           |       round(sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |         list_transform(e, v -> v * v)), (x, y) -> x + y)), 6) AS l2,
           |       round(e[1], 6) AS e0,
           |       round(e[6], 6) AS e5,
           |       round(e[11], 6) AS e10,
           |       round(e[16], 6) AS e15
           |FROM e_t ORDER BY doc_id""".stripMargin
      })),

    // M3 — LLM-like scoring with the per-row failure channel: rows on the
    // model's hash residue emit the fallback ('None', 0.0)
    // (llm.py:73-76,100-106; X6 failure isolation as column logic).
    QueryDef(
      "q_m3_llm_fallback",
      (s, dir) => {
        val llama = Models(2)
        staged(Tables.documents(s, dir))
          .withColumn("sc",
            llama.scoreFromCounts(col("c_pos"), col("c_neg"), col("c_hash")))
          .select(
            col("doc_id"),
            col("sc.label").as("label"),
            col("sc.score").as("score"),
            (col("c_hash") % llama.failEvery === llama.failResidue).as("fell_back"))
          .orderBy("doc_id")
      },
      Some({
        val llama = Models(2)
        val fail = llama.failSql("hc")
        s"""WITH $countsCte
           |SELECT doc_id,
           |       ${llama.labelSql("pc", "nc", fail)} AS label,
           |       ${llama.scoreSql("pc", "nc", fail)} AS score,
           |       $fail AS fell_back
           |FROM counts ORDER BY doc_id""".stripMargin
      })),

    // M4 / E2 — the full news-scoring pipeline: HTML strip (T1) → field
    // assembly (T2) → 5 models × 2 fields fan-out + embedding head →
    // fixed 24-column response row (make_analysis.py:12-98,
    // make_analysis_response.py:4-30). Map-only; no shuffle.
    QueryDef(
      "q_m4_full_pipeline",
      (s, dir) => {
        val stripped = trim(regexp_replace(regexp_replace(
          concat(lit("<article>"), col("text"), lit("</article>")),
          "<[^>]+>", " "), "\\s+", " "))
        val base = Tables.documents(s, dir)
          .withColumn("content", stripped)
          .withColumn("title", substring(col("content"), 1, 80))
        val withC = Scorers.withFieldStats(base, "c", col("content"), keepTh = true)
        val withT = Scorers.withFieldStats(withC, "t", col("title"))
        withT
          .withColumn("th", col("c_th"))
          .withColumn("raw", rawEmbeddingFromHashes(col("th"), 16))
          .withColumn("n", l2Norm(col("raw")))
          .select(
            Seq(col("doc_id"), col("source")) ++
            Models.flatMap(m =>
              modelCols(m, "c", s"${m.name}_content") ++
              modelCols(m, "t", s"${m.name}_title")) ++
            Seq(
              round(when(col("n") > 0.0, element_at(col("raw"), 1) / col("n"))
                .otherwise(element_at(col("raw"), 1)), 6).as("emb_head"),
              lit(16).as("emb_dim")): _*)
          .orderBy("doc_id")
      },
      Some({
        val strippedSql =
          s"""trim(regexp_replace(regexp_replace(
             |  '<article>' || text || '</article>', '<[^>]+>', ' ', 'g'),
             |  '\\s+', ' ', 'g'))""".stripMargin
        val sel = Models.flatMap(m =>
          modelSql(m, "pc", "nc", "hc", s"${m.name}_content") ++
          modelSql(m, "pt", "nt", "ht", s"${m.name}_title"))
        s"""WITH fields AS (
           |  SELECT doc_id, source, $strippedSql AS content,
           |         substring($strippedSql, 1, 80) AS title
           |  FROM documents
           |), counts AS (
           |  SELECT doc_id, source,
           |         ${posCountSql("toks_c")} AS pc, ${negCountSql("toks_c")} AS nc,
           |         ${posCountSql("toks_t")} AS pt, ${negCountSql("toks_t")} AS nt,
           |         hc, ht, th
           |  FROM (SELECT doc_id, source,
           |               ${tokensSql(normalizeTextSql("content"))} AS toks_c,
           |               ${tokensSql(normalizeTextSql("title"))} AS toks_t,
           |               ${polyHashSql(normalizeTextSql("content"))} AS hc,
           |               ${polyHashSql(normalizeTextSql("title"))} AS ht,
           |               ${tokenHashesSql("content")} AS th
           |        FROM fields) t
           |), embs AS (
           |  SELECT doc_id, raw,
           |         sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |           list_transform(raw, v -> v * v)), (x, y) -> x + y)) AS n
           |  FROM (SELECT doc_id, ${hashEmbeddingRawSql("th", 16)} AS raw FROM counts) r
           |)
           |SELECT ${("counts.doc_id" +: "source" +: sel).mkString(",\n       ")},
           |       round(CASE WHEN embs.n > 0.0 THEN raw[1] / embs.n ELSE raw[1] END, 6) AS emb_head,
           |       16 AS emb_dim
           |FROM counts JOIN embs ON counts.doc_id = embs.doc_id
           |ORDER BY counts.doc_id""".stripMargin
      }),
      bench = true)
  )
}
