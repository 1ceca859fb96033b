package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.TextOps._
import graft.sources.Tables

/** Text / scalar operators of the reference's news pipeline
  * (SURVEY.md §2.6 T1–T9): HTML strip, concat, nested-field extraction,
  * timestamp parse/format, regex extraction with fallback defaults, label
  * remap, label-domain validation, UUID generation, numeric casts.
  *
  * All are narrow per-row expressions — built-in codegen'd functions, no
  * UDFs — so they pipeline inside WholeStageCodegen over an arbitrarily
  * large scan (the 100 TB path is the same plan as sf0.01).
  *
  * Reference locations cited per query (files under /root/reference/).
  */
object TextQueries extends QueryPack {

  override def queries: Seq[QueryDef] = Seq(

    // T1 — HTML strip (news_etl_dag.py:65-67: BeautifulSoup get_text with
    // separator=' ', strip=True). Documents carry no markup, so wrap each
    // text in deterministic tags first; strip = drop tags, collapse
    // whitespace, trim.
    QueryDef(
      "q_t1_html_strip",
      (s, dir) => Tables.documents(s, dir)
        .withColumn("html",
          concat(lit("<p class=\"x\">"), col("text"), lit("</p> <br/>")))
        .withColumn("clean",
          trim(regexp_replace(regexp_replace(col("html"), "<[^>]+>", " "), "\\s+", " ")))
        .select(
          col("doc_id"),
          length(col("html")).as("n_html"),
          length(col("clean")).as("n_clean"),
          substring(col("clean"), 1, 60).as("head"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     length(html) AS n_html,
                     length(clean) AS n_clean,
                     substring(clean, 1, 60) AS head
              FROM (SELECT doc_id,
                           '<p class="x">' || text || '</p> <br/>' AS html,
                           trim(regexp_replace(regexp_replace(
                             '<p class="x">' || text || '</p> <br/>',
                             '<[^>]+>', ' ', 'g'), '\s+', ' ', 'g')) AS clean
                    FROM documents) t
              ORDER BY doc_id""")),

    // T1b — PARSER-EXACT HTML strip (graft_html_strip, the state-machine
    // codegen'd expression; VERDICT r4 missing #2): each doc is wrapped
    // in adversarial markup hitting every regex failure mode — an
    // attribute value containing '>', a <script> body full of tags and
    // comparison operators, an SGML comment containing '>', entities,
    // and a raw-text <style> block. The ground truth is analytically
    // derivable (the corpus has no markup characters — checked r5), so
    // DuckDB re-derives the expected clean text from `text` directly:
    // the oracle verifies the PARSER, not a shared approximation (the
    // shared-regex weakness q_t1 carries by design as the simple path).
    QueryDef(
      "q_t1b_html_parser_strip",
      (s, dir) => Tables.documents(s, dir)
        .withColumn("html", concat(
          lit("<!DOCTYPE html><div title=\"a>b\" data-x='1>2'>" +
              "<script type=\"text/javascript\">if (1 < 2 && x > 0) { emit(\"<p>not text</p>\"); }</script>" +
              "<style>.cls > div { color: red; }</style>" +
              "<!-- comment with > and <b>tags</b> --><P CLASS=\"body\">"),
          col("text"),
          lit(" &amp; <b>tail</b>&#33;</p></div>")))
        .withColumn("clean", call_function("graft_html_strip", col("html")))
        .select(
          col("doc_id"),
          length(col("clean")).as("n_clean"),
          substring(col("clean"), 1, 60).as("head"),
          expr("right(clean, 20)").as("tail"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |       length(clean) AS n_clean,
             |       substring(clean, 1, 60) AS head,
             |       right(clean, 20) AS tail
             |FROM (SELECT doc_id,
             |             trim(regexp_replace(text || ' & tail !', '\s+', ' ', 'g')) AS clean
             |      FROM documents) t
             |ORDER BY doc_id""".stripMargin)),

    // T2 — string concat: title + " " + description → title_and_description
    // (news_etl_dag.py:80). Stand-in fields: source + lang + text head.
    QueryDef(
      "q_t2_concat",
      (s, dir) => Tables.documents(s, dir)
        .select(
          col("doc_id"),
          concat_ws(" ", col("source"), col("lang"), substring(col("text"), 1, 30))
            .as("title_and_description"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     concat_ws(' ', source, lang, substring(text, 1, 30))
                       AS title_and_description
              FROM documents ORDER BY doc_id""")),

    // T3 — nested-field extraction (news_etl_dag.py:81:
    // article["source"]["name"]): build the nested struct, extract fields.
    QueryDef(
      "q_t3_nested_extract",
      (s, dir) => Tables.documents(s, dir)
        .withColumn("article",
          struct(
            struct(col("source").as("name"), col("lang").as("country")).as("src"),
            col("n_chars").as("chars")))
        .select(
          col("doc_id"),
          col("article.src.name").as("source_name"),
          col("article.src.country").as("source_country"),
          col("article.chars").as("chars"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     article.src.name AS source_name,
                     article.src.country AS source_country,
                     article.chars AS chars
              FROM (SELECT doc_id,
                           {'src': {'name': source, 'country': lang},
                            'chars': n_chars} AS article
                    FROM documents) t
              ORDER BY doc_id""")),

    // T4 — timestamp parse/format (btc_usdt_etl_dag.py:47 epoch-ms →
    // datetime; news_etl_dag.py:40-41 ISO strftime): epoch-ms round-trip
    // plus formatted parts.
    QueryDef(
      "q_t4_timestamp",
      (s, dir) => Tables.events(s, dir)
        .filter(col("event_id") % 97 === 0)
        .withColumn("epoch_ms", expr("(ts_ns - pmod(ts_ns, 1000000)) div 1000000"))
        .select(
          col("event_id"),
          col("epoch_ms"),
          date_format(timestamp_millis(col("epoch_ms")), "yyyy-MM-dd HH:mm:ss.SSS").as("iso"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          hour(col("ts")).as("hh"),
          minute(col("ts")).as("mm"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
                     epoch_ms(date_trunc('millisecond', ts)) AS epoch_ms,
                     strftime(date_trunc('millisecond', ts), '%Y-%m-%d %H:%M:%S.%g') AS iso,
                     strftime(ts, '%Y-%m-%d') AS day,
                     hour(ts) AS hh, minute(ts) AS mm
              FROM events WHERE event_id % 97 = 0 ORDER BY event_id""")),

    // T5 — regex extraction of LLM free-text output with fallback defaults
    // (llm.py:57-70: tonality + confidence patterns, float cast, null →
    // ('None', 0)). Blob is synthesized deterministically; non-en rows get
    // an unparseable blob to exercise the fallback path.
    QueryDef(
      "q_t5_regex_extract",
      (s, dir) => {
        val sentiment = when(col("n_chars") % 3 === 0, "Positive")
          .when(col("n_chars") % 3 === 1, "Negative").otherwise("Neutral")
        val blob = when(col("lang") === "en",
          concat(lit("**Sentiment**: /"), sentiment,
            lit(" and **Confidence**: 0."),
            lpad((col("n_chars") % 100).cast("string"), 2, "0")))
          .otherwise(lit("no markup here"))
        val label = regexp_extract(blob, "\\*\\*(Tonality|Sentiment)\\*\\*:\\s*/?([A-Za-z]+)", 2)
        val conf = regexp_extract(blob, "\\*\\*Confidence\\*\\*:\\s*([0-9.]+)", 1)
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            when(label === "", "None").otherwise(label).as("label"),
            // regexp_extract yields "" on no match; ANSI cast of "" throws,
            // so guard explicitly (same fallback as llm.py:100-106 null→0).
            coalesce(when(conf === "", lit(null)).otherwise(conf).cast("double"),
              lit(0.0)).as("confidence"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                     CASE WHEN label = '' THEN 'None' ELSE label END AS label,
                     coalesce(TRY_CAST(conf AS DOUBLE), 0.0) AS confidence
              FROM (SELECT doc_id,
                           regexp_extract(blob, '\*\*(Tonality|Sentiment)\*\*:\s*/?([A-Za-z]+)', 2) AS label,
                           regexp_extract(blob, '\*\*Confidence\*\*:\s*([0-9.]+)', 1) AS conf
                    FROM (SELECT doc_id,
                                 CASE WHEN lang = 'en' THEN
                                   '**Sentiment**: /' ||
                                   CASE WHEN n_chars % 3 = 0 THEN 'Positive'
                                        WHEN n_chars % 3 = 1 THEN 'Negative'
                                        ELSE 'Neutral' END ||
                                   ' and **Confidence**: 0.' ||
                                   lpad(CAST(n_chars % 100 AS VARCHAR), 2, '0')
                                 ELSE 'no markup here' END AS blob
                          FROM documents) b) t
              ORDER BY doc_id""")),

    // T6 — label remap (cryptobert.py:18-21: Bullish→Positive,
    // Bearish→Negative, pass-through otherwise).
    QueryDef(
      "q_t6_label_remap",
      (s, dir) => {
        val raw = when(col("n_chars") % 4 === 0, "Bullish")
          .when(col("n_chars") % 4 === 1, "Bearish")
          .when(col("n_chars") % 4 === 2, "Neutral").otherwise("Mixed")
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            raw.as("raw_label"),
            when(raw === "Bullish", "Positive")
              .when(raw === "Bearish", "Negative")
              .otherwise(raw).as("label"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, raw_label,
                     CASE raw_label WHEN 'Bullish' THEN 'Positive'
                                    WHEN 'Bearish' THEN 'Negative'
                                    ELSE raw_label END AS label
              FROM (SELECT doc_id,
                           CASE WHEN n_chars % 4 = 0 THEN 'Bullish'
                                WHEN n_chars % 4 = 1 THEN 'Bearish'
                                WHEN n_chars % 4 = 2 THEN 'Neutral'
                                ELSE 'Mixed' END AS raw_label
                    FROM documents) t
              ORDER BY doc_id""")),

    // T7 — label-domain validation (llm.py:100-106: result must be in
    // {Neutral,Positive,Negative} else ('None', 0); null score → 0).
    QueryDef(
      "q_t7_domain_validation",
      (s, dir) => {
        val raw = when(col("n_chars") % 4 === 0, "Positive")
          .when(col("n_chars") % 4 === 1, "Negative")
          .when(col("n_chars") % 4 === 2, "Neutral").otherwise("Sideways")
        val score = when(col("n_chars") % 5 === 0, lit(null).cast("double"))
          .otherwise(round(col("n_chars") % 100 / 100.0, 6))
        val valid = raw.isin("Neutral", "Positive", "Negative")
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            when(valid, raw).otherwise("None").as("label"),
            when(valid, coalesce(score, lit(0.0))).otherwise(0.0).as("score"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                     CASE WHEN raw IN ('Neutral','Positive','Negative')
                          THEN raw ELSE 'None' END AS label,
                     CASE WHEN raw IN ('Neutral','Positive','Negative')
                          THEN coalesce(score, 0.0) ELSE 0.0 END AS score
              FROM (SELECT doc_id,
                           CASE WHEN n_chars % 4 = 0 THEN 'Positive'
                                WHEN n_chars % 4 = 1 THEN 'Negative'
                                WHEN n_chars % 4 = 2 THEN 'Neutral'
                                ELSE 'Sideways' END AS raw,
                           CASE WHEN n_chars % 5 = 0 THEN CAST(NULL AS DOUBLE)
                                ELSE round(n_chars % 100 / 100.0, 6) END AS score
                    FROM documents) t
              ORDER BY doc_id""")),

    // T8 — UUID generation (news_etl_dag.py:147: uuid4 per point).
    // The ids themselves are non-deterministic, but the CONTRACT row is
    // not: v4 uuids are distinct (collision probability is ~0 at any
    // corpus size this engine will see) and well-formed by construction,
    // so all three aggregates deterministically equal the corpus row
    // count — which DuckDB states as ground truth. ORACLED since r11:
    // a malformed, non-v4, or colliding generator hash-mismatches.
    QueryDef(
      "q_t8_uuid",
      (s, dir) => Tables.documents(s, dir)
        .withColumn("id", expr("uuid()"))
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("id")).as("n_distinct"),
          sum(when(col("id").rlike(
            "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"), 1)
            .otherwise(0)).as("n_wellformed")),
      Some("""SELECT count(*) AS n_rows, count(*) AS n_distinct,
                     count(*) AS n_wellformed
              FROM documents""")),

    // T9 — numeric casts (news_etl_dag.py:153-175: float(score) on every
    // payload score; plus int/string round-trips).
    QueryDef(
      "q_t9_cast",
      (s, dir) => Tables.documents(s, dir)
        .select(
          col("doc_id"),
          col("n_chars").cast("double").as("chars_d"),
          (col("n_chars").cast("double") / 100.0).cast("int").as("chars_bucket"),
          col("n_chars").cast("string").as("chars_s"),
          concat(lit("0."), lpad((col("n_chars") % 100).cast("string"), 2, "0"))
            .cast("double").as("parsed_score"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     CAST(n_chars AS DOUBLE) AS chars_d,
                     CAST(trunc(CAST(n_chars AS DOUBLE) / 100.0) AS INT) AS chars_bucket,
                     CAST(n_chars AS VARCHAR) AS chars_s,
                     CAST('0.' || lpad(CAST(n_chars % 100 AS VARCHAR), 2, '0') AS DOUBLE)
                       AS parsed_score
              FROM documents ORDER BY doc_id""")),

    // T10 — PII redaction (training-data cleaning pass, builder brief):
    // mask emails and long digit runs before a corpus ships to training.
    // The oracle keeps the two-pass regex composition (RE2 ∩
    // java.util.regex common subset); the Spark side fuses all four
    // regex traversals into graft_pii_scan — ONE codegen'd expression,
    // two tight byte loops per row ([[graft.functions.PiiScan]], the
    // graft_field_stats precedent; VERDICT r13 next #3: java.util.regex
    // backtracking made q_t10 the one query > 2x DuckDB at both scaled
    // tiers). PiiScanSpec pins the expression to the regex composition
    // property-style. Documents carry no real PII, so deterministic
    // synthetic contacts are injected per row (same construction both
    // engines) and then must be fully masked.
    QueryDef(
      "q_t10_pii_redact",
      (s, dir) => {
        Tables.documents(s, dir)
          .withColumn("raw",
            concat(col("text"), lit(" contact: user"),
              col("doc_id").cast("string"), lit("@mail.example.org tel "),
              lpad((col("doc_id") * 37 % 1000000000L).cast("string"), 9, "8")))
          .withColumn("p", expr("graft_pii_scan(raw)"))
          .select(
            col("doc_id"),
            col("p.n_emails").as("n_emails"),
            col("p.n_longnums").as("n_longnums"),
            (length(col("raw")) - length(col("p.redacted"))).as("chars_removed"),
            col("p.redacted").substr(length(col("text")) + 1, lit(60)).as("tail"))
          .orderBy("doc_id")
      },
      Some("""WITH raw AS (
             |  SELECT doc_id, text,
             |         concat(text, ' contact: user', CAST(doc_id AS VARCHAR),
             |                '@mail.example.org tel ',
             |                lpad(CAST((doc_id * 37) % 1000000000 AS VARCHAR), 9, '8'))
             |           AS raw
             |  FROM documents)
             |SELECT doc_id,
             |       len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             |         AS n_emails,
             |       len(regexp_extract_all(raw, '[0-9]{9,}')) AS n_longnums,
             |       length(raw) - length(
             |         regexp_replace(regexp_replace(raw,
             |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |           '[0-9]{9,}', '<NUM>', 'g')) AS chars_removed,
             |       substring(regexp_replace(regexp_replace(raw,
             |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |           '[0-9]{9,}', '<NUM>', 'g'),
             |         length(text) + 1, 60) AS tail
             |FROM raw ORDER BY doc_id""".stripMargin))
  )
}
