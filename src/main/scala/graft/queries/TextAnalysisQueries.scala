package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.TextOps._
import graft.sources.Tables

/** Text-analysis operators for a large-scale training-data pipeline
  * (builder brief: language-ID, quality scoring, token counting, document
  * fingerprinting), over the `documents` table.
  *
  * All per-row, no shuffle except the final presentation ORDER BY (which a
  * real pipeline wouldn't have) — at 100 TB these run as a single map
  * stage over the corpus scan with columns pruned to (doc_id, text, …).
  */
object TextAnalysisQueries extends QueryPack {

  /** BPE-ish token pattern: letter runs, digit runs, single punctuation. */
  private val bpePat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  private val bpePatSql = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  override def queries: Seq[QueryDef] = Seq(

    // N1 — language identification via stopword-hit ratio (n-gram/lexicon
    // heuristic): fraction of whitespace tokens that are common-English
    // stopwords; >= 0.08 → 'en'. The lexicon test is an array membership
    // over a broadcast literal — the operator shape for any lexicon-based
    // classifier at scale.
    QueryDef(
      "q_n1_lang_id",
      (s, dir) => {
        val toks = tokens(col("text"))
        val hits = size(filter(toks, t => array_contains(typedLit(Stopwords), t)))
        Tables.documents(s, dir)
          .withColumn("n_tokens", size(toks))
          .withColumn("stop_ratio",
            round(hits.cast("double") / greatest(col("n_tokens"), lit(1)).cast("double"), 6))
          .select(
            col("doc_id"),
            col("n_tokens"),
            col("stop_ratio"),
            when(col("stop_ratio") >= 0.08, "en").otherwise("und").as("lang_pred"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, n_tokens, stop_ratio,
              |       CASE WHEN stop_ratio >= 0.08 THEN 'en' ELSE 'und' END AS lang_pred
              |FROM (SELECT doc_id,
              |             len(toks) AS n_tokens,
              |             round(CAST(len(list_filter(toks, t -> list_contains(${stopwordsSqlList}, t))) AS DOUBLE)
              |                   / CAST(greatest(len(toks), 1) AS DOUBLE), 6) AS stop_ratio
              |      FROM (SELECT doc_id, ${tokensSql("text")} AS toks FROM documents) t0) t
              |ORDER BY doc_id""".stripMargin)),

    // N1b — language ID via character-trigram profiles (the classic
    // n-gram heuristic): score = fraction of the text head's trigrams
    // found in each language's profile set; argmax wins with a fixed
    // preference order on ties. Profiles are small fixed literals (the
    // operator shape — broadcast profile membership over a trigram
    // stream — is what matters; real profiles would be learned).
    QueryDef(
      "q_n1b_lang_id_ngram",
      (s, dir) => {
        val profiles: Seq[(String, Seq[String])] = Seq(
          "en" -> Seq("the", "and", "ing", "ion", "ent", "er ", " th", "he ", "es ", "ta "),
          "es" -> Seq("que", " de", "de ", "la ", "os ", "ent", "aci", " la", "ar ", "cio"),
          "de" -> Seq("der", "ein", "sch", "ich", "nde", "die", "und", "ung", "en ", " ge"),
          "fr" -> Seq("les", " de", "de ", "ent", "ion", "que", " le", "la ", "des", "eur"))
        // head is MATERIALIZED before the trigram lambda: capturing the
        // normalize expression inside it would re-run the regexes per
        // trigram (the HOF-capture trap, see Scorers scaladoc)
        val nTris = greatest(size(col("tris")), lit(1)).cast("double")
        val scored = Tables.documents(s, dir)
          .withColumn("head", substring(normalizeText(col("text")), 1, 240))
          .withColumn("tris",
            when(length(col("head")) >= 3,
              transform(sequence(lit(1), length(col("head")) - 2),
                i => col("head").substr(i, lit(3))))
            .otherwise(array().cast("array<string>")))
          .select(
            Seq(col("doc_id"), col("lang")) ++
            profiles.map { case (lg, prof) =>
              round(size(filter(col("tris"),
                t => array_contains(typedLit(prof), t))).cast("double") / nTris, 6)
                .as(s"score_$lg")
            }: _*)
        val best = profiles.map(p => col(s"score_${p._1}")).reduce((a, b) => greatest(a, b))
        scored
          .withColumn("lang_pred",
            profiles.foldLeft(Option.empty[org.apache.spark.sql.Column]) {
              case (acc, (lg, _)) =>
                val cond = col(s"score_$lg") === best
                Some(acc.map(_.when(cond, lg)).getOrElse(when(cond, lg)))
            }.get.otherwise("und"))
          .orderBy("doc_id")
      },
      Some {
        val profiles: Seq[(String, Seq[String])] = Seq(
          "en" -> Seq("the", "and", "ing", "ion", "ent", "er ", " th", "he ", "es ", "ta "),
          "es" -> Seq("que", " de", "de ", "la ", "os ", "ent", "aci", " la", "ar ", "cio"),
          "de" -> Seq("der", "ein", "sch", "ich", "nde", "die", "und", "ung", "en ", " ge"),
          "fr" -> Seq("les", " de", "de ", "ent", "ion", "que", " le", "la ", "des", "eur"))
        def lst(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")
        val scoreSel = profiles.map { case (lg, prof) =>
          s"""round(CAST(len(list_filter(tris, t -> list_contains(${lst(prof)}, t))) AS DOUBLE)
             |  / CAST(greatest(len(tris), 1) AS DOUBLE), 6) AS score_$lg""".stripMargin
        }.mkString(",\n       ")
        val bestExpr = profiles.map(p => s"score_${p._1}").reduce((a, b) => s"greatest($a, $b)")
        val caseExpr = profiles.map { case (lg, _) =>
          s"WHEN score_$lg = $bestExpr THEN '$lg'"
        }.mkString(" ")
        s"""SELECT doc_id, lang, score_en, score_es, score_de, score_fr,
           |       CASE $caseExpr ELSE 'und' END AS lang_pred
           |FROM (
           |  SELECT doc_id, lang, $scoreSel
           |  FROM (SELECT doc_id, lang,
           |               list_transform(
           |                 range(1, greatest(length(head) - 2, 0) + 1),
           |                 i -> substring(head, CAST(i AS INT), 3)) AS tris
           |        FROM (SELECT doc_id, lang,
           |                     substring(${normalizeTextSql("text")}, 1, 240) AS head
           |              FROM documents) h) t
           |) s ORDER BY doc_id""".stripMargin
      }),

    // N2 — quality scoring: length, mean token length, punctuation ratio,
    // uppercase ratio, stopword ratio, folded into one bounded score.
    QueryDef(
      "q_n2_quality_score",
      (s, dir) => {
        val toks = tokens(col("text"))
        val nTok = size(toks).cast("double")
        val nChars = length(col("text")).cast("double")
        val punct = (nChars - length(regexp_replace(col("text"), "[^A-Za-z0-9\\s]", "")))
          .cast("double") / greatest(nChars, lit(1.0))
        val upper = (nChars - length(regexp_replace(col("text"), "[A-Z]", "")))
          .cast("double") / greatest(nChars, lit(1.0))
        val stop = size(filter(toks, t => array_contains(typedLit(Stopwords), t)))
          .cast("double") / greatest(nTok, lit(1.0))
        val meanTokLen = (nChars - (nTok - 1.0)) / greatest(nTok, lit(1.0))
        val quality =
          least(nTok / 100.0, lit(1.0)) * 0.4 +
          least(stop * 5.0, lit(1.0)) * 0.3 +
          (lit(1.0) - least(punct * 10.0, lit(1.0))) * 0.2 +
          (lit(1.0) - least(upper * 10.0, lit(1.0))) * 0.1
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            round(meanTokLen, 6).as("mean_tok_len"),
            round(punct, 6).as("punct_ratio"),
            round(stop, 6).as("stop_ratio"),
            round(quality, 6).as("quality"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
              |       round((n_chars2 - (n_tok - 1.0)) / greatest(n_tok, 1.0), 6) AS mean_tok_len,
              |       round(punct, 6) AS punct_ratio,
              |       round(stop, 6) AS stop_ratio,
              |       round(least(n_tok / 100.0, 1.0) * 0.4
              |             + least(stop * 5.0, 1.0) * 0.3
              |             + (1.0 - least(punct * 10.0, 1.0)) * 0.2
              |             + (1.0 - least(upper_r * 10.0, 1.0)) * 0.1, 6) AS quality
              |FROM (SELECT doc_id,
              |             CAST(length(text) AS DOUBLE) AS n_chars2,
              |             CAST(len(${tokensSql("text")}) AS DOUBLE) AS n_tok,
              |             CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
              |               / greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct,
              |             CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE)
              |               / greatest(CAST(length(text) AS DOUBLE), 1.0) AS upper_r,
              |             CAST(len(list_filter(${tokensSql("text")},
              |                    t -> list_contains(${stopwordsSqlList}, t))) AS DOUBLE)
              |               / greatest(CAST(len(${tokensSql("text")}) AS DOUBLE), 1.0) AS stop
              |      FROM documents) t
              |ORDER BY doc_id""".stripMargin)),

    // N3 — token counting: whitespace tokens, BPE-ish regex tokens, and
    // the chars/4 heuristic estimate.
    QueryDef(
      "q_n3_token_count",
      (s, dir) => Tables.documents(s, dir)
        .select(
          col("doc_id"),
          size(tokens(col("text"))).as("ws_tokens"),
          size(regexp_extract_all(col("text"), lit(bpePat), lit(0))).as("bpe_tokens"),
          ceil(length(col("text")).cast("double") / 4.0).cast("long").as("est_tokens"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |       len(${tokensSql("text")}) AS ws_tokens,
              |       len(regexp_extract_all(text, '$bpePatSql')) AS bpe_tokens,
              |       CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS est_tokens
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // N4 — document fingerprinting: canonical normalization then (a) the
    // shared polynomial rolling hash and (b) md5 hex — the exact-dedup /
    // shard-assignment keys for a 100 TB corpus.
    QueryDef(
      "q_n4_fingerprint",
      (s, dir) => Tables.documents(s, dir)
        .withColumn("norm", normalizeText(col("text")))
        .select(
          col("doc_id"),
          polyHash(col("norm")).as("fp_poly"),
          md5(col("norm").cast("binary")).as("fp_md5"),
          (polyHash(col("norm")) % 64).as("shard"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |       ${polyHashSql("norm")} AS fp_poly,
              |       md5(norm) AS fp_md5,
              |       ${polyHashSql("norm")} % 64 AS shard
              |FROM (SELECT doc_id, ${normalizeTextSql("text")} AS norm FROM documents) t
              |ORDER BY doc_id""".stripMargin)),

    // N5 — deterministic train/val/test split: content-hash bucket mod
    // 100 → 80/10/10. Hash-based (not random) so the split is stable
    // across reruns, engines, and partitionings — the reproducibility
    // contract a training pipeline needs; narrow per-row at any scale.
    QueryDef(
      "q_n5_split",
      (s, dir) => Tables.documents(s, dir)
        .withColumn("bucket", pmod(polyHash(normalizeText(col("text"))), lit(100L)))
        .select(
          col("doc_id"), col("bucket"),
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test").as("split"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, bucket,
              |       CASE WHEN bucket < 80 THEN 'train'
              |            WHEN bucket < 90 THEN 'val'
              |            ELSE 'test' END AS split
              |FROM (SELECT doc_id,
              |             ((${polyHashSql(normalizeTextSql("text"))} % 100) + 100) % 100
              |               AS bucket
              |      FROM documents) t
              |ORDER BY doc_id""".stripMargin)),

    // N7 — weighted mixture sampling: per-source inclusion weights
    // (0.25/0.5/0.75/1.0 by source index mod 4) applied via a
    // DETERMINISTIC content-hash threshold — reproducible across reruns,
    // engines, and partitionings (rand() is none of those). Integer
    // thresholds (weight*1000) keep the cut exact in both engines.
    // Narrow per-row + one small aggregate at any scale.
    QueryDef(
      "q_n7_weighted_sample",
      (s, dir) => {
        val idx = regexp_extract(col("source"), "([0-9]+)$", 1).cast("int")
        val hmod = pmod(polyHash(normalizeText(col("text"))), lit(1000L))
        Tables.documents(s, dir)
          .withColumn("thr", ((pmod(idx, lit(4)) + lit(1)) * lit(250)).cast("long"))
          .withColumn("keep", hmod < col("thr"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_total"),
            sum(col("keep").cast("long")).as("n_kept"),
            max(col("thr")).as("thr"))
          .orderBy("source")
      },
      Some(s"""SELECT source, count(*) AS n_total,
              |       CAST(sum(CASE WHEN ((h % 1000) + 1000) % 1000 <
              |                (CAST(idx AS BIGINT) % 4 + 1) * 250
              |                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
              |       (CAST(idx AS BIGINT) % 4 + 1) * 250 AS thr
              |FROM (SELECT source,
              |             CAST(regexp_extract(source, '([0-9]+)$$', 1) AS INT) AS idx,
              |             ${polyHashSql(normalizeTextSql("text"))} AS h
              |      FROM documents) t
              |GROUP BY source, idx
              |ORDER BY source""".stripMargin)),

    // N8 — repetition signals (Gopher-style quality rules, Rae et al.
    // 2021 §A1.1): duplicate-line fraction and the frequency share of
    // the most common word 2-gram. Narrow per-row: the top-bigram count
    // runs as ONE O(n log n) pass per document — sort the bigram array,
    // then a single `aggregate` fold tracking the longest equal-neighbor
    // run (no nested HOF, which would re-expand the bigram array per
    // distinct element). At 100 TB this stays a map stage over the scan.
    QueryDef(
      "q_n8_repetition",
      (s, dir) => {
        val emptyArr = array().cast("array<string>")
        val base = Tables.documents(s, dir)
          .withColumn("lines", split(col("text"), "\n"))
          .withColumn("toks", tokens(col("text")))
          .withColumn("bg", when(size(col("toks")) >= 2,
            transform(sequence(lit(1), size(col("toks")) - 1),
              i => concat_ws(" ", element_at(col("toks"), i),
                element_at(col("toks"), i + 1))))
            .otherwise(emptyArr))
          .withColumn("sbg", array_sort(col("bg")))
        val topRun = aggregate(
          col("sbg"),
          struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
          (acc, x) => {
            val run = when(x === acc("prev"), acc("run") + 1L).otherwise(lit(1L))
            struct(x.as("prev"), run.as("run"),
              greatest(acc("best"), run).as("best"))
          },
          acc => acc("best"))
        base.withColumn("top_bigram_n", topRun)
          .select(
            col("doc_id"),
            size(col("lines")).as("n_lines"),
            round(lit(1.0) -
              size(array_distinct(col("lines"))).cast("double") /
              greatest(size(col("lines")), lit(1)).cast("double"), 6)
              .as("dup_line_frac"),
            col("top_bigram_n"),
            round(col("top_bigram_n").cast("double") /
              greatest(size(col("bg")), lit(1)).cast("double"), 6)
              .as("top_bigram_frac"))
          .orderBy("doc_id")
      },
      // oracle computes the same max bigram multiplicity relationally
      // (unnest + group) — same values, different engine-appropriate plan
      Some(s"""WITH base AS (
              |  SELECT doc_id,
              |         string_split(text, chr(10)) AS lines,
              |         ${tokensSql("text")} AS toks
              |  FROM documents
              |), bg AS (
              |  SELECT doc_id,
              |         CASE WHEN len(toks) >= 2 THEN
              |           list_transform(range(1, len(toks)),
              |             i -> toks[i] || ' ' || toks[i + 1])
              |         ELSE CAST([] AS VARCHAR[]) END AS bigrams
              |  FROM base
              |), counts AS (
              |  SELECT doc_id, max(cnt) AS top_n
              |  FROM (SELECT doc_id, g, count(*) AS cnt
              |        FROM (SELECT doc_id, unnest(bigrams) AS g FROM bg) x
              |        GROUP BY doc_id, g) c
              |  GROUP BY doc_id
              |)
              |SELECT base.doc_id,
              |       len(lines) AS n_lines,
              |       round(1.0 - CAST(len(list_distinct(lines)) AS DOUBLE)
              |             / CAST(greatest(len(lines), 1) AS DOUBLE), 6) AS dup_line_frac,
              |       CAST(coalesce(counts.top_n, 0) AS BIGINT) AS top_bigram_n,
              |       round(CAST(coalesce(counts.top_n, 0) AS DOUBLE)
              |             / CAST(greatest(len(bg.bigrams), 1) AS DOUBLE), 6) AS top_bigram_frac
              |FROM base
              |JOIN bg ON bg.doc_id = base.doc_id
              |LEFT JOIN counts ON counts.doc_id = base.doc_id
              |ORDER BY base.doc_id""".stripMargin)),

    // N9 — greedy sequence packing (GreedyPackKernel scaladoc): fill
    // documents into 2048-token packs in (shard, doc_id) order; shard =
    // content-hash mod 16, tokens = the q_n3 chars/4 estimate. One
    // shuffle on shard, O(1)-state fill per shard. Oracle: per-shard
    // recursive CTE advancing the same recurrence.
    QueryDef(
      "q_n9_seq_pack",
      (s, dir) => {
        val budget = 2048L
        val base = Tables.documents(s, dir)
          .withColumn("shard", pmod(polyHash(normalizeText(col("text"))), lit(16L)))
          .withColumn("tok",
            ceil(length(col("text")).cast("double") / 4.0).cast("double"))
          .select("doc_id", "shard", "tok")
        graft.operators.SeriesKernels.applyKernels(
          base, Seq("shard"), Seq("doc_id"),
          Seq(graft.operators.SeriesKernels.KernelSpec(
            Seq("tok"), Seq("pack_d", "cum_d"),
            () => new graft.operators.PackKernels.GreedyPackKernel(budget))))
          .select(
            col("doc_id"), col("shard"),
            col("tok").cast("long").as("tok"),
            col("pack_d").cast("long").as("pack_id"),
            col("cum_d").cast("long").as("cum_tok"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE d AS (
              |  SELECT doc_id, shard, tok,
              |         row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
              |  FROM (SELECT doc_id,
              |               ((${polyHashSql(normalizeTextSql("text"))} % 16) + 16) % 16 AS shard,
              |               CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS tok
              |        FROM documents) t
              |), rec AS (
              |  SELECT doc_id, shard, tok, rn,
              |         CAST(0 AS BIGINT) AS pack_id, tok AS cum_tok
              |  FROM d WHERE rn = 1
              |  UNION ALL
              |  SELECT d.doc_id, d.shard, d.tok, d.rn,
              |         CASE WHEN r.cum_tok > 0 AND r.cum_tok + d.tok > 2048
              |              THEN r.pack_id + 1 ELSE r.pack_id END,
              |         CASE WHEN r.cum_tok > 0 AND r.cum_tok + d.tok > 2048
              |              THEN d.tok ELSE r.cum_tok + d.tok END
              |  FROM rec r JOIN d ON d.shard = r.shard AND d.rn = r.rn + 1
              |)
              |SELECT doc_id, shard, tok, pack_id, cum_tok
              |FROM rec ORDER BY doc_id""".stripMargin),
      bench = true),

    // N12 — stratified per-source curation: keep the top-5 docs per
    // source by BPE-ish token count (tie → lower doc_id). Runs as the
    // graft_topk bounded-k-heap TypedImperativeAggregate — partial
    // aggregation ships at most k (score,id) pairs per map task per
    // source to the exchange, vs a window row_number plan that shuffles
    // EVERY scored row into per-source partitions. The oracle is that
    // window plan in DuckDB (VectorOpsSpec proves the equivalence
    // including tie order).
    QueryDef(
      "q_n12_stratified_topk",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          size(regexp_extract_all(col("text"), lit(bpePat), lit(0)))
            .cast("double").as("score"))
        .groupBy("source")
        .agg(call_function("graft_topk", col("score"), col("doc_id"), lit(5)).as("top"))
        .select(col("source"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(
          col("source"),
          col("t.vec_id").as("doc_id"),
          col("t.score").cast("long").as("bpe_tokens"),
          (col("pos") + 1).cast("int").as("rank"))
        .orderBy("source", "rank"),
      Some(s"""SELECT source, doc_id, bpe_tokens, CAST(rank AS INT) AS rank
              |FROM (SELECT source, doc_id, bpe_tokens,
              |             row_number() OVER (PARTITION BY source
              |               ORDER BY bpe_tokens DESC, doc_id ASC) AS rank
              |      FROM (SELECT source, doc_id,
              |                   len(regexp_extract_all(text, '$bpePatSql')) AS bpe_tokens
              |            FROM documents) t) r
              |WHERE rank <= 5
              |ORDER BY source, rank""".stripMargin)),

    // N10 — document chunking for context assembly (RAG / long-doc
    // training): fixed 256-char windows on a 224-char stride (32-char
    // overlap), one output row per chunk. The explode is NARROW — chunk
    // rows are generated inside the scan stage, no shuffle — so a 100 TB
    // corpus chunks as a pure map; only the presentation ORDER BY sorts.
    QueryDef(
      "q_n10_chunk",
      (s, dir) => {
        val win = 256
        val stride = 224
        val nChunks = greatest(
          ceil(length(col("text")).cast("double") / stride.toDouble).cast("int"),
          lit(1))
        Tables.documents(s, dir)
          .withColumn("chunk_idx",
            explode(sequence(lit(0), nChunks - 1)))
          .withColumn("chunk",
            col("text").substr(col("chunk_idx") * stride + 1, lit(win)))
          .select(
            col("doc_id"), col("chunk_idx"),
            length(col("chunk")).as("chunk_len"),
            md5(col("chunk").cast("binary")).as("chunk_fp"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some("""SELECT doc_id,
             |       CAST(i AS INT) AS chunk_idx,
             |       length(substring(text, CAST(i AS INT) * 224 + 1, 256)) AS chunk_len,
             |       md5(substring(text, CAST(i AS INT) * 224 + 1, 256)) AS chunk_fp
             |FROM (SELECT doc_id, text,
             |             unnest(range(0, greatest(CAST(ceil(CAST(length(text) AS DOUBLE) / 224.0) AS BIGINT), 1))) AS i
             |      FROM documents) t
             |ORDER BY doc_id, chunk_idx""".stripMargin)),

    // N11 — unigram-LM log-probability scoring (the perplexity-filter
    // shape, Wenzek et al. CCNet 2019, with a unigram stand-in for the
    // KenLM 5-gram): vocabulary = top-1000 corpus tokens by frequency
    // (count desc, token asc tie-break); per-doc score = mean over tokens
    // of ln((count(tok)+1)/(corpus_tokens+|V|)) with OOV smoothing.
    // Plan shape at 100 TB: ONE token-count aggregation (map-side
    // partial combine on token), top-1000 into a single map row that
    // broadcast-cross-joins back, then a narrow per-doc fold — the
    // corpus never shuffles for scoring.
    QueryDef(
      "q_n11_unigram_logprob",
      (s, dir) => {
        val vSize = 1000
        val base = Tables.documents(s, dir)
          .withColumn("toks", tokens(normalizeText(col("text"))))
        val vocab = base
          .select(explode(col("toks")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("cnt"))
        val totalToks = vocab.agg(sum(col("cnt")).as("total"))
        val topV = vocab.orderBy(desc("cnt"), asc("tok")).limit(vSize)
          .agg(map_from_arrays(collect_list(col("tok")), collect_list(col("cnt")))
            .as("vmap"))
        val scored = base
          .crossJoin(broadcast(topV))
          .crossJoin(broadcast(totalToks))
        val denom = (col("total") + lit(vSize)).cast("double")
        val sumLog = aggregate(
          col("toks"),
          lit(0.0),
          (acc, t) => acc +
            log((coalesce(element_at(col("vmap"), t), lit(0L)) + lit(1L))
              .cast("double") / denom))
        scored.select(
          col("doc_id"),
          size(col("toks")).as("n_tok"),
          round(sumLog / greatest(size(col("toks")), lit(1)).cast("double"), 6)
            .as("mean_logprob"))
          .orderBy("doc_id")
      },
      Some(s"""WITH base AS (
              |  SELECT doc_id, ${tokensSql(normalizeTextSql("text"))} AS toks FROM documents
              |), cnts AS (
              |  SELECT tok, count(*) AS cnt
              |  FROM (SELECT unnest(toks) AS tok FROM base) u GROUP BY tok
              |), tot AS (SELECT sum(cnt) AS total FROM cnts),
              |topv AS (
              |  SELECT map(list(tok ORDER BY cnt DESC, tok ASC),
              |             list(cnt ORDER BY cnt DESC, tok ASC)) AS vmap
              |  FROM (SELECT tok, cnt FROM cnts ORDER BY cnt DESC, tok ASC LIMIT 1000) v
              |)
              |SELECT doc_id,
              |       len(toks) AS n_tok,
              |       round(list_sum(list_transform(toks,
              |               t -> ln(CAST(coalesce(map_extract(vmap, t)[1], 0) + 1 AS DOUBLE)
              |                       / CAST(total + 1000 AS DOUBLE))))
              |             / CAST(greatest(len(toks), 1) AS DOUBLE), 6) AS mean_logprob
              |FROM base CROSS JOIN topv CROSS JOIN tot
              |ORDER BY doc_id""".stripMargin),
      bench = true),

    // N13 — URL extraction + per-domain corpus stats (the web-corpus
    // curation op: domain blocklists, per-site caps, dedup-by-URL all
    // start here). Documents carry no URLs, so deterministic synthetic
    // ones are injected per row (same construction both engines), then
    // extracted back with one RE2∩java.regex pattern, exploded, and
    // rolled up per domain. Extract+explode are narrow; the only
    // corpus-scale shuffle is the domain aggregation (map-side combined,
    // domain-cardinality keys).
    QueryDef(
      "q_n13_url_stats",
      (s, dir) => {
        val urlPat = "https?://[A-Za-z0-9.-]+[A-Za-z0-9./_-]*"
        val domPat = "^https?://([A-Za-z0-9.-]+)"
        Tables.documents(s, dir)
          .withColumn("aug",
            concat(col("text"), lit(" see https://site"),
              pmod(col("doc_id"), lit(7L)).cast("string"),
              lit(".example.com/p/"), col("doc_id").cast("string"),
              lit(" and http://ref"), pmod(col("doc_id"), lit(3L)).cast("string"),
              lit(".example.org")))
          .select(col("doc_id"),
            explode(regexp_extract_all(col("aug"), lit(urlPat), lit(0))).as("url"))
          .withColumn("domain", regexp_extract(col("url"), domPat, 1))
          .groupBy("domain")
          .agg(count(lit(1)).as("n_urls"),
            countDistinct(col("doc_id")).as("n_docs"))
          .orderBy("domain")
      },
      Some("""WITH aug AS (
             |  SELECT doc_id,
             |         concat(text, ' see https://site',
             |                CAST(doc_id % 7 AS VARCHAR), '.example.com/p/',
             |                CAST(doc_id AS VARCHAR), ' and http://ref',
             |                CAST(doc_id % 3 AS VARCHAR), '.example.org') AS aug
             |  FROM documents
             |), urls AS (
             |  SELECT doc_id,
             |         regexp_extract(u, '^https?://([A-Za-z0-9.-]+)', 1) AS domain
             |  FROM (SELECT doc_id,
             |               unnest(regexp_extract_all(aug,
             |                 'https?://[A-Za-z0-9.-]+[A-Za-z0-9./_-]*')) AS u
             |        FROM aug) x
             |)
             |SELECT domain, count(*) AS n_urls,
             |       count(DISTINCT doc_id) AS n_docs
             |FROM urls GROUP BY domain ORDER BY domain""".stripMargin)),

    // N9b — pack MATERIALIZATION (the step after q_n9's assignment): one
    // row per (shard, pack) with doc count, token total, id span, and a
    // fingerprint of the exact ordered member list — what a sequence-
    // builder would feed the tokenizer. One extra shuffle on (shard,
    // pack_id); member lists are bounded by the token budget, so
    // collect_list stays O(budget/min_doc_tokens) per group at any
    // corpus size.
    QueryDef(
      "q_n9b_pack_materialize",
      (s, dir) => {
        val budget = 2048L
        val base = Tables.documents(s, dir)
          .withColumn("shard", pmod(polyHash(normalizeText(col("text"))), lit(16L)))
          .withColumn("tok",
            ceil(length(col("text")).cast("double") / 4.0).cast("double"))
          .select("doc_id", "shard", "tok")
        graft.operators.SeriesKernels.applyKernels(
          base, Seq("shard"), Seq("doc_id"),
          Seq(graft.operators.SeriesKernels.KernelSpec(
            Seq("tok"), Seq("pack_d", "cum_d"),
            () => new graft.operators.PackKernels.GreedyPackKernel(budget))))
          .select(col("doc_id"), col("shard"),
            col("tok").cast("long").as("tok"),
            col("pack_d").cast("long").as("pack_id"))
          .groupBy("shard", "pack_id")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("tok")).as("pack_tok"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"),
            md5(array_join(transform(sort_array(collect_list(col("doc_id"))),
              x => x.cast("string")), ",").cast("binary")).as("ids_fp"))
          .orderBy("shard", "pack_id")
      },
      Some(s"""WITH RECURSIVE d AS (
              |  SELECT doc_id, shard, tok,
              |         row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
              |  FROM (SELECT doc_id,
              |               ((${polyHashSql(normalizeTextSql("text"))} % 16) + 16) % 16 AS shard,
              |               CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS tok
              |        FROM documents) t
              |), rec AS (
              |  SELECT doc_id, shard, tok, rn,
              |         CAST(0 AS BIGINT) AS pack_id, tok AS cum_tok
              |  FROM d WHERE rn = 1
              |  UNION ALL
              |  SELECT d.doc_id, d.shard, d.tok, d.rn,
              |         CASE WHEN r.cum_tok > 0 AND r.cum_tok + d.tok > 2048
              |              THEN r.pack_id + 1 ELSE r.pack_id END,
              |         CASE WHEN r.cum_tok > 0 AND r.cum_tok + d.tok > 2048
              |              THEN d.tok ELSE r.cum_tok + d.tok END
              |  FROM rec r JOIN d ON d.shard = r.shard AND d.rn = r.rn + 1
              |)
              |SELECT shard, pack_id, count(*) AS n_docs,
              |       CAST(sum(tok) AS BIGINT) AS pack_tok,
              |       min(doc_id) AS first_doc, max(doc_id) AS last_doc,
              |       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS ids_fp
              |FROM rec GROUP BY shard, pack_id
              |ORDER BY shard, pack_id""".stripMargin)),

    // N14 — per-source language-distribution entropy (corpus balance
    // diagnostics: a source whose languages collapsed to one value
    // signals a scraping/cleaning regression). Two map-side-combined
    // aggregations — (source, lang) counts, then the per-source
    // Shannon-entropy fold — both on low-cardinality keys; no
    // corpus-body shuffle. Term order fixed by lang ASC both engines so
    // the floating sum is bit-stable under round(6).
    QueryDef(
      "q_n14_source_entropy",
      (s, dir) => {
        val counts = Tables.documents(s, dir)
          .groupBy("source", "lang").agg(count(lit(1)).as("c"))
        val packed = counts.groupBy("source")
          .agg(sum(col("c")).as("n_docs"),
            count(lit(1)).as("n_langs"),
            array_sort(collect_list(struct(col("lang"), col("c")))).as("lc"))
        val p = (c: org.apache.spark.sql.Column) => c.cast("double") / col("n_docs").cast("double")
        packed.select(
          col("source"), col("n_docs"), col("n_langs"),
          round(-aggregate(col("lc"), lit(0.0),
            (acc, x) => acc + p(x.getField("c")) * log(p(x.getField("c")))), 6)
            .as("lang_entropy"))
          .orderBy("source")
      },
      Some("""WITH counts AS (
             |  SELECT source, lang, count(*) AS c
             |  FROM documents GROUP BY source, lang
             |), totals AS (
             |  SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
             |         count(*) AS n_langs,
             |         list(c ORDER BY lang ASC) AS cs
             |  FROM counts GROUP BY source
             |)
             |SELECT source, n_docs, n_langs,
             |       round(-list_sum(list_transform(cs,
             |               c -> (CAST(c AS DOUBLE) / CAST(n_docs AS DOUBLE))
             |                    * ln(CAST(c AS DOUBLE) / CAST(n_docs AS DOUBLE)))), 6)
             |         AS lang_entropy
             |FROM totals ORDER BY source""".stripMargin)),

    // N6 — BM25 relevance scoring against a fixed query-term set: df per
    // term and (N, avgdl) via ONE tiny global aggregate cross-joined
    // back (broadcast — scalars, not a shuffle of the corpus); per-doc
    // tf/dl are narrow HOF counts. The operator shape of any corpus-
    // statistics scorer at 100 TB: one pass for stats, one map for
    // scores.
    QueryDef(
      "q_n6_bm25",
      (s, dir) => {
        val terms = Seq("vector", "hash", "stream")
        val k1 = 1.2
        val b = 0.75
        val base = Tables.documents(s, dir)
          .withColumn("toks", tokens(normalizeText(col("text"))))
          .withColumn("dl", size(col("toks")).cast("double"))
        val aggCols =
          count(lit(1)).cast("double").as("n_docs") ::
          avg(col("dl")).as("avgdl") ::
          terms.zipWithIndex.map { case (t, i) =>
            sum(array_contains(col("toks"), t).cast("long")).cast("double").as(s"df_$i")
          }.toList
        val stats = base.agg(aggCols.head, aggCols.tail: _*)
        val scored = base.crossJoin(broadcast(stats))
        val score = terms.zipWithIndex.map { case (t, i) =>
          val tf = size(filter(col("toks"), x => x === t)).cast("double")
          val idf = log(lit(1.0) +
            (col("n_docs") - col(s"df_$i") + lit(0.5)) / (col(s"df_$i") + lit(0.5)))
          val norm = lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")
          idf * tf * lit(k1 + 1.0) / (tf + lit(k1) * norm)
        }.reduce(_ + _)
        scored.select(col("doc_id"), round(score, 6).as("bm25"))
          .orderBy("doc_id")
      },
      {
        val terms = Seq("vector", "hash", "stream")
        val tokensExpr = tokensSql(normalizeTextSql("text"))
        val dfCols = terms.zipWithIndex.map { case (t, i) =>
          s"CAST(sum(CAST(list_contains(toks, '$t') AS BIGINT)) AS DOUBLE) AS df_$i"
        }.mkString(", ")
        val scoreSql = terms.zipWithIndex.map { case (t, i) =>
          s"""(ln(1.0 + (n_docs - df_$i + 0.5) / (df_$i + 0.5))
             | * CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) * (1.2 + 1.0)
             | / (CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE)
             |    + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))""".stripMargin
        }.mkString("(", " + ", ")")
        Some(s"""WITH base AS (
                |  SELECT doc_id, toks, CAST(len(toks) AS DOUBLE) AS dl
                |  FROM (SELECT doc_id, $tokensExpr AS toks FROM documents) t
                |), stats AS (
                |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl,
                |         $dfCols
                |  FROM base
                |)
                |SELECT doc_id, round($scoreSql, 6) AS bm25
                |FROM base CROSS JOIN stats
                |ORDER BY doc_id""".stripMargin)
      })
  )
}
