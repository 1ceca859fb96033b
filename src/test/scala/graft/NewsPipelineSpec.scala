package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scorers
import graft.sources.{Sinks, Tables}

/** E2 end-to-end (SURVEY §3 E2, news_etl_dag.py:34-185): the composed
  * q_e2 plan's dedup semantics, and the WRITE path — the same
  * strip→score stages run under writeStream.foreachBatch with
  * [[Sinks.upsertByKey]] as the save_to_qdrant stage. The reference keys
  * its upsert by uuid4 (news_etl_dag.py:147), so its 24h+1h fetch window
  * re-inserts yesterday's articles forever (X3 duplicate accumulation);
  * keying by content fingerprint with newest-fetch-wins is the fix this
  * spec locks in: re-delivered batches update rows, never add copies.
  */
class NewsPipelineSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)
  private val sf = "/root/testdata/sf0.001"

  test("q_e2 composed plan: one row per article, newest fetch wins, dups counted") {
    val out = SparkEntry.queries("q_e2_news_pipeline")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.length == nDocs, "dedup must collapse the re-fetch overlap")
    val byId = out.map(r => r.getLong(r.fieldIndex("doc_id")) -> r).toMap
    byId.foreach { case (id, r) =>
      val overlapped = id % 3 == 0
      assert(r.getLong(r.fieldIndex("fetch_kept")) == (if (overlapped) 2L else 1L))
      assert(r.getLong(r.fieldIndex("n_dups")) == (if (overlapped) 2L else 1L))
    }
    // the scoring fan-out is live end-to-end: all three LLM-like models
    // exercise their fallback residue somewhere in the corpus
    val fallbacks = out.count(r => r.getString(r.fieldIndex("llama_content_label")) == "None")
    assert(fallbacks > 0, "the M3 fallback channel must fire in-composition")
  }

  test("strip-first narrow shape == wide and scalar-first shapes row-for-row") {
    // the r18 swap keeps the strip pre-window (the fingerprint needs
    // it) but drops text/title_desc from the dedup exchange and scores
    // the survivors; same rows, same expressions, same oracle — pinned
    // here against BOTH measured-and-kept alternatives
    val registered = SparkEntry.queries("q_e2_news_pipeline")(spark, sf)
    val alts = Seq(
      "wide" -> graft.queries.PipelineQueries.e2WideExchange(spark, sf),
      "scalarFirst" -> graft.queries.PipelineQueries.e2ScalarFirst(spark, sf))
    val cols = registered.columns.sorted.map(col).toSeq
    for ((name, alt) <- alts) {
      assert(registered.columns.sorted.sameElements(alt.columns.sorted),
        s"$name: column sets must match")
      assert(registered.select(cols: _*).except(alt.select(cols: _*)).isEmpty &&
        alt.select(cols: _*).except(registered.select(cols: _*)).isEmpty,
        s"$name: row sets must be identical")
    }
  }

  /** The per-batch E2 transform (strip → fingerprint → score): the body
    * the stream runs per micro-batch. Dedup is NOT here — it's owned by
    * the sink's newest-wins merge, which is what makes re-delivery safe. */
  private def process(batch: DataFrame): DataFrame = {
    import graft.operators.TextOps._
    val stripped = batch.withColumn("content",
      call_function("graft_html_strip",
        concat(lit("<p class=\"n\">"), col("text"), lit("</p>"))))
    val staged = Scorers.withFieldStats(stripped, "c", col("content"))
    val m = Scorers.Models.head
    val sc = m.scoreFromCounts(col("c_pos"), col("c_neg"), col("c_hash"))
    staged.select(
      md5(normalizeText(col("content")).cast("binary")).as("fp"),
      col("doc_id"), col("source"), col("fetch_id"),
      sc.getField("label").as("label"),
      sc.getField("score").as("score"))
  }

  test("E2 write path: foreachBatch + keyed upsert absorbs re-fetch overlap") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val spark0 = spark
    import spark0.implicits._
    implicit val sq = spark0.sqlContext

    val sink = Files.createTempDirectory("graft_news").toString + "/points"
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val nDocs = docs.length
    val overlap = docs.filter(_._1 % 3 == 0)

    val source = MemoryStream[(Long, String, String, Long)]
    val query = source.toDS()
      .toDF("doc_id", "text", "source", "fetch_id")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Sinks.upsertByKey(spark0, process(batch), sink,
          keys = Seq("fp"), versionCol = "fetch_id")
      }
      .outputMode("update")
      .start()
    try {
      // hour 1: full fetch; hours 2 and 3: the 24h window re-delivers a
      // third of the corpus (the reference's duplicate source)
      source.addData(docs.map { case (id, t, s) => (id, t, s, 1L) })
      query.processAllAvailable()
      source.addData(overlap.map { case (id, t, s) => (id, t, s, 2L) })
      query.processAllAvailable()
      source.addData(overlap.map { case (id, t, s) => (id, t, s, 3L) })
      query.processAllAvailable()
    } finally query.stop()

    val stored = spark.read.parquet(sink)
    assert(stored.count() == nDocs,
      "re-fetched articles must update, never accumulate (the X3 fix)")
    val fetches = stored.groupBy(col("doc_id") % 3 === 0).agg(
      min("fetch_id").as("lo"), max("fetch_id").as("hi")).collect()
      .map(r => r.getBoolean(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fetches(true) == (3L, 3L), "overlapped rows carry the newest fetch")
    assert(fetches(false) == (1L, 1L))
    // and the stored scores equal a straight batch run of the same stage
    val batchScores = process(
      Tables.documents(spark, sf).select("doc_id", "text", "source")
        .withColumn("fetch_id", lit(1L)))
      .select("fp", "label", "score")
    assert(stored.select("fp", "label", "score")
      .exceptAll(batchScores).isEmpty, "stream and batch scores must agree")
  }
}
