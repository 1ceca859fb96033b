package graft

import java.nio.file.Files

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.NswIndex
import graft.sources.Tables

/** Incremental-append contract of the persisted NSW index (VERDICT r6
  * missing #1 — the reference's continuous HNSW upsert,
  * news_etl_dag.py:142-183): ascending-id appends are bit-identical to
  * a full rebuild of the grown corpus, only touched shard directories
  * are rewritten, the marker advances so buildIfAbsent no-ops and
  * resident graphs age out, and a real foreachBatch ingest loop lands
  * searches on the same rows as the all-at-once build. */
class NswAppendSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)
  private val sf = "/root/testdata/sf0.001"
  private val numShards = 4

  private def freshPath(): String =
    Files.createTempDirectory("graft_nsw_spec").toString + "/idx"

  private lazy val corpus = Tables.embeddings(spark, sf)
  private lazy val n = corpus.count()
  private lazy val cut = (n * 3) / 5

  private lazy val queryPoints: Seq[(Long, Seq[Double])] =
    corpus.filter(col("vec_id") < 4)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toSeq
      .sortBy(_._1)

  private def graphRows(path: String): Seq[Seq[Any]] =
    spark.read.parquet(s"$path/graph")
      .select(col("shard").cast("int"), col("vec_id"), col("v"), col("nbrs"))
      .orderBy("vec_id")
      .collect().map(_.toSeq).toSeq

  private def searchRows(path: String): Seq[Seq[Any]] =
    NswIndex.searchShards(spark, path, queryPoints, kPerShard = 5)
      .orderBy("qid", "vec_id")
      .collect().map(_.toSeq).toSeq

  test("ascending-id append equals the full rebuild, graph and search") {
    val appended = freshPath()
    NswIndex.buildIfAbsent(corpus.filter(col("vec_id") < cut),
      "vec_id", "embedding", appended, numShards = numShards)
    NswIndex.append(corpus.filter(col("vec_id") >= cut),
      "vec_id", "embedding", appended)
    val full = freshPath()
    NswIndex.buildIfAbsent(corpus, "vec_id", "embedding", full,
      numShards = numShards)
    assert(graphRows(appended) == graphRows(full),
      "appended shard graphs differ from the from-scratch build")
    assert(searchRows(appended) == searchRows(full))
  }

  test("only touched shards are rewritten; marker advances; buildIfAbsent no-ops") {
    val path = freshPath()
    NswIndex.buildIfAbsent(corpus, "vec_id", "embedding", path,
      numShards = numShards)
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    // one new vector -> exactly one touched shard (the build's own
    // pmod(hash(vec_id), shards) routing)
    val newId = n + 1
    val batch = corpus.filter(col("vec_id") === 0)
      .withColumn("vec_id", lit(newId))
    val touched = batch
      .withColumn("shard", pmod(hash(col("vec_id")), lit(numShards)).cast("int"))
      .select("shard").head.getInt(0)
    def fileTimes(shard: Int): Map[String, Long] = {
      val dir = new Path(s"$path/graph/shard=$shard")
      fs.listStatus(dir).filter(_.isFile)
        .map(f => f.getPath.getName -> f.getModificationTime).toMap
    }
    val before = (0 until numShards).map(fileTimes)
    NswIndex.append(batch, "vec_id", "embedding", path)
    (0 until numShards).filter(_ != touched).foreach { s =>
      assert(fileTimes(s) == before(s), s"untouched shard $s was rewritten")
    }
    assert(fileTimes(touched) != before(touched), "touched shard not rewritten")
    // grown count is in the marker: a rebuild attempt over the grown
    // corpus sees a current index and leaves it alone
    val marker = new Path(s"$path/$marker_name")
    val stampT = fs.getFileStatus(marker).getModificationTime
    NswIndex.buildIfAbsent(corpus.unionByName(batch), "vec_id", "embedding",
      path, numShards = numShards)
    assert(fs.getFileStatus(marker).getModificationTime == stampT,
      "buildIfAbsent rebuilt despite a current marker")
    // the appended row is findable (it clones vec_id 0's embedding, so
    // both score cosine 1.0 and the smaller id wins the tie — top-2)
    val qv = batch.select(transform(col("embedding"), x => x.cast("double")))
      .head.getSeq[Double](0).toSeq
    val top2 = NswIndex.searchTopK(spark, path, qv, k = 2)
      .collect().map(_.getLong(0)).toSet
    assert(top2 == Set(0L, newId))
  }

  private val marker_name = "_GRAPH_READY"

  test("streaming ingest: foreachBatch appends micro-batches, search parity with batch build") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val spark0 = spark
    import spark0.implicits._
    implicit val sq = spark0.sqlContext
    val path = freshPath()
    NswIndex.buildIfAbsent(corpus.filter(col("vec_id") < cut),
      "vec_id", "embedding", path, numShards = numShards)
    // late arrivals in ascending-id chunks — the event-time ingest shape
    val late = corpus.filter(col("vec_id") >= cut)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val source = MemoryStream[(Long, Array[Double])]
    val query = source.toDS().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        NswIndex.append(batch, "vec_id", "embedding", path)
      }
      .outputMode("update")
      .start()
    try {
      late.grouped(math.max(late.length / 3, 1)).foreach { chunk =>
        source.addData(chunk.toSeq)
        query.processAllAvailable()
      }
    } finally query.stop()
    val full = freshPath()
    NswIndex.buildIfAbsent(corpus, "vec_id", "embedding", full,
      numShards = numShards)
    assert(searchRows(path) == searchRows(full))
  }

  test("append to a missing index fails loudly") {
    val ex = intercept[IllegalArgumentException] {
      NswIndex.append(corpus, "vec_id", "embedding", freshPath())
    }
    assert(ex.getMessage.contains("no index at"))
  }
}
