package graft

import java.nio.file.Files

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfIndex
import graft.queries.VectorQueries
import graft.sources.Tables

/** Contract of the batched index serve ([[IvfIndex.searchTopKBatch]]):
  * row parity with the per-call path for every query in the batch, on
  * both raw and int8 layouts (the int8 batch scores through the
  * column-variant fused expression `graft_dequant_cosine_col` — its
  * parity with the per-call constant-y `graft_dequant_cosine` is what
  * this pins), and a plan shape with ONE broadcast join and no shuffle
  * of the scored corpus (the only exchange carries k·|queries| heap
  * rows).
  */
class IvfBatchSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)
  private val sf = "/root/testdata/sf0.001"

  private def freshPath(): String =
    Files.createTempDirectory("graft_ivfb_spec").toString + "/idx"

  private def corpus() = Tables.embeddings(spark, sf)

  private def cents() = corpus().filter(col("vec_id") < 16)
    .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))

  private val batch = VectorQueries.BatchQueryVecs.zipWithIndex
    .map { case (q, i) => (i.toLong, q) }

  private def perQuery(path: String, k: Int): Seq[(Long, Long, Double)] =
    batch.flatMap { case (qid, qv) =>
      IvfIndex.searchTopK(spark, path, qv, nprobe = 2, k = k)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(2)))
    }

  private def batched(path: String, k: Int): Seq[(Long, Long, Double)] =
    IvfIndex.searchTopKBatch(spark, path, batch, nprobe = 2, k = k)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq

  test("batch == per-query loop, raw layout") {
    val path = freshPath()
    IvfIndex.buildIfAbsent(corpus(), cents(), path)
    assert(batched(path, 5) == perQuery(path, 5))
  }

  test("batch == per-query loop, int8 layout (column-variant fused score)") {
    val path = freshPath()
    IvfIndex.buildIfAbsent(corpus(), cents(), path, quantize = true)
    assert(batched(path, 5) == perQuery(path, 5))
  }

  test("batch == per-query loop, donor-PQ layout (AdcScoreAt parity)") {
    // the gp-indexed batch tables must reproduce the per-query AdcScore
    // ranking bit-for-bit — transitively the q_v11 oracle's fold orders
    val path = freshPath()
    IvfIndex.buildPqIfAbsent(corpus(), cents(), path, trainIters = 0)
    assert(batched(path, 5) == perQuery(path, 5))
  }

  test("batch == per-query loop, trained-PQ layout") {
    val path = freshPath()
    IvfIndex.buildPqIfAbsent(corpus(), cents(), path)
    assert(batched(path, 5) == perQuery(path, 5))
  }

  // r11 (VERDICT r10 next #4): at or above DistributedProbeBatchThreshold
  // probe assignment runs as ONE queries×centroids broadcast job instead
  // of a per-query selectProbes loop — these pin row parity with the
  // per-call path across the threshold, which transitively pins the
  // distributed assignment's (sim DESC, cent_id) ranking and, on the PQ
  // layout, the rank order the gp indexing depends on.
  private val bigBatch = graft.operators.VectorOps
    .hyperplanes(IvfIndex.DistributedProbeBatchThreshold + 6,
      VectorQueries.Dim, seed = 31L)
    .zipWithIndex.map { case (q, i) => (i.toLong, q) }

  private def perQueryBig(path: String, k: Int): Seq[(Long, Long, Double)] =
    bigBatch.flatMap { case (qid, qv) =>
      IvfIndex.searchTopK(spark, path, qv, nprobe = 2, k = k)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(2)))
    }

  private def batchedBig(path: String, k: Int): Seq[(Long, Long, Double)] =
    IvfIndex.searchTopKBatch(spark, path, bigBatch, nprobe = 2, k = k)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq

  test("distributed probe assignment == per-query loop, raw layout") {
    val path = freshPath()
    IvfIndex.buildIfAbsent(corpus(), cents(), path)
    assert(batchedBig(path, 5) == perQueryBig(path, 5))
  }

  test("distributed probe assignment == per-query loop, trained-PQ layout") {
    val path = freshPath()
    IvfIndex.buildPqIfAbsent(corpus(), cents(), path)
    assert(batchedBig(path, 5) == perQueryBig(path, 5))
  }

  test("plan: one broadcast join, corpus never shuffled") {
    val path = freshPath()
    IvfIndex.buildIfAbsent(corpus(), cents(), path)
    val plan = IvfIndex.searchTopKBatch(spark, path, batch, nprobe = 2, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"probe table must broadcast:\n$plan")
    // the only allowed exchanges: the broadcast itself and the k-heap
    // partial-agg exchange keyed by qid (k·|queries| rows)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 1, s"expected <= 1 hash exchange (qid heap merge):\n$plan")
    assert(plan.contains("graft_topk") || plan.contains("topkbyscore") ||
      plan.toLowerCase.contains("topk"),
      s"per-qid bounded heap must aggregate the scores:\n$plan")
  }

  test("tiny collection: full-scan fallback serves every query exactly") {
    val path = freshPath()
    val tiny = corpus().filter(col("vec_id") < 40)
    IvfIndex.buildIfAbsent(tiny,
      tiny.filter(col("vec_id") < 4)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cvec")),
      path)
    val got = batched(path, 3)
    val exact = batch.flatMap { case (qid, qv) =>
      tiny.select(col("vec_id"),
          round(graft.operators.VectorOps.cosine(
            col("embedding"), typedLit(qv)), 6).as("s"))
        .orderBy(desc("s"), col("vec_id")).limit(3)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1)))
    }
    assert(got == exact)
  }
}
