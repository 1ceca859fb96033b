package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps._

/** Contract for the Lloyd-refined IVF coarse quantizer (the index-build
  * step; no SQL oracle — the iterative build has no tractable mirror, so
  * this spec carries determinism + structure, and Bench reports the
  * measured recall).
  */
class KmeansSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)
  private val sf = "/root/testdata/sf0.001"

  private def corpus = graft.sources.Tables.embeddings(spark, sf)
    .select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("emb"))

  private def init = corpus.filter(col("vec_id") < 8)
    .orderBy("vec_id").collect()
    .map(_.getAs[scala.collection.Seq[Double]]("emb").toSeq).toSeq

  test("kmeansCentroids is deterministic across runs and partitionings") {
    val a = kmeansCentroids(corpus, "emb", init, iters = 2)
    val b = kmeansCentroids(corpus.repartition(7), "emb", init, iters = 2)
    assert(a == b, "decimal-exact means must be partitioning-independent")
  }

  test("refinement moves centroids and keeps k, dim, and full coverage") {
    val refined = kmeansCentroids(corpus, "emb", init, iters = 2)
    assert(refined.size == init.size)
    assert(refined.forall(_.length == init.head.length))
    assert(refined != init, "2 Lloyd iterations must move sampled centroids")
    // every vector lands in some cell; cells form a partition of the corpus
    val cellCount = corpus
      .select(nearestCentroid(col("emb"), refined).as("cell"))
      .groupBy("cell").count().collect()
    assert(cellCount.map(_.getLong(1)).sum == corpus.count())
    assert(cellCount.forall(r => r.getInt(0) >= 0 && r.getInt(0) < refined.size))
  }

  test("refined cells are more balanced than sampled cells (max cell shrinks)") {
    def maxCell(cents: Seq[Seq[Double]]): Long = corpus
      .select(nearestCentroid(col("emb"), cents).as("cell"))
      .groupBy("cell").count()
      .agg(max(col("count"))).first().getLong(0)
    // Lloyd pulls centroids toward mass, so the biggest cell should not
    // grow MATERIALLY — strict monotonicity is not a k-means guarantee
    // (assignment boundaries shift a few rows either way per dataset,
    // and the testdata is regenerated per round), so allow 5% + 1 slack
    // while still catching a real balance regression
    val before = maxCell(init)
    val after = maxCell(kmeansCentroids(corpus, "emb", init, iters = 2))
    assert(after <= (before * 1.05).toLong + 1,
      s"refined max cell $after grew materially over sampled $before")
  }
}
