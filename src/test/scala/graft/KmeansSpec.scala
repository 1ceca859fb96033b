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

  test("DataFrame-native Lloyd matches the literal-seeded form bit-for-bit") {
    // kmeansCentroidsDf (the production path since r7 — nothing k-sized
    // ever collects to the driver) must produce the same centroids as
    // the literal-seeded reference form: same seeds, same decimal-exact
    // means, same empty-cell retention. Seeds are vec_id < 8, so
    // cent_id i == literal index i and rows compare directly.
    val dim = corpus.select(col("emb")).first()
      .getAs[scala.collection.Seq[Double]](0).length
    val seeds = corpus.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cent_id"), col("emb").as("cvec"))
    val viaDf = kmeansCentroidsDf(corpus, "emb", seeds, iters = 2, dim = dim)
      .collect().map(r => r.getInt(0) ->
        r.getAs[scala.collection.Seq[Double]](1).toSeq).sortBy(_._1).map(_._2).toSeq
    val viaLiteral = kmeansCentroids(corpus, "emb", init, iters = 2)
    assert(viaDf == viaLiteral)
    // and it is partitioning-independent like the literal form
    val viaDf2 = kmeansCentroidsDf(corpus.repartition(7), "emb", seeds,
      iters = 2, dim = dim)
      .collect().map(r => r.getInt(0) ->
        r.getAs[scala.collection.Seq[Double]](1).toSeq).sortBy(_._1).map(_._2).toSeq
    assert(viaDf2 == viaDf)
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

  test("ivfK scales k with the corpus: floor at small SF, linear past it, capped") {
    import graft.queries.VectorQueries.{ivfK, ivfNprobe, MaxIvfK, TargetCellRows}
    assert(ivfK(500) == 16 && ivfK(2025) == 16,
      "test-SF corpora stay on the floor (existing oracle geometry)")
    assert(ivfK(1024L * 1024) == 1024)
    val n = 16L * 1024 * 1024 // inside the linear regime (2n stays under MaxIvfK)
    assert(ivfK(2 * n) == 2 * ivfK(n), "k doubles when the corpus doubles")
    assert(ivfK(Long.MaxValue / 4) == MaxIvfK)
    assert(ivfNprobe(16) == 2 && ivfNprobe(1024) == 128,
      "probed-cell fraction stays constant as k grows")
    assert(ivfK(n) * TargetCellRows >= n, "mean cell never exceeds the target")
  }

  test("SemDeDup pair space grows linearly, not quadratically, when the corpus doubles") {
    import graft.queries.VectorQueries.ivfK
    // synthetic corpus big enough that ivfK is past its floor: doubling n
    // doubles k, so mean |cell| is constant and sum(|cell|^2) — the exact
    // pair space of q_v9's within-cell self-join — grows ~2x, not ~4x
    def pairSpace(n: Long): Double = {
      val e = spark.range(n).select(col("id").as("vec_id"),
        array(
          sin(col("id") * 0.7), cos(col("id") * 1.3),
          sin(col("id") * 2.1 + 1.0), cos(col("id") * 0.3 + 2.0))
          .as("embedding"))
      val cents = e.filter(col("vec_id") < ivfK(n))
        .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
      graft.operators.IvfIndex
        .assignCells(e.withColumn("label", lit(0)), cents)
        .groupBy("cent_id").count()
        .agg(sum(col("count") * col("count"))).first().getLong(0).toDouble
    }
    val n = 32768L
    val ratio = pairSpace(2 * n) / pairSpace(n)
    assert(ratio < 3.0,
      f"pair space grew ${ratio}%.2fx on a 2x corpus — quadratic regime (fixed k?)")
  }

  test("cappedCells truncates a skew cell: pairs bounded at cap^2/2, kept pairs intact") {
    import graft.queries.VectorQueries.cappedCells
    // adversarial corpus: every vector identical -> one cell regardless of k
    val e = spark.range(100).select(col("id").as("vec_id"),
      array(lit(1.0), lit(0.5), lit(0.25), lit(0.125)).as("embedding"))
    val cents = e.limit(1)
      .select(lit(0L).as("cent_id"), col("embedding").as("cvec"))
    val cells = cappedCells(
      graft.operators.IvfIndex.assignCells(e.withColumn("label", lit(0)), cents)
        .select(col("vec_id"), col("embedding"), col("cent_id")),
      cap = 10)
    assert(cells.count() == 10, "participation truncates to the cap")
    assert(cells.agg(max("vec_id")).first().getLong(0) == 9,
      "kept members are the first `cap` by vec_id — deterministic")
    val pairs = cells.as("a").join(cells.as("b"),
      col("a.cent_id") === col("b.cent_id") && col("a.vec_id") < col("b.vec_id"))
    assert(pairs.count() == 45, "all pairs among kept members survive")
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
