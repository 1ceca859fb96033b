package graft

import java.nio.file.Files

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfIndex

/** Contract of [[IvfIndex.rebalance]] — the oversized-cell split pass
  * (the Qdrant background-optimizer analog: appends never move the
  * centroid set, so a drifting corpus piles rows into hot cells).
  *
  * Pins: row conservation (no vector lost or duplicated by the
  * touched-partition rewrite), k/marker advancement, full-probe serve
  * parity before vs after (payloads move verbatim, so every score is
  * bit-identical), the same guarantees on the int8 layout, idempotence
  * (a balanced index returns 0), collapse cancellation (a one-cluster
  * hot cell refuses to split), and the PQ-layout refusal. */
class IvfRebalanceSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)
  private val dim = 8

  private def freshPath(): String =
    Files.createTempDirectory("graft_ivf_rebal").toString + "/idx"

  private def basis(i: Int, scale: Double = 1.0): Array[Double] = {
    val a = Array.fill(dim)(0.0); a(i) = scale; a
  }

  private def add(a: Array[Double], b: Array[Double]): Seq[Double] =
    a.zip(b).map { case (x, y) => x + y }.toSeq

  /** 600 rows: 500 in one hot cell around e0 (two subclusters split on
    * the e4 axis), 100 spread over e1/e2/e3. Deterministic. */
  private def skewedCorpus() = {
    import spark.implicits._
    val rows = (0L until 600L).map { i =>
      val v =
        if (i < 500)
          add(basis(0), basis(4, if (i % 2 == 0) 0.3 else -0.3))
        else add(basis(1 + (i % 3).toInt), basis(5, 0.01 * (i % 7)))
      (i, "a", v)
    }
    rows.toDF("vec_id", "label", "embedding")
  }

  /** The same shape but the hot cell is 500 copies of EXACTLY e0 — a
    * one-cluster cell whose 2-means must collapse. */
  private def tightCorpus() = {
    import spark.implicits._
    val rows = (0L until 600L).map { i =>
      val v =
        if (i < 500) basis(0).toSeq
        else add(basis(1 + (i % 3).toInt), basis(5, 0.01 * (i % 7)))
      (i, "a", v)
    }
    rows.toDF("vec_id", "label", "embedding")
  }

  private def cents4() = {
    import spark.implicits._
    (0 until 4).map(i => (i.toLong, basis(i).toSeq))
      .toDF("cent_id", "cvec")
  }

  /** Centroid table under the CURRENT marker version (a rebalance
    * publishes `centroids.v<n>/` and retains the replaced dir one
    * cycle, so reading the plain dir after a split sees stale rows). */
  private def centroidTable(path: String) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(path, "_INDEX_READY"))
    val stamp =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    spark.read.parquet(IvfIndex.centroidsDirOf(path, stamp))
  }

  private def cellSizes(path: String): Map[Int, Long] =
    spark.read.parquet(s"$path/cells").groupBy("cent_id").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  private def allIds(path: String): Set[Long] =
    spark.read.parquet(s"$path/cells").select("vec_id")
      .collect().map(_.getLong(0)).toSet

  private def fullProbe(path: String, k: Int = 10): Seq[Seq[Any]] =
    IvfIndex.searchTopK(spark, path,
      queryVec = add(basis(0), basis(4, 0.3)), nprobe = 64, k = k)
      .collect().map(_.toSeq).toSeq

  test("splits the hot cell: conservation, k growth, marker advance") {
    val path = freshPath()
    IvfIndex.buildIfAbsent(skewedCorpus(), cents4(), path)
    val before = cellSizes(path)
    assert(before(0) == 500)
    val idsBefore = allIds(path)
    val served = fullProbe(path)
    val splits = IvfIndex.rebalance(spark, path, oversizeFactor = 2.0)
    assert(splits == 1)
    val after = cellSizes(path)
    assert(after.keySet == before.keySet + 4)
    assert(after(0) + after(4) == 500L,
      s"hot-cell rows must be conserved across the split: $after")
    assert(math.max(after(0), after(4)) < 500L, "the split must move rows")
    assert(allIds(path) == idsBefore)
    val centIds = centroidTable(path)
      .select("cent_id").collect().map(_.getLong(0)).toSet
    assert(centIds == Set(0L, 1L, 2L, 3L, 4L))
    // payloads moved verbatim -> every full-probe score is bit-identical
    assert(fullProbe(path) == served)
    // second pass at the same threshold: balanced now, no-op
    assert(IvfIndex.rebalance(spark, path, oversizeFactor = 2.0) == 0)
  }

  test("the 2-means actually separates the subclusters") {
    val path = freshPath()
    IvfIndex.buildIfAbsent(skewedCorpus(), cents4(), path)
    IvfIndex.rebalance(spark, path, oversizeFactor = 2.0)
    // subcluster membership is vec_id parity (e4 = +0.3 vs -0.3); each
    // child cell must be parity-pure
    val purity = spark.read.parquet(s"$path/cells")
      .filter(col("cent_id").isin(0, 4))
      .groupBy("cent_id")
      .agg(countDistinct(col("vec_id") % 2).as("parities"))
      .collect().map(_.getLong(1))
    assert(purity.forall(_ == 1L),
      "each child must hold exactly one e4-sign subcluster")
  }

  test("int8 layout: payloads move verbatim, serve parity holds") {
    val path = freshPath()
    IvfIndex.buildIfAbsent(skewedCorpus(), cents4(), path, quantize = true)
    val served = fullProbe(path)
    val splits = IvfIndex.rebalance(spark, path, oversizeFactor = 2.0)
    assert(splits == 1)
    val after = cellSizes(path)
    assert(after(0) + after(4) == 500L)
    assert(fullProbe(path) == served)
  }

  test("versioned centroid publish: rename-free swap, replaced dir retained one cycle") {
    // ADVICE r10 #1: a lock-free concurrent search must always find the
    // centroid table its stamp names — the rebalance publishes a fresh
    // centroids.v<n>/ and only then advances the marker, retaining the
    // replaced version for one full cycle.
    val path = freshPath()
    IvfIndex.buildIfAbsent(skewedCorpus(), cents4(), path)
    assert(IvfIndex.rebalance(spark, path, oversizeFactor = 2.0) == 1)
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(path, "_INDEX_READY"))
    val stamp =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    assert(stamp.contains(",cv=1"), s"marker must carry the version: $stamp")
    assert(fs.exists(new Path(path, "centroids.v1")),
      "versioned table must exist when the marker names it")
    assert(fs.exists(new Path(path, "centroids")),
      "the replaced (v0) table must survive one rebalance cycle for " +
        "in-flight searches holding the old stamp")
    // serve path resolves the versioned table: id 4 (the new child) is
    // probeable, and an append keeps cv in the rewritten marker
    assert(fullProbe(path).nonEmpty)
    import spark.implicits._
    IvfIndex.append(
      Seq((9000L, "a", add(basis(1), basis(5, 0.02))))
        .toDF("vec_id", "label", "embedding"), path)
    val in2 = fs.open(new Path(path, "_INDEX_READY"))
    val stamp2 =
      try scala.io.Source.fromInputStream(in2, "UTF-8").mkString
      finally in2.close()
    assert(stamp2.contains(",cv=1"),
      s"append must carry the centroid version forward: $stamp2")
  }

  test("duplicate boundary vec_id rows do not duplicate published centroid ids") {
    // ADVICE r10 #2: append never dedupes, so a re-ingested copy of a
    // cell's min/max vec_id yields two candidate seed rows for one seed
    // slot — the deterministic survivor rule must keep the centroid
    // table's ids unique through the split.
    val path = freshPath()
    IvfIndex.buildIfAbsent(skewedCorpus(), cents4(), path)
    import spark.implicits._
    // duplicate the hot cell's boundary ids (0 = min, 498 = max even id
    // in cell 0's subcluster range; duplicate both extremes verbatim)
    IvfIndex.append(
      Seq(
        (0L, "a", add(basis(0), basis(4, 0.3))),
        (499L, "a", add(basis(0), basis(4, -0.3))))
        .toDF("vec_id", "label", "embedding"), path)
    assert(IvfIndex.rebalance(spark, path, oversizeFactor = 2.0) == 1)
    val ids = centroidTable(path).select("cent_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.distinct.size == ids.size,
      s"published centroid ids must be unique: $ids")
    assert(ids.toSet == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("a one-cluster hot cell collapses and the split is canceled") {
    val path = freshPath()
    IvfIndex.buildIfAbsent(tightCorpus(), cents4(), path)
    val before = cellSizes(path)
    assert(IvfIndex.rebalance(spark, path, oversizeFactor = 2.0) == 0)
    assert(cellSizes(path) == before)
    val centIds = centroidTable(path)
      .select("cent_id").collect().map(_.getLong(0)).toSet
    assert(centIds == Set(0L, 1L, 2L, 3L))
  }

  test("PQ layouts refuse: codes are residuals against the old centroid") {
    val path = freshPath()
    IvfIndex.buildPqIfAbsent(skewedCorpus(), cents4(), path, trainIters = 0)
    val ex = intercept[IllegalArgumentException] {
      IvfIndex.rebalance(spark, path, oversizeFactor = 2.0)
    }
    assert(ex.getMessage.contains("rebuild"))
  }
}
