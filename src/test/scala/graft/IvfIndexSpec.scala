package graft

import java.nio.file.Files

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfIndex
import graft.queries.VectorQueries
import graft.sources.Tables

/** Persisted IVF index contract (VERDICT r4 missing #1 — the reference's
  * build-once/serve-many Qdrant model, init_qdrant.py:38-58):
  * search-from-disk parity with the in-plan q_v6 path, DDL-if-absent
  * idempotence, staleness-triggered rebuild, and the partition-pruned
  * serving plan. */
class IvfIndexSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)
  private val sf = "/root/testdata/sf0.001"

  private def freshPath(): String =
    Files.createTempDirectory("graft_ivf_spec").toString + "/idx"

  private def corpus() = Tables.embeddings(spark, sf)

  private def cents() = corpus().filter(col("vec_id") < 16)
    .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))

  test("search from the persisted index matches the in-plan IVF path") {
    val path = freshPath()
    IvfIndex.buildIfAbsent(corpus(), cents(), path)
    val fromDisk = IvfIndex
      .searchTopK(spark, path, VectorQueries.QueryVec, nprobe = 2, k = 5)
      .collect().map(_.toSeq).toSeq
    val inPlan = SparkEntry.queries("q_v6_ivf_ann")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(fromDisk == inPlan)
  }

  test("build is DDL-if-absent: a matching index is not rewritten") {
    val path = freshPath()
    IvfIndex.buildIfAbsent(corpus(), cents(), path)
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def cellFiles(): Set[String] = {
      val it = fs.listFiles(new Path(path, "cells"), true)
      val b = Set.newBuilder[String]
      while (it.hasNext) {
        val f = it.next()
        b += f.getPath.toString + "@" + f.getModificationTime
      }
      b.result()
    }
    val before = cellFiles()
    IvfIndex.buildIfAbsent(corpus(), cents(), path) // must no-op
    assert(cellFiles() == before)
  }

  test("a corpus-count change invalidates the marker and rebuilds") {
    val path = freshPath()
    val half = corpus().filter(col("vec_id") % 2 === 0)
    IvfIndex.buildIfAbsent(half, cents(), path)
    val nHalf = spark.read.parquet(s"$path/cells").count()
    assert(nHalf == half.count())
    IvfIndex.buildIfAbsent(corpus(), cents(), path) // stale -> rebuild
    assert(spark.read.parquet(s"$path/cells").count() == corpus().count())
  }

  test("int8-quantized index: smaller cells, bounded score error, append keeps layout") {
    val raw = freshPath()
    val quant = freshPath()
    IvfIndex.buildIfAbsent(corpus(), cents(), raw)
    IvfIndex.buildIfAbsent(corpus(), cents(), quant, quantize = true)
    // at-rest payload shrinks (floats 4B -> tinyint + one scale per row)
    val rawBytes = IvfIndex.cellBytes(spark, raw)
    val qBytes = IvfIndex.cellBytes(spark, quant)
    assert(qBytes < rawBytes * 7 / 10,
      s"quantized cells $qBytes B not materially smaller than raw $rawBytes B")
    // schema: quantized payload, no raw embedding column
    val qSchema = spark.read.parquet(s"$quant/cells").schema.fieldNames.toSet
    assert(qSchema.contains("q") && qSchema.contains("scale")
      && !qSchema.contains("embedding"))
    // dequant-rescored top-5: same candidates within int8 error bounds
    def top(p: String) = IvfIndex
      .searchTopK(spark, p, VectorQueries.QueryVec, nprobe = 2, k = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val (tRaw, tQ) = (top(raw), top(quant))
    val common = tRaw.keySet.intersect(tQ.keySet)
    assert(common.nonEmpty, "quantized top-5 shares candidates with exact")
    common.foreach { id =>
      assert(math.abs(tRaw(id) - tQ(id)) < 0.02,
        s"vec $id dequant score ${tQ(id)} too far from exact ${tRaw(id)}")
    }
    // append into a quantized index stays quantized and serves correctly
    val part = freshPath()
    IvfIndex.buildIfAbsent(corpus().filter(col("vec_id") % 2 === 0),
      cents(), part, quantize = true)
    IvfIndex.append(corpus().filter(col("vec_id") % 2 === 1), part)
    val partSchema = spark.read.parquet(s"$part/cells").schema.fieldNames.toSet
    assert(partSchema.contains("q") && !partSchema.contains("embedding"))
    assert(IvfIndex.searchTopK(spark, part, VectorQueries.QueryVec,
      nprobe = 2, k = 5).collect().map(_.getLong(0)).toSeq ==
      IvfIndex.searchTopK(spark, quant, VectorQueries.QueryVec,
        nprobe = 2, k = 5).collect().map(_.getLong(0)).toSeq)
  }

  test("PQ index: 8-byte codes at rest, marker discipline, append encodes against stored codebooks") {
    val pq = freshPath()
    IvfIndex.buildPqIfAbsent(corpus(), cents(), pq)
    // cells store ONLY the codes — no raw or int8 payload
    val schema = spark.read.parquet(s"$pq/cells").schema.fieldNames.toSet
    assert(schema.contains("code") && !schema.contains("embedding")
      && !schema.contains("q"))
    // at-rest payload materially below even the int8 cells (8 B vs 64 B
    // of payload per vector before parquet framing)
    val quant = freshPath()
    IvfIndex.buildIfAbsent(corpus(), cents(), quant, quantize = true)
    val pqBytes = IvfIndex.cellBytes(spark, pq)
    val qBytes = IvfIndex.cellBytes(spark, quant)
    assert(pqBytes < qBytes / 2,
      s"PQ cells $pqBytes B not materially smaller than int8 $qBytes B")
    // ADC search: k deterministic rows
    def search(p: String) = IvfIndex
      .searchTopK(spark, p, VectorQueries.QueryVec, nprobe = 2, k = 5)
      .collect().map(_.toSeq).toSeq
    val first = search(pq)
    assert(first.length == 5 && first == search(pq))
    // DDL-if-absent: marker untouched on a matching rebuild
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val mPath = new Path(pq, "_INDEX_READY")
    val before = fs.getFileStatus(mPath).getModificationTime
    IvfIndex.buildPqIfAbsent(corpus(), cents(), pq)
    assert(fs.getFileStatus(mPath).getModificationTime == before)
    // append parity under the DONOR rule: prefix and full builds share
    // the vec_id < 16 donor codebooks bit-for-bit, so a PREFIX build
    // plus an append of the rest must equal the full build EXACTLY —
    // appended rows must encode against the STORED codebooks. (The
    // default TRAINED rule retrains on the build input, so full-vs-
    // prefix codebooks legitimately differ; trained append is pinned by
    // IvfPqTrainedSpec via codebook immutability + the rerank serving
    // shape instead.)
    val n = corpus().count()
    val donorFull = freshPath()
    IvfIndex.buildPqIfAbsent(corpus(), cents(), donorFull, trainIters = 0)
    val part = freshPath()
    IvfIndex.buildPqIfAbsent(corpus().filter(col("vec_id") < n / 2), cents(), part,
      trainIters = 0)
    IvfIndex.append(corpus().filter(col("vec_id") >= n / 2), part)
    assert(search(part) == search(donorFull))
    // marker advanced: buildPqIfAbsent over the grown corpus no-ops
    val pBefore = fs.getFileStatus(new Path(part, "_INDEX_READY")).getModificationTime
    IvfIndex.buildPqIfAbsent(corpus(), cents(), part, trainIters = 0)
    assert(fs.getFileStatus(new Path(part, "_INDEX_READY")).getModificationTime == pBefore)
  }

  test("incremental append equals a full build over the grown corpus") {
    val path = freshPath()
    val half = corpus().filter(col("vec_id") % 2 === 0)
    val rest = corpus().filter(col("vec_id") % 2 === 1)
    // centroids come from the full corpus in both universes so the cell
    // geometry is identical — the append contract under test
    IvfIndex.buildIfAbsent(half, cents(), path)
    IvfIndex.append(rest, path)
    val full = freshPath()
    IvfIndex.buildIfAbsent(corpus(), cents(), full)
    def search(p: String) = IvfIndex
      .searchTopK(spark, p, VectorQueries.QueryVec, nprobe = 2, k = 5)
      .collect().map(_.toSeq).toSeq
    assert(search(path) == search(full))
    // marker advanced: buildIfAbsent over the grown corpus must no-op
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val before = fs.getFileStatus(new Path(path, "_INDEX_READY")).getModificationTime
    IvfIndex.buildIfAbsent(corpus(), cents(), path)
    assert(fs.getFileStatus(new Path(path, "_INDEX_READY")).getModificationTime == before)
  }

  test("streaming ingest: foreachBatch appends micro-batches into the index") {
    // the reference's serving loop — news arrives as a stream, its
    // embeddings upsert into the Qdrant collection continuously
    // (news_etl_dag.py -> init_qdrant.py collection): here the same
    // contract is a writeStream.foreachBatch feeding IvfIndex.append,
    // after which a search equals the all-at-once batch build.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val spark0 = spark
    import spark0.implicits._
    implicit val sq = spark0.sqlContext
    val path = freshPath()
    // initial index over the even half (contains the first-16 centroid
    // vectors' even part — centroids always come from the full corpus
    // so both universes share cell geometry)
    IvfIndex.buildIfAbsent(corpus().filter(col("vec_id") % 2 === 0), cents(), path)
    val lateRows = corpus().filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray))
    val source = MemoryStream[(Long, Int, Array[Float])]
    val query = source.toDF()
      .toDF("vec_id", "label", "embedding")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        IvfIndex.append(batch, path)
      }
      .outputMode("update")
      .start()
    try {
      lateRows.grouped(math.max(lateRows.length / 3, 1)).foreach { chunk =>
        source.addData(chunk)
        query.processAllAvailable()
      }
    } finally query.stop()
    val full = freshPath()
    IvfIndex.buildIfAbsent(corpus(), cents(), full)
    def search(p: String) = IvfIndex
      .searchTopK(spark, p, VectorQueries.QueryVec, nprobe = 2, k = 5)
      .collect().map(_.toSeq).toSeq
    assert(search(path) == search(full))
    assert(spark.read.parquet(s"$path/cells").count() == corpus().count())
  }

  test("append to a missing index fails loudly") {
    val ex = intercept[IllegalArgumentException] {
      IvfIndex.append(corpus(), freshPath())
    }
    assert(ex.getMessage.contains("no index at"))
  }

  test("serving plan partition-prunes to the probed cells, no exchange") {
    val path = freshPath()
    IvfIndex.buildIfAbsent(corpus(), cents(), path)
    val df = IvfIndex.searchTopK(spark, path, VectorQueries.QueryVec,
      nprobe = 2, k = 5)
    val plan = df.queryExecution.executedPlan
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val cellScan = scans.find(_.metadata.get("Location").exists(_.contains("cells")))
    assert(cellScan.isDefined, plan.toString)
    val pf = cellScan.get.partitionFilters.mkString(";")
    assert(pf.contains("cent_id") && pf.contains("IN"), pf)
    assert(!plan.toString.contains("Exchange"), "no shuffle in the serve path")
  }

  test("PQ/ADC serving plan partition-prunes, fuses scoring, and has no join") {
    // the ADC scan must touch only the probed cell directories and score
    // inside whole-stage codegen with NO join and NO shuffle exchange —
    // r10 (VERDICT r9 next #1): the probe table no longer broadcast-joins
    // per query; all ADC tables fold into the graft_adc_score expression,
    // so the whole serve plan is scan → project → TakeOrderedAndProject.
    // At 100 TB the difference between this plan and a full cell scan IS
    // the index.
    val path = freshPath()
    IvfIndex.buildPqIfAbsent(corpus(), cents(), path)
    val df = IvfIndex.searchTopK(spark, path, VectorQueries.QueryVec,
      nprobe = 2, k = 5)
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val cellScan = scans.find(_.metadata.get("Location").exists(_.contains("cells")))
    assert(cellScan.isDefined, plan.toString)
    val pf = cellScan.get.partitionFilters.mkString(";")
    assert(pf.contains("cent_id") && pf.contains("IN"), pf)
    val s = plan.toString
    assert(s.contains("adcscore"), "scoring must be the fused expression")
    assert(!s.contains("Join"), "no join in the fused ADC serve path")
    assert(!s.contains("ShuffleExchange") && !s.contains("Exchange hashpartitioning"),
      "no shuffle in the ADC serve path")
  }

  test("serve caches invalidate on delete+rebuild with an identical corpus") {
    // a rebuild with the same corpus reproduces the same marker STAMP,
    // so any serve cache keyed on the stamp alone (relation handles,
    // executor-cached centroids, probe lists) would keep handles to the
    // DELETED build's files — r10's ann_scaled loop measured this as
    // FILE_NOT_EXIST mid-scan. markerVersion (stamp + marker mtime)
    // keys must make this sequence serve the fresh build instead.
    val path = freshPath()
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    IvfIndex.buildIfAbsent(corpus(), cents(), path)
    val before = IvfIndex
      .searchTopK(spark, path, VectorQueries.QueryVec, nprobe = 2, k = 5)
      .collect().map(_.getLong(0)).toSeq
    fs.delete(new Path(path), true)
    IvfIndex.buildIfAbsent(corpus(), cents(), path)
    val after = IvfIndex
      .searchTopK(spark, path, VectorQueries.QueryVec, nprobe = 2, k = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(after == before,
      "rebuild of the identical corpus must serve identical results " +
        "from the FRESH files")
  }
}
