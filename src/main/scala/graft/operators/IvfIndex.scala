package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import VectorOps.cosine

/** Persistent IVF-flat ANN index — the build-once / serve-many model of
  * the reference's Qdrant collection (init_qdrant.py:38-58). graft's
  * in-plan IVF path (q_v6) re-derives the centroid assignment inside
  * every query, which is fine for one-shot analytics but wrong for the
  * repeated-query serving workload the reference actually runs: there
  * the index is built once and amortized over every later search.
  *
  * On-disk layout (plain parquet — readable by any engine, DuckDB
  * included, which is how the oracle checks it):
  * {{{
  *   <path>/centroids/           (cent_id BIGINT, cvec ARRAY<double-ish>)
  *   <path>/cells/cent_id=<c>/   corpus rows partitioned by cell id
  *   <path>/_INDEX_READY         marker: "v1,count=<corpus rows>"
  * }}}
  *
  * Scale shape: the build is one narrow argmax assignment pass plus one
  * partitioned write (rows move once, keyed by cent_id); a search reads
  * the tiny centroid table, picks the nprobe nearest cells, and scans
  * ONLY those cell directories — static partition pruning, never a
  * corpus scan. Driver-side state is nprobe ints (the probe list).
  * Build is DDL-if-absent (SURVEY §2 K3): concurrent/static-data reruns
  * no-op on a matching marker; a count or layout change rebuilds; the
  * publish is build-to-temp + atomic rename, so readers never see a
  * half-written index.
  */
object IvfIndex {
  private val Marker = "_INDEX_READY"
  private val LayoutVersion = "v1"

  /** Nearest-centroid assignment of `e` (vec_id, label, embedding)
    * against a centroid table (cent_id, cvec): the k×dim centroid set
    * collapses to a one-row array (aggregate → broadcast), then a
    * per-row struct-ordering argmax — one narrow projection, ties to
    * the smallest cent_id, zero extra exchanges. */
  def assignCells(e: DataFrame, cents: DataFrame): DataFrame = {
    val centsArr = cents.agg(
      collect_list(struct(col("cent_id"), col("cvec"))).as("cs"))
    val best = array_max(transform(col("cs"), c =>
      struct(
        cosine(col("embedding"), c.getField("cvec")).as("sim"),
        (-c.getField("cent_id")).as("nid"))))
    e.crossJoin(broadcast(centsArr))
      .withColumn("cent_id", -best.getField("nid"))
      .select(col("vec_id"), col("label"), col("embedding"), col("cent_id"))
  }

  /** Build the index at `path` unless a current one is already there
    * (marker matches layout version + corpus row count). */
  def buildIfAbsent(e: DataFrame, cents: DataFrame, path: String): Unit = {
    val spark = e.sparkSession
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val root = new Path(path)
    val marker = new Path(root, Marker)
    val stamp = s"$LayoutVersion,count=${e.count()}"
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val got = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                finally in.close()
      if (got == stamp) return
    }
    val tmp = new Path(path + ".build")
    fs.delete(tmp, true)
    cents.coalesce(1).write.mode("overwrite")
      .parquet(new Path(tmp, "centroids").toString)
    assignCells(e, cents).write.mode("overwrite").partitionBy("cent_id")
      .parquet(new Path(tmp, "cells").toString)
    val out = fs.create(new Path(tmp, Marker), true)
    try out.write(stamp.getBytes("UTF-8")) finally out.close()
    fs.delete(root, true)
    if (!fs.rename(tmp, root))
      throw new IllegalStateException(s"IvfIndex: rename $tmp -> $root failed")
  }

  /** Top-k cosine search against a prebuilt index: centroid read (tiny),
    * nprobe probe ids to the driver, partition-pruned cell scan, scored
    * `TakeOrderedAndProject` top-k. */
  def searchTopK(spark: SparkSession, path: String, queryVec: Seq[Double],
      nprobe: Int, k: Int): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids")
    val probeIds = cents
      .withColumn("qsim", cosine(col("cvec"), typedLit(queryVec)))
      .orderBy(desc("qsim"), col("cent_id"))
      .limit(nprobe)
      .select(col("cent_id")).collect().map(_.getLong(0))
    spark.read.parquet(s"$path/cells")
      .filter(col("cent_id").isin(probeIds: _*))
      .withColumn("score", cosine(col("embedding"), typedLit(queryVec)))
      .orderBy(desc("score"), col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"), round(col("score"), 6).as("score"))
  }
}
