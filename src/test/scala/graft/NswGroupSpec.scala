package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.NswIndex
import graft.operators.GraphAnn.Params

/** Contract of the GROUP-STREAMED build (`buildGroupShards`, r14): shard
  * graphs are built independently, so writing them one bounded group at
  * a time — the knob that fits a 2M × 768-d build through a fixed-size
  * heap (VERDICT r13 next #4) — must produce the SAME index: same graph
  * rows, same shard= partition dirs, same marker stamp, and therefore
  * the same served answers. Grouping is a write schedule, not a layout.
  */
class NswGroupSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)

  private val dim = 12
  private def corpus(n: Long) = spark.range(n).select(
    col("id").as("vec_id"),
    array((0 until dim).map(d =>
      sin((col("id") + 1).cast("double") * (d * 7 + 3) * 1e-3)): _*)
      .as("embedding"))

  private val query: Seq[Double] =
    (0 until dim).map(d => math.sin(501.0 * (d * 7 + 3) * 1e-3)).toSeq

  private def freshPath(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_nswg_$tag").toString
    new java.io.File(p).delete()
    p
  }

  private def graphRows(path: String): Set[String] =
    spark.read.parquet(s"$path/graph")
      .select(col("shard"), col("vec_id"),
        to_json(struct(col("*"))).as("js"))
      .collect().map(_.getString(2)).toSet

  test("grouped build produces byte-identical graph rows to the single-pass build") {
    val e = corpus(2000)
    val full = freshPath("full")
    val grouped = freshPath("grp")
    NswIndex.buildIfAbsent(e, "vec_id", "embedding", full,
      Params(layered = true), numShards = 8)
    NswIndex.buildIfAbsent(e, "vec_id", "embedding", grouped,
      Params(layered = true), numShards = 8, buildGroupShards = 3)
    assert(graphRows(full) == graphRows(grouped),
      "group-streamed build must emit the same rows as the single-pass build")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def marker(p: String): String = {
      val in = fs.open(new org.apache.hadoop.fs.Path(p, "_GRAPH_READY"))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    assert(marker(full) == marker(grouped),
      "grouping is stamp-invariant: a grouped build must read as the same index")
  }

  test("grouped quantized build serves the exact rows of the single-pass quantized build") {
    val e = corpus(1500)
    val full = freshPath("qfull")
    val grouped = freshPath("qgrp")
    NswIndex.buildIfAbsent(e, "vec_id", "embedding", full,
      Params(layered = true), numShards = 6, quantize = true)
    NswIndex.buildIfAbsent(e, "vec_id", "embedding", grouped,
      Params(layered = true), numShards = 6, quantize = true,
      buildGroupShards = 2)
    def serve(p: String) = NswIndex.searchTopK(spark, p, query, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(serve(full) == serve(grouped))
    assert(graphRows(full) == graphRows(grouped))
  }

  test("every shard dir lands exactly once across groups (no loss, no dup)") {
    val e = corpus(1200)
    val path = freshPath("cover")
    NswIndex.buildIfAbsent(e, "vec_id", "embedding", path,
      Params(layered = true), numShards = 5, buildGroupShards = 2)
    val g = spark.read.parquet(s"$path/graph")
    assert(g.select("shard").distinct().count() == 5)
    assert(g.count() == 1200, "each vector appears exactly once")
    assert(g.select("vec_id").distinct().count() == 1200)
  }
}
