package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GraphAnn, IvfIndex, NswIndex, VectorOps}
import graft.operators.GraphAnn.Params

/** Contract of the int8-quantized persisted graph payloads (r10 —
  * VERDICT r9 next #4; the reference's serving config is HNSW plus int8
  * scalar quantization always-RAM, init_qdrant.py:51-57) and of the
  * small-collection full-scan guard (init_qdrant.py:47) in both index
  * serve paths.
  *
  * Parity story: quantization happens BEFORE graph construction, so the
  * quantized index is EXACTLY the raw pipeline run over the dequantized
  * corpus — serve parity against that corpus is bit-exact, not
  * approximate; only the delta vs a raw-payload index is quantization
  * error, bounded here by recall overlap.
  */
class NswQuantSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)

  private val dim = 16
  private val n = 3000
  private def corpus(upTo: Long): DataFrame = {
    def centerCol(d: Int) =
      sin((col("id") % 20).cast("double") * (2.17 + d) + lit(d * 0.91))
    spark.range(upTo).select(
      col("id").as("vec_id"),
      array((0 until dim).map(d =>
        centerCol(d) + sin(col("id").cast("double") * (5.3 + d)) * 0.15): _*)
        .as("embedding"))
  }

  /** The exact q_v7 quantize→dequantize round trip, in-plan — what the
    * quantized index stores and serves. */
  private def dequantCorpus(e: DataFrame): DataFrame = {
    val emb = transform(col("embedding"), x => x.cast("double"))
    val absmax = aggregate(emb, lit(0.0), (a, v) => greatest(a, abs(v)))
    val scale = when(absmax > 0.0, absmax / 127.0).otherwise(1.0)
    e.select(col("vec_id"),
      transform(emb, v => round(v / scale, 0).cast("tinyint").cast("double") * scale)
        .as("embedding"))
  }

  private val query: Seq[Double] = (0 until dim).map(d =>
    math.sin(7.0 * (2.17 + d) + d * 0.91)).toSeq

  private def freshPath(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_nswq_$tag").toString
    new java.io.File(p).delete()
    p
  }

  private def topIds(df: DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("quantized layout stores int8+scale, marker carries qv=1, bytes shrink >2x") {
    val raw = freshPath("raw")
    val qp = freshPath("quant")
    val lp = Params(layered = true)
    NswIndex.buildIfAbsent(corpus(n), "vec_id", "embedding", raw, lp, numShards = 4)
    NswIndex.buildIfAbsent(corpus(n), "vec_id", "embedding", qp, lp, numShards = 4,
      quantize = true)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(qp, "_GRAPH_READY"))
    val marker = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    assert(marker.contains(",qv=1,"), s"marker '$marker' lacks qv=1")
    val cols = spark.read.parquet(s"$qp/graph").columns.toSet
    assert(cols.contains("q") && cols.contains("scale") && !cols.contains("v"))
    val qRows = spark.read.parquet(s"$qp/graph")
      .select(col("q"), col("scale")).collect()
    qRows.foreach { r =>
      assert(r.getDouble(1) > 0.0)
      r.getSeq[Byte](0).foreach(b => assert(b >= -127 && b <= 127))
    }
    val rawBytes = NswIndex.graphBytes(spark, raw)
    val qBytes = NswIndex.graphBytes(spark, qp)
    assert(qBytes * 2 < rawBytes,
      s"quantized graph $qBytes B should be well under half of raw $rawBytes B")
  }

  test("quantized serve is bit-exact vs the in-memory walk over the dequantized corpus") {
    for (layered <- Seq(false, true)) {
      val qp = freshPath(s"parity$layered")
      val p = Params(layered = layered)
      NswIndex.buildIfAbsent(corpus(n), "vec_id", "embedding", qp, p,
        numShards = 4, quantize = true)
      val served = topIds(NswIndex.searchTopK(spark, qp, query, k = 5))
      val expected = topIds(GraphAnn.searchTopK(
        dequantCorpus(corpus(n)), "vec_id", "embedding", query, k = 5, p,
        numShards = 4))
      assert(served == expected,
        s"layered=$layered: quantized serve diverges from the dequantized rebuild")
    }
  }

  test("quantization error is bounded: quantized top-10 overlaps raw top-10") {
    val raw = freshPath("rawr")
    val qp = freshPath("qr")
    val lp = Params(layered = true)
    NswIndex.buildIfAbsent(corpus(n), "vec_id", "embedding", raw, lp, numShards = 4)
    NswIndex.buildIfAbsent(corpus(n), "vec_id", "embedding", qp, lp, numShards = 4,
      quantize = true)
    val rawIds = topIds(NswIndex.searchTopK(spark, raw, query, k = 10)).map(_._1).toSet
    val qIds = topIds(NswIndex.searchTopK(spark, qp, query, k = 10)).map(_._1).toSet
    val overlap = (rawIds & qIds).size / 10.0
    assert(overlap >= 0.7, f"int8 recall vs raw $overlap%.2f < 0.7")
  }

  test("ascending-id append to a quantized index equals a full quantized rebuild") {
    val grown = freshPath("append")
    val lp = Params(layered = true)
    NswIndex.buildIfAbsent(corpus(n - 300), "vec_id", "embedding", grown, lp,
      numShards = 4, quantize = true)
    NswIndex.append(corpus(n).filter(col("vec_id") >= n - 300),
      "vec_id", "embedding", grown)
    val full = freshPath("full")
    NswIndex.buildIfAbsent(corpus(n), "vec_id", "embedding", full, lp,
      numShards = 4, quantize = true)
    val g = spark.read.parquet(s"$grown/graph")
      .select(col("shard").cast("int"), col("vec_id"), col("q"), col("scale"),
        col("nbrs"), col("lvl"), col("unbrs"))
      .collect().map(_.toString).sorted
    val f = spark.read.parquet(s"$full/graph")
      .select(col("shard").cast("int"), col("vec_id"), col("q"), col("scale"),
        col("nbrs"), col("lvl"), col("unbrs"))
      .collect().map(_.toString).sorted
    assert(g.sameElements(f), "appended quantized graph != full rebuild")
  }

  test("NSW full-scan fallback: tiny collections serve exact brute-force results") {
    val tiny = freshPath("tiny")
    NswIndex.buildIfAbsent(corpus(50), "vec_id", "embedding", tiny,
      Params(layered = true), numShards = 2)
    val served = topIds(NswIndex.searchTopK(spark, tiny, query, k = 5))
    val exact = topIds(corpus(50)
      .select(col("vec_id"),
        VectorOps.cosine(col("embedding"), typedLit(query)).as("score"))
      .orderBy(desc("score"), col("vec_id")).limit(5))
    assert(served == exact, "full-scan fallback must be the exact top-k")
  }

  test("IVF full-scan fallback: tiny collections serve exact brute-force results") {
    val tiny = freshPath("ivftiny")
    val e = corpus(50).select(col("vec_id"), lit("x").as("label"), col("embedding"))
    val cents = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    IvfIndex.buildIfAbsent(e, cents, tiny)
    // nprobe=1 would miss most cells without the guard
    val served = IvfIndex.searchTopK(spark, tiny, query, nprobe = 1, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val exact = e
      .select(col("vec_id"),
        round(VectorOps.cosine(col("embedding"), typedLit(query)), 6).as("score"))
      .orderBy(desc("score"), col("vec_id")).limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served == exact, "IVF full-scan fallback must be the exact top-k")
  }

  test("resident graphs invalidate on delete+rebuild with a same-count corpus") {
    // a rebuild with the SAME row count (and params) reproduces the same
    // graph stamp, so residency keyed on the stamp alone would silently
    // serve the OLD build's graphs — undetectable when the corpus is
    // identical, wrong when only the vectors changed. The marker-mtime
    // version key must route the second search to the fresh build.
    val path = freshPath("rebuild")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val lp = Params(layered = true)
    NswIndex.buildIfAbsent(corpus(n), "vec_id", "embedding", path, lp,
      numShards = 4)
    NswIndex.searchTopK(spark, path, query, k = 5).collect() // make resident
    // same count, shifted vectors: ids keep their values + 0.25 phase
    val corpus2 = corpus(n).select(col("vec_id"),
      transform(col("embedding"), v => v + lit(0.25)).as("embedding"))
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    NswIndex.buildIfAbsent(corpus2, "vec_id", "embedding", path, lp,
      numShards = 4)
    val served = topIds(NswIndex.searchTopK(spark, path, query, k = 5))
    // cold truth: the same second corpus built at a NEVER-SERVED path
    val cold = freshPath("rebuild_cold")
    NswIndex.buildIfAbsent(corpus2, "vec_id", "embedding", cold, lp,
      numShards = 4)
    val expect = topIds(NswIndex.searchTopK(spark, cold, query, k = 5))
    assert(served == expect,
      "post-rebuild serve must walk the fresh graphs, not resident state")
  }
}
