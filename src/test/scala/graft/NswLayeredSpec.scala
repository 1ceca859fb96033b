package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GraphAnn, NswIndex}
import graft.operators.GraphAnn.Params

/** Contract of the PERSISTED layered-HNSW index (NswIndex layout v3 —
  * r9): the persisted graphs are identical to the in-memory layered
  * build, serving answers match the per-call rebuild path row for row,
  * ascending-id appends are bit-identical to a full rebuild of the
  * grown corpus, and flat v2 indexes coexist untouched.
  */
class NswLayeredSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)

  private val dim = 16
  private val n = 3000
  private def corpus(upTo: Long) = {
    def centerCol(d: Int) =
      sin((col("id") % 20).cast("double") * (2.17 + d) + lit(d * 0.91))
    spark.range(upTo).select(
      col("id").as("vec_id"),
      array((0 until dim).map(d =>
        centerCol(d) + sin(col("id").cast("double") * (5.3 + d)) * 0.15): _*)
        .as("embedding"))
  }

  private val layeredParams = Params(layered = true)
  private val query: Seq[Double] = (0 until dim).map(d =>
    math.sin(7.0 * (2.17 + d) + d * 0.91)).toSeq

  private def freshPath(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_nswl_$tag").toString
    new java.io.File(p).delete()
    p
  }

  test("persisted layered graphs serve the exact rows of the per-call rebuild") {
    val path = freshPath("serve")
    NswIndex.buildIfAbsent(corpus(n), "vec_id", "embedding", path,
      layeredParams, numShards = 4)
    val persisted = NswIndex.searchTopK(spark, path, query, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val rebuilt = GraphAnn.searchTopK(corpus(n), "vec_id", "embedding", query,
      k = 5, layeredParams, numShards = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(persisted == rebuilt,
      "persisted layered serving must equal the in-memory layered walk")
    assert(persisted.length == 5)
  }

  test("v3 marker carries the layered stamp and a flat index stays v2") {
    val path = freshPath("marker")
    NswIndex.buildIfAbsent(corpus(500), "vec_id", "embedding", path,
      layeredParams, numShards = 2)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def marker(p: String): String = {
      val in = fs.open(new org.apache.hadoop.fs.Path(p, "_GRAPH_READY"))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    // lay=2: the salted level rule (ADVICE r9) is build semantics — the
    // generation stamp proves pre-salt hierarchies read as stale
    assert(marker(path).startsWith("v3,") && marker(path).contains(",lay=2,"))
    val flat = freshPath("flat")
    NswIndex.buildIfAbsent(corpus(500), "vec_id", "embedding", flat,
      Params(), numShards = 2)
    assert(marker(flat).startsWith("v2,"))
    // layered rows persist the hierarchy columns; flat rows don't
    val lCols = spark.read.parquet(s"$path/graph").columns.toSet
    assert(lCols.contains("lvl") && lCols.contains("unbrs"))
    val fCols = spark.read.parquet(s"$flat/graph").columns.toSet
    assert(!fCols.contains("lvl") && !fCols.contains("unbrs"))
  }

  test("persisted hierarchy honors the geometric level law and degree caps") {
    // structural invariants of the v3 artifact, checked on disk: levels
    // follow the HNSW geometric rule (P(level >= 1) = 1/m, so the
    // level>=1 minority is ~n/m — the property that makes the upper
    // layers cheap), upper-layer degrees cap at m, layer-0 at 2m, and
    // every upper-layer neighbor is itself a node of that layer.
    val path = freshPath("law")
    NswIndex.buildIfAbsent(corpus(n), "vec_id", "embedding", path,
      layeredParams, numShards = 4)
    val rows = spark.read.parquet(s"$path/graph")
      .select(col("shard").cast("int"), col("vec_id"), col("nbrs"),
        col("lvl"), col("unbrs"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2),
        r.getInt(3), r.getSeq[scala.collection.Seq[Long]](4)))
    val m = layeredParams.m
    val upFrac = rows.count(_._4 >= 1).toDouble / rows.length
    assert(upFrac > 0.5 / m && upFrac < 2.0 / m,
      f"level>=1 fraction $upFrac%.4f should be ~1/$m")
    rows.foreach { case (_, id, nbrs, lvl, unbrs) =>
      assert(nbrs.length <= 2 * m, s"node $id layer-0 degree ${nbrs.length}")
      assert(unbrs.length == lvl, s"node $id carries ${unbrs.length} upper layers != lvl $lvl")
      unbrs.foreach(u => assert(u.length <= m, s"node $id upper degree ${u.length}"))
    }
    // upper-layer closure per shard: a layer-L neighbor must itself
    // have level >= L (links only exist between nodes of that layer)
    rows.groupBy(_._1).foreach { case (_, shardRows) =>
      val lvlOf = shardRows.map(r => r._2 -> r._4).toMap
      shardRows.foreach { case (_, id, _, _, unbrs) =>
        unbrs.zipWithIndex.foreach { case (u, li) =>
          u.foreach(nb => assert(lvlOf(nb) >= li + 1,
            s"node $id layer-${li + 1} neighbor $nb has level ${lvlOf(nb)}"))
        }
      }
    }
  }

  test("ascending-id append is bit-identical to a full layered rebuild") {
    val grown = freshPath("append")
    NswIndex.buildIfAbsent(corpus(n - 300), "vec_id", "embedding", grown,
      layeredParams, numShards = 4)
    NswIndex.append(corpus(n).filter(col("vec_id") >= n - 300),
      "vec_id", "embedding", grown)
    val full = freshPath("full")
    NswIndex.buildIfAbsent(corpus(n), "vec_id", "embedding", full,
      layeredParams, numShards = 4)
    def rows(p: String) = spark.read.parquet(s"$p/graph")
      .select(col("shard").cast("int"), col("vec_id"), col("nbrs"),
        col("lvl"), col("unbrs"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2).toSeq,
        r.getInt(3), r.getSeq[scala.collection.Seq[Long]](4).map(_.toSeq).toSeq))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(rows(grown) == rows(full),
      "append of ascending ids must reproduce the full layered build bit-for-bit")
    // marker count advanced; a rebuild over the grown corpus no-ops
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val mPath = new org.apache.hadoop.fs.Path(grown, "_GRAPH_READY")
    val before = fs.getFileStatus(mPath).getModificationTime
    NswIndex.buildIfAbsent(corpus(n), "vec_id", "embedding", grown,
      layeredParams, numShards = 4)
    assert(fs.getFileStatus(mPath).getModificationTime == before)
    // the appended index serves identically to the full build
    val a = NswIndex.searchTopK(spark, grown, query, k = 5).collect().toSeq
    val b = NswIndex.searchTopK(spark, full, query, k = 5).collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }

  test("append==rebuild parity holds at the reference degree (m=32)") {
    // m=32 is the reference's HNSW config (init_qdrant.py:45-50) and the
    // regime where layer-0 prune slots run past 31: the incremental
    // prune's verified flags were an Int bitmask through r12, whose
    // shifts silently wrap there — this pin locks the boolean-row form.
    // Append restores all-unverified rows (full dominance re-tests)
    // while rebuild prunes with memoized flags, so bit-parity between
    // the two IS the memoized==unmemoized cross-check at deg cap 65.
    val p32 = Params(m = 32, layered = true)
    val small = 1200
    val grown = freshPath("m32app")
    NswIndex.buildIfAbsent(corpus(small - 200), "vec_id", "embedding",
      grown, p32, numShards = 2)
    NswIndex.append(corpus(small).filter(col("vec_id") >= small - 200),
      "vec_id", "embedding", grown)
    val full = freshPath("m32full")
    NswIndex.buildIfAbsent(corpus(small), "vec_id", "embedding", full,
      p32, numShards = 2)
    def rows(p: String) = spark.read.parquet(s"$p/graph")
      .select(col("shard").cast("int"), col("vec_id"), col("nbrs"),
        col("lvl"), col("unbrs"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2).toSeq,
        r.getInt(3), r.getSeq[scala.collection.Seq[Long]](4).map(_.toSeq).toSeq))
      .sortBy(t => (t._1, t._2)).toSeq
    val g = rows(grown)
    assert(g == rows(full),
      "m=32 append must reproduce the full layered build bit-for-bit")
    // the regime is actually exercised: some node saturates the 2m cap
    assert(g.exists(_._3.length > 31),
      "corpus too sparse to drive layer-0 degrees past an Int bitmask")
  }
}
