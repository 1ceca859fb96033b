package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndex, VectorOps}
import graft.queries.VectorQueries

/** Contract for the TRAINED-codebook IVFADC path (VERDICT r7 next #1/#2;
  * rows-only q_v12 family — Lloyd iterations have no tractable SQL
  * mirror, so this spec carries the parity/determinism story the oracle
  * carries elsewhere, the NSW-family pattern).
  */
class IvfPqTrainedSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)

  private val n = 500L
  private def corpus: DataFrame =
    VectorQueries.clusteredCorpus(spark, n)
  private def cents(e: DataFrame, k: Int): DataFrame =
    e.filter(col("vec_id") < k)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))

  private def freshPath(tag: String): String = {
    val p = java.nio.file.Files
      .createTempDirectory(s"graft_pqt_$tag").toString
    new java.io.File(p).delete()
    p
  }

  private def queryPoints(e: DataFrame): Seq[(Long, Seq[Double])] =
    e.filter(col("vec_id") < 8)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toSeq
      .sortBy(_._1)

  /** Mean over the 8 query points of |ADC top-5 ∩ exact top-5| / 5. */
  private def adcRecall(e: DataFrame, path: String, nprobe: Int,
      shortlist: Option[Int] = None): Double = {
    val recalls = queryPoints(e).map { case (qid, qv) =>
      val exact = e
        .filter(col("vec_id") =!= qid)
        .withColumn("s", VectorOps.cosine(col("embedding"), typedLit(qv)))
        .orderBy(desc("s"), col("vec_id")).limit(5)
        .collect().map(_.getLong(0)).toSet
      val scored = IvfIndex.searchScoredPq(spark, path, qv, nprobe)
        .filter(col("vec_id") =!= qid)
      val ann = shortlist match {
        case None =>
          scored.orderBy(desc("score"), col("vec_id")).limit(5)
            .collect().map(_.getLong(0)).toSet
        case Some(l) =>
          // the q_v12c serving shape: ADC top-L shortlist, exact rerank
          val short = scored.orderBy(desc("score"), col("vec_id")).limit(l)
            .select(col("vec_id"))
          short.join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
            .withColumn("s", VectorOps.cosine(col("embedding"), typedLit(qv)))
            .orderBy(desc("s"), col("vec_id")).limit(5)
            .collect().map(_.getLong(0)).toSet
      }
      (exact & ann).size / 5.0
    }
    recalls.sum / recalls.size
  }

  test("L2 Lloyd refinement is deterministic across partitionings and moves centroids") {
    val e = corpus.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("emb"))
    val dim = VectorQueries.Dim
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cent_id"), col("emb").as("cvec"))
    def run(in: DataFrame): Seq[Seq[Double]] =
      VectorOps.kmeansCentroidsL2Df(in, "emb", seeds, iters = 2, dim = dim)
        .collect().map(r => r.getInt(0) ->
          r.getAs[scala.collection.Seq[Double]](1).toSeq)
        .sortBy(_._1).map(_._2).toSeq
    val a = run(e)
    val b = run(e.repartition(7))
    assert(a == b, "decimal-exact means must be partitioning-independent")
    val init = seeds.orderBy("cent_id").collect()
      .map(_.getAs[scala.collection.Seq[Double]]("cvec").toSeq).toSeq
    assert(a != init, "2 L2 Lloyd iterations must move sampled centroids")
    assert(a.size == 8 && a.forall(_.length == dim))
  }

  test("L2 assignment step matches a literal driver-side argmin (fold order + ties)") {
    val e = corpus.limit(64).select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("emb"))
    val rows = e.collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Double]](1).toArray)
      .sortBy(_._1)
    val centsArr = rows.take(4).map(_._2)
    // literal reference: left-fold diff² ascending, first (smallest id) min
    def assignRef(v: Array[Double]): Int = {
      var best = 0; var bestD = Double.PositiveInfinity
      for (c <- centsArr.indices) {
        var d = 0.0; var i = 0
        while (i < v.length) {
          val x = v(i) - centsArr(c)(i); d += x * x; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
      }
      best
    }
    val seeds = (0 until 4).map(j => (j, centsArr(j).toSeq)).toSeq
    import spark.implicits._
    val seedsDf = seeds.toDF("cent_id", "cvec")
    val centsCol = seedsDf.agg(
      collect_list(struct(col("cent_id"), col("cvec"))).as("cs"))
    val best = array_max(transform(col("cs"), c =>
      struct((-VectorOps.l2dist(col("emb"), c.getField("cvec"))).as("negd"),
        (-c.getField("cent_id")).as("nid"))))
    val sparkSide = e.crossJoin(broadcast(centsCol))
      .select(col("vec_id"), (-best.getField("nid")).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { case (id, v) =>
      assert(sparkSide(id) == assignRef(v), s"assignment diverges at vec_id=$id")
    }
  }

  test("trained codebooks lift ADC-only recall over donors on the clustered corpus") {
    val e = corpus
    val k = 16
    val np = 2
    val donorPath = freshPath("donor")
    val trainedPath = freshPath("trained")
    IvfIndex.buildPqIfAbsent(e, cents(e, k), donorPath, trainIters = 0)
    IvfIndex.buildPqIfAbsent(e, cents(e, k), trainedPath)
    val donorR = adcRecall(e, donorPath, np)
    val trainedR = adcRecall(e, trainedPath, np)
    info(f"ADC-only recall: donor=$donorR%.3f trained=$trainedR%.3f")
    assert(trainedR > donorR,
      "training must beat raw donors on a manifold-bearing corpus")
    assert(trainedR >= 0.5,
      f"trained ADC-only recall $trainedR%.3f below the 0.5 target")
  }

  test("constant-L shortlist + exact rerank reaches >= 0.9 recall (the q_v12c serving shape)") {
    val e = corpus
    val k = 16
    val np = 2
    val l = VectorQueries.RerankMult * 5 * np
    val path = freshPath("rerank")
    IvfIndex.buildPqIfAbsent(e, cents(e, k), path)
    val r = adcRecall(e, path, np, shortlist = Some(l))
    info(f"constant-L ($l) rerank recall=$r%.3f")
    assert(r >= 0.9)
  }

  test("rebuild reproducibility: same corpus -> identical persisted codebooks") {
    val e = corpus
    val p1 = freshPath("repro1")
    val p2 = freshPath("repro2")
    IvfIndex.buildPqIfAbsent(e, cents(e, 16), p1)
    IvfIndex.buildPqIfAbsent(e.repartition(5), cents(e, 16), p2)
    def cb(p: String) = spark.read.parquet(s"$p/codebooks")
      .collect()
      .map(r => (r.getInt(r.fieldIndex("s")), r.getInt(r.fieldIndex("j"))) ->
        r.getSeq[Double](r.fieldIndex("remb")).toSeq)
      .sortBy(_._1).toSeq
    assert(cb(p1) == cb(p2),
      "trained codebooks must be bit-identical for any input partitioning")
  }

  test("grouped Lloyd equals the per-subspace form bit-for-bit") {
    // the r9 build-path optimization (all PqS subspaces refined in ONE
    // grouped chain) must be a pure job-count change: each (s, cell)
    // argmin and decimal-exact mean sees exactly the rows the
    // sequential per-subspace form sees, so centroids are identical.
    val dim = VectorQueries.Dim
    val half = dim / 2
    val e = corpus.limit(200).select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("emb"))
      .localCheckpoint()
    val seq2 = (0 until 2).map { s0 =>
      val sub = e.select(slice(col("emb"), s0 * half + 1, half).as("sub"))
      val init = e.filter(col("vec_id") < 4)
        .select(col("vec_id").cast("int").as("cent_id"),
          slice(col("emb"), s0 * half + 1, half).as("cvec"))
      VectorOps.kmeansCentroidsL2Df(sub, "sub", init, iters = 2, dim = half)
        .collect().map(r => (s0, r.getInt(0)) ->
          r.getSeq[Double](1).toSeq).toMap
    }.reduce(_ ++ _)
    val subRows = e.select(posexplode(array(
      slice(col("emb"), 1, half), slice(col("emb"), half + 1, half)))
      .as(Seq("s", "sub")))
    val initG = e.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("int").as("cent_id"), col("emb"))
      .select(explode(array(
        struct(lit(0).as("s"), col("cent_id"), slice(col("emb"), 1, half).as("cvec")),
        struct(lit(1).as("s"), col("cent_id"), slice(col("emb"), half + 1, half).as("cvec"))))
        .as("r"))
      .select(col("r.s"), col("r.cent_id"), col("r.cvec"))
    val grouped = VectorOps.kmeansCentroidsL2GroupedDf(
        subRows, "sub", initG, iters = 2, dim = half)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        r.getSeq[Double](2).toSeq).toMap
    assert(grouped == seq2,
      "grouped refinement must be bit-identical to the per-subspace chains")
  }

  test("literal-centroid grouped Lloyd equals the DF-native grouped form bit-for-bit") {
    // the r18 build-path optimization (codebook rides into the
    // assignment as a literal, only the fixed ~8 KB update collects per
    // iteration) must be a pure job-count change like the r9 one: same
    // l2dist folds, same argmin tie rule (transform's index IS the
    // cent_id), same decimal-exact means, same empty-cell retention.
    val dim = VectorQueries.Dim
    val half = dim / 2
    val e = corpus.limit(200).select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("emb"))
      .localCheckpoint()
    val subRows = e.select(posexplode(array(
      slice(col("emb"), 1, half), slice(col("emb"), half + 1, half)))
      .as(Seq("s", "sub")))
    val initG = e.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("int").as("cent_id"), col("emb"))
      .select(explode(array(
        struct(lit(0).as("s"), col("cent_id"), slice(col("emb"), 1, half).as("cvec")),
        struct(lit(1).as("s"), col("cent_id"), slice(col("emb"), half + 1, half).as("cvec"))))
        .as("r"))
      .select(col("r.s"), col("r.cent_id"), col("r.cvec"))
    val viaDf = VectorOps.kmeansCentroidsL2GroupedDf(
        subRows, "sub", initG, iters = 2, dim = half)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        r.getSeq[Double](2).toSeq).toMap
    val cb0 = e.filter(col("vec_id") < 4).orderBy("vec_id")
      .collect().map(_.getSeq[Double](1).toArray)
    val init3d = Array.tabulate(2, 4)((s0, j) =>
      cb0(j).slice(s0 * half, s0 * half + half))
    val viaLit = VectorOps.kmeansCentroidsL2GroupedLit(
      subRows, "sub", init3d, iters = 2, dim = half)
    val litMap = (for (s0 <- 0 until 2; j <- 0 until 4)
      yield (s0, j) -> viaLit(s0)(j).toSeq).toMap
    assert(litMap == viaDf,
      "literal-centroid refinement must be bit-identical to the DF form")
    // and partitioning-independence carries over
    val viaLit2 = VectorOps.kmeansCentroidsL2GroupedLit(
      subRows.repartition(7), "sub", init3d, iters = 2, dim = half)
    assert(viaLit2.flatten.map(_.toSeq).toSeq == viaLit.flatten.map(_.toSeq).toSeq)
  }

  test("append encodes against stored trained codebooks; marker keeps layout and ti") {
    val e = corpus
    val path = freshPath("append")
    val base = e.filter(col("vec_id") < n - 20)
    IvfIndex.buildPqIfAbsent(base, cents(e, 16), path)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def marker: String = {
      val in = fs.open(new org.apache.hadoop.fs.Path(path, "_INDEX_READY"))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val before = marker
    assert(before.startsWith("v4pqt,") && before.contains(",ti="))
    def cbSnapshot: Seq[((Int, Int), Seq[Double])] =
      spark.read.parquet(s"$path/codebooks").collect()
        .map(r => (r.getInt(r.fieldIndex("s")), r.getInt(r.fieldIndex("j"))) ->
          r.getSeq[Double](r.fieldIndex("remb")).toSeq)
        .sortBy(_._1).toSeq
    val cbBefore = cbSnapshot
    IvfIndex.append(e.filter(col("vec_id") >= n - 20), path)
    val after = marker
    assert(after.startsWith("v4pqt,") && after.contains(",ti="),
      "append must preserve the trained layout + ti field")
    assert(after.contains(s"count=$n"))
    // append must not retrain: the persisted codebooks are immutable, so
    // appended codes dequantize against exactly what searches look up
    assert(cbSnapshot == cbBefore, "append must leave stored codebooks untouched")
    // appended rows are servable THROUGH THE TRAINED SERVING SHAPE
    // (q_v12c: ADC shortlist of L = RerankMult·k·nprobe, exact rerank of
    // only those rows): a query AT an appended vector must return it as
    // the exact-cosine top hit. ADC-only top-5 is intentionally NOT the
    // bar — cluster siblings quantize to identical 8-byte codes, and the
    // (score DESC, vec_id) tie order can legitimately relegate a
    // late-appended id below same-code neighbors (measured rank 6 of 84
    // probed candidates, score-tied with ranks 4-5).
    val qv = e.filter(col("vec_id") === n - 1)
      .select(transform(col("embedding"), x => x.cast("double")))
      .head.getSeq[Double](0).toSeq
    val shortlistL = VectorQueries.RerankMult * 5 * 2
    val short = IvfIndex.searchScoredPq(spark, path, qv, nprobe = 2)
      .orderBy(desc("score"), col("vec_id")).limit(shortlistL)
      .select(col("vec_id"))
    val top = short
      .join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .withColumn("s", VectorOps.cosine(col("embedding"), typedLit(qv)))
      .orderBy(desc("s"), col("vec_id")).limit(5)
      .collect().map(_.getLong(0)).toSet
    assert(top.contains(n - 1),
      "appended vector must be findable by the ADC-shortlist + exact-rerank serving path")
  }
}
