package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level dense-vector primitives (SURVEY.md §2.6 V1–V3 + the ANN
  * scale path). Embeddings are `ArrayType(FloatType)` columns; all math is
  * double-precision with a fixed left-fold order so the DuckDB oracle
  * (list_zip/list_transform/list_reduce) reproduces results bit-exactly.
  *
  * Scale: dot/norm/cosine are narrow per-row expressions (no shuffle, no
  * UDF — higher-order functions are codegen-friendly in Spark 4). Top-k
  * by score compiles to TakeOrderedAndProject: each partition keeps a
  * k-heap and only k rows per partition reach the driver-side merge, so
  * brute-force kNN scales linearly with executors. The LSH/IVF variants
  * cut the scanned fraction for 100 TB corpora.
  */
object VectorOps {

  private def d(c: Column): Column = c.cast("double")

  /** Σ aᵢ·bᵢ, left fold from 0.0 — matches the oracle's list_reduce over
    * list_prepend(0.0, products). Executes as the codegen'd
    * [[graft.functions.DotPair]] fused loop (identical IEEE sequence to
    * the HOF fold below — VectorOpsSpec pins the bit-equality; the HOF
    * form stays as the declarative cross-check). */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dotp", a, b)

  /** The declarative HOF reference form of [[dot]] (interpreted lambdas —
    * cross-check only, not the execution path). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, v) => acc + v)

  /** Σ aᵢ² (same fold). */
  def norm2(a: Column): Column =
    call_function("graft_dotp", a, a)

  /** HOF reference form of [[norm2]]. */
  def norm2Hof(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + d(v) * d(v))

  /** Cosine similarity = dot / (√‖a‖² · √‖b‖²). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Dot of a vector column with a constant hyperplane (Seq of doubles
    * embedded as literals — the same literals the oracle SQL embeds). */
  def dotConst(a: Column, hp: Seq[Double]): Column =
    aggregate(
      zip_with(a, typedLit(hp), (x, w) => d(x) * w),
      lit(0.0), (acc, v) => acc + v)

  // ---------------------------------------------------------------- SQL
  // DuckDB mirrors. Products fold from a prepended 0.0 so the first IEEE
  // addition is 0.0 + p₁, identical to Spark's aggregate initial value.

  def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |  list_transform(list_zip($a, $b),
       |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
       |  (x, y) -> x + y)""".stripMargin

  def norm2Sql(a: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |  list_transform($a, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))),
       |  (x, y) -> x + y)""".stripMargin

  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)}) / (sqrt(${norm2Sql(a)}) * sqrt(${norm2Sql(b)}))"

  /** Double literal that DuckDB parses as DOUBLE (e-notation), bit-exact
    * round-trip of the Scala value. */
  def dl(v: Double): String = {
    val s = v.toString
    if (s.contains('e') || s.contains('E')) s else s + "e0"
  }

  def dotConstSql(a: String, hp: Seq[Double]): String =
    dotSql(a, hp.map(dl).mkString("[", ", ", "]"))

  /** Deterministic pseudo-random hyperplanes for sign-bit LSH: `n` planes
    * of dimension `dim`, components uniform in (-1, 1) from a fixed-seed
    * LCG (java.util.Random semantics are specified, so Spark literals and
    * oracle SQL literals are the same bits on any JVM).
    */
  def hyperplanes(n: Int, dim: Int, seed: Long = 7L): Seq[Seq[Double]] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(n)(Seq.fill(dim)(rnd.nextDouble() * 2.0 - 1.0))
  }

  /** Sign-bit LSH bucket id: bit k set iff v·hpₖ > 0. */
  def lshBucket(v: Column, hps: Seq[Seq[Double]]): Column =
    hps.zipWithIndex.map { case (hp, k) =>
      when(dotConst(v, hp) > 0.0, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** The per-row IVF cell assignment over a literal centroid set: argmax
    * of cosine similarity, ties to the smallest centroid id — one narrow
    * projection, zero exchanges (struct ordering does the argmax). */
  def nearestCentroid(v: Column, cents: Seq[Seq[Double]]): Column = {
    val packed = array(cents.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("cid"), typedLit(c).as("cvec"))
    }: _*)
    val best = array_max(transform(packed, c =>
      struct(cosine(v, c.getField("cvec")).as("sim"),
        (-c.getField("cid")).as("nid"))))
    -best.getField("nid")
  }

  /** Lloyd-refined IVF coarse quantizer (the index-BUILD step the
    * reference delegates to Qdrant, init_qdrant.py:38-58; k-means-refined
    * centroids are standard IVF practice — cells get balanced, probe
    * recall rises vs sampled centroids).
    *
    * Scale shape per iteration: cell assignment is the narrow
    * [[nearestCentroid]] projection; the update is ONE partial-aggregated
    * `groupBy(cell)` with per-dimension decimal-exact means (order
    * independent ⇒ deterministic for any partitioning); the k×dim result
    * (a few KB) collects to the driver — the only driver-side state is
    * the index itself, never data. Empty cells keep their previous
    * centroid.
    */
  def kmeansCentroids(
      e: org.apache.spark.sql.DataFrame,
      vecCol: String,
      init: Seq[Seq[Double]],
      iters: Int): Seq[Seq[Double]] = {
    val dim = init.head.length
    var cents = init
    for (_ <- 0 until iters) {
      val cell = nearestCentroid(col(vecCol), cents)
      val dims = (0 until dim).map { dIdx =>
        (sum(element_at(col(vecCol), dIdx + 1).cast("decimal(28,12)")) /
          count(lit(1))).cast("double").as(s"m$dIdx")
      }
      val updated = e.withColumn("__cell", cell)
        .groupBy("__cell")
        .agg(dims.head, dims.tail: _*)
        .collect()
        .map(r => r.getInt(0) -> (1 to dim).map(r.getDouble).toSeq)
        .toMap
      cents = cents.indices.map(i => updated.getOrElse(i, cents(i)))
    }
    cents
  }

  /** DataFrame-native Lloyd refinement (VERDICT r6 next #7): same
    * per-iteration math as [[kmeansCentroids]] — broadcast-argmax cell
    * assignment, ONE partial-aggregated groupBy update with
    * decimal-exact per-dimension means (order-independent ⇒ identical
    * centroids for any partitioning), empty cells keep their previous
    * centroid — but the centroid set stays a DataFrame of
    * (cent_id INT, cvec ARRAY&lt;DOUBLE&gt;) END TO END. Nothing k-sized is
    * ever collected to the driver: at the ivfK clamp max (65536 × 768-d
    * doubles ≈ 400 MB) the literal-seeded form's init collect is a
    * driver-heap spike; here seeds, assignment and updates all stay on
    * executors, with a localCheckpoint per iteration to cut lineage.
    * The argmax over `collect_list`'s struct array is order-independent
    * (max by (sim, −cent_id)), so the unordered list is safe.
    * KmeansSpec asserts row-parity with the literal-seeded form. */
  def kmeansCentroidsDf(
      e: org.apache.spark.sql.DataFrame,
      vecCol: String,
      cents0: org.apache.spark.sql.DataFrame,
      iters: Int,
      dim: Int,
      assignParts: Int = 0): org.apache.spark.sql.DataFrame = {
    var cents = cents0.select(col("cent_id").cast("int").as("cent_id"),
      transform(col("cvec"), x => x.cast("double")).as("cvec"))
    // assignment-stage parallelism derives from the WORK (rows × k dot
    // folds), not the scan's byte-sized splits: a tiny corpus with a
    // compute-dense argmax otherwise runs the whole Lloyd assignment on
    // the scan's one split (q_v6d measured 0.79 s single-task, r19).
    // 0 (default) keeps the caller's partitioning — data-scale corpora
    // already scan wide.
    val e2 = if (assignParts > 0) e.repartition(assignParts) else e
    for (_ <- 0 until iters) {
      // norms staged once per side (r19, guide §4): cosine(v, c) re-ran
      // the norm2 folds per (row, centroid) pair inside the interpreted
      // HOF lambda — 3 dot folds per pair. The staged forms fold the
      // SAME doubles in the SAME order (graft_dotp both ways), so every
      // cosine is bit-identical; KmeansSpec's literal-vs-DF parity and
      // the q_v6d hash oracle pin it.
      val centsArr = cents.agg(
        collect_list(struct(col("cent_id"), col("cvec"),
          norm2(col("cvec")).as("cn2"))).as("cs"))
      val best = array_max(transform(col("cs"), c =>
        struct((dot(col(vecCol), c.getField("cvec")) /
            (sqrt(col("__vn2")) * sqrt(c.getField("cn2")))).as("sim"),
          (-c.getField("cent_id")).as("nid"))))
      val dims = (0 until dim).map { dIdx =>
        (sum(element_at(col(vecCol), dIdx + 1).cast("decimal(28,12)")) /
          count(lit(1))).cast("double").as(s"m$dIdx")
      }
      val updated = e2.withColumn("__vn2", norm2(col(vecCol)))
        .crossJoin(broadcast(centsArr))
        .withColumn("__cell", -best.getField("nid"))
        .groupBy("__cell")
        .agg(dims.head, dims.tail: _*)
        .select(col("__cell").as("cent_id"),
          array((0 until dim).map(d => col(s"m$d")): _*).as("uvec"))
      cents = cents.join(updated, Seq("cent_id"), "left")
        .select(col("cent_id"),
          coalesce(col("uvec"), col("cvec")).as("cvec"))
        .localCheckpoint()
    }
    cents
  }

  /** Σ (aᵢ−bᵢ)², left fold from 0.0 in ascending element order — the
    * squared Euclidean distance PQ encoding minimizes
    * ([[graft.functions.PqEncode]] accumulates diff² in exactly this
    * order, so L2-assigned k-means codebooks and the encoder agree on
    * every tie). */
  def l2dist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0), (acc, v) => acc + v)

  /** DataFrame-native Lloyd refinement under SQUARED-EUCLIDEAN
    * assignment — the k-means that trains PQ codebooks (VERDICT r7 next
    * #1): [[kmeansCentroidsDf]] assigns by cosine (the IVF coarse
    * quantizer's metric), but PQ encodes residuals by L2 argmin
    * ([[graft.functions.PqEncode]]), and codebooks must be trained under
    * the metric they serve. Same scale shape as the cosine form: the
    * centroid set stays a DataFrame end to end, assignment is a
    * broadcast-argmin narrow projection (ties → smallest cent_id, via
    * max over (−dist, −cent_id) structs), the update is ONE
    * partial-aggregated groupBy with decimal-exact per-dimension means
    * (order-independent ⇒ identical centroids for any partitioning; the
    * mean is the exact L2 Lloyd update), empty cells keep their previous
    * centroid, and a localCheckpoint per iteration cuts lineage.
    * Nothing k-sized collects to the driver. KmeansSpec pins bit-parity
    * with a literal driver-side reference. */
  def kmeansCentroidsL2Df(
      e: org.apache.spark.sql.DataFrame,
      vecCol: String,
      cents0: org.apache.spark.sql.DataFrame,
      iters: Int,
      dim: Int): org.apache.spark.sql.DataFrame = {
    var cents = cents0.select(col("cent_id").cast("int").as("cent_id"),
      transform(col("cvec"), x => x.cast("double")).as("cvec"))
    for (_ <- 0 until iters) {
      val centsArr = cents.agg(
        collect_list(struct(col("cent_id"), col("cvec"))).as("cs"))
      val best = array_max(transform(col("cs"), c =>
        struct((-l2dist(col(vecCol), c.getField("cvec"))).as("negd"),
          (-c.getField("cent_id")).as("nid"))))
      val dims = (0 until dim).map { dIdx =>
        (sum(element_at(col(vecCol), dIdx + 1).cast("decimal(28,12)")) /
          count(lit(1))).cast("double").as(s"m$dIdx")
      }
      val updated = e.crossJoin(broadcast(centsArr))
        .withColumn("__cell", -best.getField("nid"))
        .groupBy("__cell")
        .agg(dims.head, dims.tail: _*)
        .select(col("__cell").as("cent_id"),
          array((0 until dim).map(d => col(s"m$d")): _*).as("uvec"))
      cents = cents.join(updated, Seq("cent_id"), "left")
        .select(col("cent_id"),
          coalesce(col("uvec"), col("cvec")).as("cvec"))
        .localCheckpoint()
    }
    cents
  }

  /** Grouped form of [[kmeansCentroidsL2Df]]: trains MANY independent
    * k-means problems (key column `s`) inside the SAME Lloyd jobs — the
    * trained-PQ build runs its PqS per-subspace refinements as one
    * assignment + one update per iteration instead of PqS sequential
    * chains of them (8x fewer Spark jobs; at sf0.01 the q_v12 build was
    * the sweep's 43 s slowest query, almost all of it fixed per-job
    * overhead). Bit-identical centroids per subspace: each (s, cell)'s
    * broadcast-argmin (ties → smallest cent_id) and decimal-exact mean
    * see exactly the rows the per-subspace form sees, and both folds
    * are order-independent. `e` carries (s, vecCol); `cents0` carries
    * (s, cent_id, cvec). */
  def kmeansCentroidsL2GroupedDf(
      e: org.apache.spark.sql.DataFrame,
      vecCol: String,
      cents0: org.apache.spark.sql.DataFrame,
      iters: Int,
      dim: Int): org.apache.spark.sql.DataFrame = {
    var cents = cents0.select(col("s").cast("int").as("s"),
      col("cent_id").cast("int").as("cent_id"),
      transform(col("cvec"), x => x.cast("double")).as("cvec"))
    for (_ <- 0 until iters) {
      val centsBys = cents.groupBy("s").agg(
        collect_list(struct(col("cent_id"), col("cvec"))).as("cs"))
      val best = array_max(transform(col("cs"), c =>
        struct((-l2dist(col(vecCol), c.getField("cvec"))).as("negd"),
          (-c.getField("cent_id")).as("nid"))))
      val dims = (0 until dim).map { dIdx =>
        (sum(element_at(col(vecCol), dIdx + 1).cast("decimal(28,12)")) /
          count(lit(1))).cast("double").as(s"m$dIdx")
      }
      val updated = e.join(broadcast(centsBys), Seq("s"))
        .withColumn("__cell", -best.getField("nid"))
        .groupBy(col("s"), col("__cell"))
        .agg(dims.head, dims.tail: _*)
        .select(col("s"), col("__cell").as("cent_id"),
          array((0 until dim).map(d => col(s"m$d")): _*).as("uvec"))
      cents = cents.join(updated, Seq("s", "cent_id"), "left")
        .select(col("s"), col("cent_id"),
          coalesce(col("uvec"), col("cvec")).as("cvec"))
        .localCheckpoint()
    }
    cents
  }

  /** Literal-centroid form of [[kmeansCentroidsL2GroupedDf]] for
    * CONSTANT-size centroid sets: per iteration the codebook rides into
    * the assignment as a literal 3-d array (indexed by the group key
    * `s`) and only the k-sized update (PqS×PqK×d doubles — for PQ
    * codebooks a fixed ~8 KB, independent of corpus AND of the ivfK
    * clamp) collects back to the driver. Rationale: the DF-native form
    * pays ~8 scheduler/AQE job cycles per iteration (broadcast of the
    * centroid list, update exchange, join-back, localCheckpoint) which
    * dominated the trained-PQ build on small corpora (the q_v12 cold
    * sweep row, r18); this form runs ONE action per iteration. It is
    * NOT for IVF coarse centroids, whose k×dim can reach ~400 MB — PQ
    * codebooks are constant-sized by construction, the same class of
    * driver state as the codebook literals the encoder already embeds.
    *
    * Bit-parity with [[kmeansCentroidsL2GroupedDf]] (IvfPqTrainedSpec's
    * "literal-centroid grouped Lloyd equals the DF-native grouped form
    * bit-for-bit"): the
    * assignment folds the SAME l2dist left fold over the same doubles
    * (argmin ties → smallest cent_id via max over (−dist, −id); the
    * literal array is ordered by cent_id, and `transform`'s index IS
    * the cent_id), the update is the same decimal-exact per-dimension
    * mean (order-independent), and empty cells keep their previous
    * entry. `e` carries (s, vecCol); `cb0(s)(j)` is the init. */
  def kmeansCentroidsL2GroupedLit(
      e: org.apache.spark.sql.DataFrame,
      vecCol: String,
      cb0: Array[Array[Array[Double]]],
      iters: Int,
      dim: Int): Array[Array[Array[Double]]] = {
    val nS = cb0.length
    val nK = cb0.head.length
    var cb = cb0
    for (_ <- 0 until iters) {
      val lit3d = typedLit(cb.map(_.map(_.toSeq).toSeq).toSeq)
      val cbs = element_at(lit3d, col("s") + 1)
      val best = array_max(transform(cbs, (c, i) =>
        struct((-l2dist(col(vecCol), c)).as("negd"), (-i).as("nid"))))
      val dims = (0 until dim).map { dIdx =>
        (sum(element_at(col(vecCol), dIdx + 1).cast("decimal(28,12)")) /
          count(lit(1))).cast("double").as(s"m$dIdx")
      }
      val updated = e
        .withColumn("__cell", -best.getField("nid"))
        .groupBy(col("s"), col("__cell"))
        .agg(dims.head, dims.tail: _*)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          (2 until 2 + dim).map(r.getDouble).toArray)
        .toMap
      cb = Array.tabulate(nS, nK)((s0, j) =>
        updated.getOrElse((s0, j), cb(s0)(j)))
    }
    cb
  }

  /** Grouped form of [[kmeansCentroidsDf]] (COSINE assignment — the IVF
    * coarse quantizer's metric): trains MANY independent cosine k-means
    * problems (key column `s`) inside the same Lloyd jobs, the way
    * [[kmeansCentroidsL2GroupedDf]] does for the PQ trainer —
    * [[IvfIndex.rebalance]] refines every oversized cell's 2-split in
    * ONE assignment + ONE update per iteration instead of a sequential
    * chain per cell. Per-(s, cell) math is identical to the ungrouped
    * form: broadcast-argmax by (sim, −cent_id) so ties go to the
    * smallest cent_id, decimal-exact per-dimension means
    * (order-independent ⇒ deterministic for any partitioning), empty
    * cells keep their previous centroid, localCheckpoint per iteration.
    * `e` carries (s, vecCol); `cents0` carries (s, cent_id, cvec). */
  def kmeansCentroidsGroupedDf(
      e: org.apache.spark.sql.DataFrame,
      vecCol: String,
      cents0: org.apache.spark.sql.DataFrame,
      iters: Int,
      dim: Int): org.apache.spark.sql.DataFrame = {
    var cents = cents0.select(col("s").cast("int").as("s"),
      col("cent_id").cast("int").as("cent_id"),
      transform(col("cvec"), x => x.cast("double")).as("cvec"))
    for (_ <- 0 until iters) {
      // norms staged once per side — same bit-identical-cosine argument
      // as [[kmeansCentroidsDf]] (r19, guide §4)
      val centsBys = cents.groupBy("s").agg(
        collect_list(struct(col("cent_id"), col("cvec"),
          norm2(col("cvec")).as("cn2"))).as("cs"))
      val best = array_max(transform(col("cs"), c =>
        struct((dot(col(vecCol), c.getField("cvec")) /
            (sqrt(col("__vn2")) * sqrt(c.getField("cn2")))).as("sim"),
          (-c.getField("cent_id")).as("nid"))))
      val dims = (0 until dim).map { dIdx =>
        (sum(element_at(col(vecCol), dIdx + 1).cast("decimal(28,12)")) /
          count(lit(1))).cast("double").as(s"m$dIdx")
      }
      val updated = e.withColumn("__vn2", norm2(col(vecCol)))
        .join(broadcast(centsBys), Seq("s"))
        .withColumn("__cell", -best.getField("nid"))
        .groupBy(col("s"), col("__cell"))
        .agg(dims.head, dims.tail: _*)
        .select(col("s"), col("__cell").as("cent_id"),
          array((0 until dim).map(d => col(s"m$d")): _*).as("uvec"))
      cents = cents.join(updated, Seq("s", "cent_id"), "left")
        .select(col("s"), col("cent_id"),
          coalesce(col("uvec"), col("cvec")).as("cvec"))
        .localCheckpoint()
    }
    cents
  }

  def lshBucketSql(v: String, hps: Seq[Seq[Double]]): String =
    hps.zipWithIndex.map { case (hp, k) =>
      s"(CASE WHEN (${dotConstSql(v, hp)}) > 0.0 THEN ${1L << k} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
