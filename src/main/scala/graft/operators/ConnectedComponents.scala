package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the clustering
  * step that turns near-duplicate PAIRS (MinHash/LSH or embedding-band
  * output) into duplicate GROUPS with one canonical keeper per group.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) — the
  * standard shuffle-based CC that converges in O(log n) rounds and never
  * materializes adjacency lists:
  *
  *  - large-star(u): connect every neighbor v > u to m = min(N(u) ∪ {u});
  *  - small-star(u): orient edges to the larger endpoint, then connect
  *    every smaller neighbor (and u itself) to m = min(N(u)).
  *
  * Scale shape (the 100 TB story): each half-round is ONE shuffle keyed
  * on the node id (a partition-window min computes each node's group
  * minimum in the same pass that rewrites the edges — no groupBy+join
  * echo of the same exchange), plus small-star's dedup; edge payloads
  * are two longs regardless of document size. Hub nodes need no special
  * casing: a large-star round rewires a hub's neighbors directly to the
  * component minimum, so star sizes shrink geometrically.
  * `localCheckpoint` after every round truncates lineage, keeping plan
  * size constant across iterations.
  *
  * The fixpoint is a star forest: every edge is (member, componentMin).
  * Convergence is detected by an order-independent checksum
  * (count, sum(a), sum(b), sum(a·31+b) with wrap) reaching a fixed point —
  * exact at the fixpoint since the star transforms are deterministic; a
  * pre-fixpoint checksum collision would need four simultaneous 64-bit
  * coincidences and is ruled out in tests by a union-find reference.
  */
object ConnectedComponents {

  /** One large-star round: edges out are (v, m) with v > m.
    *
    * `m` is computed with a partition-window min over the grouping key —
    * ONE shuffle per half-round — instead of the groupBy+join-back shape
    * (two shuffles of the same data on the same key). Output dedup is
    * deferred to small-star's distinct: intermediate multiplicity is
    * bounded by node degree, which the star contraction itself shrinks
    * geometrically round over round. */
  private[operators] def largeStar(e: DataFrame): DataFrame = {
    val und = e.select(col("a"), col("b"))
      .union(e.select(col("b").as("a"), col("a").as("b")))
    val w = Window.partitionBy(col("a"))
    und
      .withColumn("m", least(min(col("b")).over(w), col("a")))
      .filter(col("b") > col("a"))
      .select(col("b").as("a"), col("m").as("b"))
  }

  /** One small-star round over larger-endpoint-oriented edges. */
  private[operators] def smallStar(e: DataFrame): DataFrame = {
    val or = e.select(greatest(col("a"), col("b")).as("a"),
      least(col("a"), col("b")).as("b"))
    val w = Window.partitionBy(col("a"))
    val withM = or.withColumn("m", min(col("b")).over(w))
    withM.filter(col("b") =!= col("m"))
      .select(col("b").as("a"), col("m").as("b"))
      .union(withM.select(col("a"), col("m").as("b")))
      .distinct()
  }

  private def checksum(e: DataFrame): Seq[Any] =
    e.agg(count(lit(1)), sum("a"), sum("b"),
      sum(col("a") * 31L + col("b"))).collect()(0).toSeq

  /** Component labels for every node of `edges` (columns (a: Long,
    * b: Long), either orientation, self-loops/dups tolerated):
    * returns (id, rep) with rep = min node id of the component.
    * Throws if `maxIter` rounds pass without convergence (the algorithm
    * guarantees O(log n) rounds, so hitting the cap means a bug, not a
    * big graph).
    */
  def labels(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    var cur = edges
      .select(greatest(col("a"), col("b")).as("a"),
        least(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    var sig = checksum(cur)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val next = smallStar(largeStar(cur)).localCheckpoint(true)
      val nsig = checksum(next)
      converged = nsig == sig
      cur = next
      sig = nsig
      it += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    cur.select(col("a").as("id"), col("b").as("rep"))
      .union(cur.select(col("b").as("id"), col("b").as("rep")))
      .groupBy("id").agg(min("rep").as("rep"))
  }
}
