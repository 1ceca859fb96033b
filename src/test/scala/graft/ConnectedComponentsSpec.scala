package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConnectedComponents

/** Contract for the large-star/small-star connected-components operator
  * (D5's clustering step): labels must equal a driver-side union-find on
  * the same edges, for random graphs across shapes (chains, cliques,
  * stars, sparse noise) and partitionings.
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def check(edges: Seq[(Long, Long)], parts: Int = 4): Unit = {
    import spark.implicits._
    val got = ConnectedComponents
      .labels(edges.toDF("a", "b").repartition(parts))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == unionFind(edges))
  }

  test("chain, clique, star, and two-component shapes") {
    check(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))            // chain
    check(for (i <- 0L to 5L; j <- (i + 1) to 5L) yield (i, j))   // clique
    check((1L to 40L).map(i => (100L, 100L + i)))                 // star hub
    check(Seq((1L, 2L), (2L, 3L), (10L, 11L), (12L, 11L)))        // 2 comps
  }

  test("duplicate and reversed edges are tolerated; self-loops drop out") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 2L))
    check(edges)
    val got = ConnectedComponents
      .labels((edges ++ Seq((7L, 7L))).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == unionFind(edges), "self-loop-only nodes carry no membership")
  }

  test("seeded random graphs match union-find across partitionings") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 4) {
      val n = 200 + trial * 100
      val edges = Seq.fill(n) {
        (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)
      }.filter { case (a, b) => a != b }
      check(edges, parts = 1 + trial * 3)
    }
  }

  test("ids far apart and out of order converge to the component min") {
    check(Seq((5000000L, 3L), (3L, 999999L), (999999L, 42L), (77L, 5000000L)))
  }
}
