package graft

import org.scalatest.funsuite.AnyFunSuite

/** Throwaway profiling harness: where does the layered build's 5.8x
  * cost over flat go — distance evals or JVM overhead? Not a contract.
  */
class LayeredBuildProfileSpec extends AnyFunSuite {

  private val dim = 768
  private val n = 6000

  private def clustered: Array[Array[Double]] =
    Array.tabulate(n)(i => Array.tabulate(dim)(d =>
      math.sin((i % 20).toDouble * (2.17 + d) + d * 0.91) +
        math.sin(i.toDouble * (5.3 + d)) * 0.15))

  // the Bench kNN/NSW probe corpus shape: near-orthogonal sin vectors
  private def benchLike(sz: Int): Array[Array[Double]] =
    Array.tabulate(sz)(i => Array.tabulate(dim)(d =>
      math.sin(i.toDouble * (d + 1) * 1e-4)))

  test("flat vs layered build: wall time and eval counts") {
    import graft.operators.GraphAnnProbe
    for ((name, vs) <- Seq("clustered" -> clustered, "benchlike" -> benchLike(3125));
         layered <- Seq(false, true); rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val nsw = GraphAnnProbe.build(vs, layered)
      val sec = (System.nanoTime() - t0) / 1e9
      info(f"$name n=${vs.length} layered=$layered rep=$rep: " +
        f"build $sec%.2f s, evals ${GraphAnnProbe.evals(nsw)} " +
        f"(select ${GraphAnnProbe.evalsSelect(nsw)}, " +
        f"pruneScore ${GraphAnnProbe.evalsPrune(nsw)})")
    }
  }
}
