package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PackKernels.GreedyPackKernel

class PackKernelsSpec extends AnyFunSuite {

  private def run(budget: Long, toks: Seq[Long]): Seq[(Long, Long)] = {
    val k = new GreedyPackKernel(budget)
    k.reset()
    toks.map { t =>
      val out = k.step(Array(t.toDouble))
      (out(0).toLong, out(1).toLong)
    }
  }

  test("fills greedily and starts a new pack on overflow") {
    // budget 10: [4,5] fits pack 0; 3 would overflow -> pack 1; [3,7] fits
    assert(run(10L, Seq(4L, 5L, 3L, 7L)) ===
      Seq((0L, 4L), (0L, 9L), (1L, 3L), (1L, 10L)))
  }

  test("a document larger than the budget gets a pack of its own") {
    assert(run(10L, Seq(25L, 2L, 30L, 1L)) ===
      Seq((0L, 25L), (1L, 2L), (2L, 30L), (3L, 1L)))
  }

  test("an exactly-full pack closes before the next document") {
    assert(run(10L, Seq(10L, 10L, 5L, 5L, 1L)) ===
      Seq((0L, 10L), (1L, 10L), (2L, 5L), (2L, 10L), (3L, 1L)))
  }

  test("invariants hold over many deterministic pseudo-random streams") {
    for (seed <- 1L to 20L) {
      val budget = 64L + (seed * 131) % 2000
      val toks = (1L to 500L).map(i => (i * 6364136223846793005L + seed) % 137 match {
        case m if m < 0 => -m % 137 + 1
        case m => m + 1
      })
      val out = run(budget, toks)
      // token totals conserved per pack; no pack over budget unless it
      // holds a single oversized doc; pack ids nondecreasing from 0
      assert(out.head._1 === 0L)
      assert(out.zip(out.drop(1)).forall { case ((p1, _), (p2, _)) =>
        p2 == p1 || p2 == p1 + 1
      })
      val perPack = toks.zip(out).groupBy(_._2._1)
      perPack.foreach { case (_, members) =>
        val total = members.map(_._1).sum
        assert(total === members.last._2._2) // cum_tok of last member
        assert(total <= budget || members.size == 1)
      }
    }
  }

  test("checkpoint/restore mid-stream is bit-identical to uninterrupted") {
    val toks = (1L to 200L).map(i => (i * 7919) % 97 + 1)
    val whole = run(50, toks)
    val (a, b) = toks.splitAt(83)
    val k1 = new GreedyPackKernel(50)
    k1.reset()
    val out1 = a.map(t => { val o = k1.step(Array(t.toDouble)); (o(0).toLong, o(1).toLong) })
    val k2 = new GreedyPackKernel(50)
    k2.reset()
    k2.restore(k1.snapshot)
    val out2 = b.map(t => { val o = k2.step(Array(t.toDouble)); (o(0).toLong, o(1).toLong) })
    assert(out1 ++ out2 === whole)
  }
}
