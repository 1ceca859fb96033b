package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity contract of the fused `graft_pq_encode` loop with the
  * literal argmin-chain form it replaced (the encode path of q_v10 /
  * IvfIndex PQ cells): same ascending-i distance accumulation, same
  * first-minimum (smallest-j) tie rule, same all-NaN fallback to
  * code 0. The chain form stays here as the executable reference.
  */
class PqEncodeSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)

  private val S = 8; private val K = 16; private val D = 8

  /** The pre-r7 literal expression chain (reference form). */
  private def chainCode(cb: Array[Array[Array[Double]]], vec: Column,
      s0: Int): Column =
    array_min(array((0 until K).map { j =>
      val dist = (0 until D).map { i =>
        val d = element_at(vec, s0 * D + i + 1) - lit(cb(s0)(j)(i))
        d * d
      }.reduceLeft(_ + _)
      struct(dist.as("dist"), lit(j).as("j"))
    }: _*)).getField("j")

  private def fused(cb: Array[Array[Array[Double]]], vec: Column): Column =
    call_function("graft_pq_encode", vec,
      typedLit(cb.flatMap(_.flatMap(_.toSeq)).toSeq), lit(S), lit(K), lit(D))

  test("fused encode equals the literal argmin chain on a synthetic corpus") {
    val dim = S * D
    val vecs = spark.range(500).select(col("id"),
      transform(sequence(lit(1), lit(dim)),
        i => sin(col("id").cast("double") * i.cast("double") * 0.37)).as("v"))
    val rnd = new java.util.Random(42)
    val cb = Array.fill(S, K, D)(rnd.nextDouble() * 2 - 1)
    val rows = vecs.select(
      col("id"),
      fused(cb, col("v")).as("fc"),
      array((0 until S).map(s0 =>
        chainCode(cb, col("v"), s0).cast("tinyint")): _*).as("cc"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Byte](1) == r.getSeq[Byte](2),
        s"id=${r.getLong(0)}: fused ${r.getSeq[Byte](1)} != chain ${r.getSeq[Byte](2)}")
    }
  }

  test("exact ties resolve to the smallest j, like the struct argmin") {
    // codebook entries 3 and 7 identical in every subspace -> any vector
    // equidistant to both must code to 3 on both paths
    val rnd = new java.util.Random(7)
    val cb = Array.fill(S, K, D)(rnd.nextDouble())
    for (s0 <- 0 until S; i <- 0 until D) cb(s0)(7)(i) = cb(s0)(3)(i)
    val dim = S * D
    val vecs = spark.range(50).select(col("id"),
      transform(sequence(lit(1), lit(dim)),
        i => cos(col("id").cast("double") + i.cast("double"))).as("v"))
    val rows = vecs.select(
      fused(cb, col("v")).as("fc"),
      array((0 until S).map(s0 =>
        chainCode(cb, col("v"), s0).cast("tinyint")): _*).as("cc"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Byte](0) == r.getSeq[Byte](1))
      assert(!r.getSeq[Byte](0).contains(7.toByte),
        "tie must resolve to entry 3, never its duplicate 7")
    }
  }

  test("all-NaN distances code to 0 on both paths") {
    val cb = Array.fill(S, K, D)(Double.NaN)
    val dim = S * D
    val vecs = spark.range(5).select(col("id"),
      transform(sequence(lit(1), lit(dim)),
        i => i.cast("double")).as("v"))
    val rows = vecs.select(
      fused(cb, col("v")).as("fc"),
      array((0 until S).map(s0 =>
        chainCode(cb, col("v"), s0).cast("tinyint")): _*).as("cc"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Byte](0) == r.getSeq[Byte](1))
      assert(r.getSeq[Byte](0).forall(_ == 0.toByte))
    }
  }
}
