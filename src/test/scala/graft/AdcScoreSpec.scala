package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfIndex
import graft.queries.VectorQueries

/** Bit-parity contract of the fused `graft_adc_score` serve plan with
  * the joined element_at form it replaced (VERDICT r9 next #1): the
  * q_v11 family's DuckDB oracle mirrors the JOINED plan's fold orders
  * verbatim, so the fused expression must produce the IDENTICAL doubles
  * — same ascending-s accumulation per Σ, same
  * `(qc + dotr) / (qNorm · sqrt((cn2 + 2·cdr) + rn2s))` op order.
  * Parity here is transitively parity with the hash oracle.
  */
class AdcScoreSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)

  private val n = 400L

  private def freshPath(tag: String): String = {
    val p = java.nio.file.Files
      .createTempDirectory(s"graft_adc_$tag").toString
    new java.io.File(p).delete()
    p
  }

  private def buildIndex(trainIters: Int): (DataFrame, Int, String) = {
    val e = VectorQueries.clusteredCorpus(spark, n)
    val k = VectorQueries.ivfK(n)
    val cents = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    val path = freshPath(s"ti$trainIters")
    IvfIndex.buildPqIfAbsent(e, cents, path, trainIters = trainIters)
    (e, k, path)
  }

  private def collectScores(df: DataFrame): Seq[(Long, Long)] =
    df.select(col("vec_id"), col("score"))
      .collect()
      .map(r => (r.getLong(0), java.lang.Double.doubleToRawLongBits(r.getDouble(1))))
      .sortBy(_._1).toSeq

  test("fused ADC scores are bit-identical to the joined element_at plan") {
    for (ti <- Seq(0, IvfIndex.PqTrainItersDefault)) {
      val (e, k, path) = buildIndex(ti)
      val nprobe = VectorQueries.ivfNprobe(k)
      val qvs = e.filter(col("vec_id") < 4)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("qv"))
        .collect().map(r => r.getSeq[Double](1).toSeq)
      qvs.foreach { qv =>
        val fused = collectScores(
          IvfIndex.searchScoredPq(spark, path, qv, nprobe))
        val joined = collectScores(
          IvfIndex.searchScoredPq(spark, path, qv, nprobe, fused = false))
        assert(fused.nonEmpty, "empty candidate set")
        assert(fused == joined,
          s"trainIters=$ti: fused scores diverge from the joined plan")
      }
    }
  }

  test("fused plan carries no join: scan, filter, project only") {
    val (e, k, path) = buildIndex(0)
    val qv = e.filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")))
      .first().getSeq[Double](0).toSeq
    val plan = IvfIndex
      .searchScoredPq(spark, path, qv, VectorQueries.ivfNprobe(k))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"fused ADC serve plan still contains a join:\n$plan")
  }

  test("searchTopK on a PQ index routes through the fused plan and ranks identically") {
    val (e, k, path) = buildIndex(0)
    val qv = e.filter(col("vec_id") === 1)
      .select(transform(col("embedding"), x => x.cast("double")))
      .first().getSeq[Double](0).toSeq
    val nprobe = VectorQueries.ivfNprobe(k)
    val top = IvfIndex.searchTopK(spark, path, qv, nprobe, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val expected = IvfIndex.searchScoredPq(spark, path, qv, nprobe, fused = false)
      .orderBy(desc("score"), col("vec_id")).limit(5)
      .select(col("vec_id"), round(col("score"), 6))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.toSeq == expected.toSeq)
  }
}
