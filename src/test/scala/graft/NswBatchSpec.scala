package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.NswIndex
import graft.queries.VectorQueries
import graft.sources.Tables

/** Contract of batched graph-index serving (the q_v8g batch WALK,
  * VectorQueries.nswBatchWalk — the registered q_v8g is its hash-oracled
  * exact side since r13): the one-job searchShards batch, merged per
  * qid, returns exactly what the per-call searchTopK loop returns for
  * every query in the batch.
  */
class NswBatchSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)
  private val sf = "/root/testdata/sf0.001"

  test("q_v8g batch walk == per-query searchTopK loop") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_nswb_spec").toString + "/idx"
    NswIndex.buildIfAbsent(
      Tables.embeddings(spark, sf), "vec_id", "embedding", path)
    // point the walk at OUR index path so the spec is hermetic
    spark.conf.set("spark.graft.nswIndexDir", path)
    try {
      val got = VectorQueries.nswBatchWalk(spark, sf).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      val expect = VectorQueries.BatchQueryVecs.zipWithIndex
        .flatMap { case (q, qi) =>
          NswIndex.searchTopK(spark, path, q, k = 5).collect().zipWithIndex
            .map { case (r, i) =>
              (qi.toLong, i + 1, r.getLong(0),
                BigDecimal(r.getDouble(1))
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
            }
        }
      assert(got.toSeq == expect)
    } finally spark.conf.unset("spark.graft.nswIndexDir")
  }

  test("q_v8g registered exact side matches brute force per batch query") {
    val got = SparkEntry.queries("q_v8g_nsw_batch")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf)
    val expect = VectorQueries.BatchQueryVecs.zipWithIndex
      .flatMap { case (q, qi) =>
        e.withColumn("s", graft.operators.VectorOps.cosine(
            col("embedding"), typedLit(q)))
          .orderBy(desc("s"), col("vec_id")).limit(5)
          .collect().zipWithIndex
          .map { case (r, i) => (qi.toLong, i + 1, r.getLong(0)) }
      }
    assert(got.toSeq == expect)
  }
}
