package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.NswIndex
import graft.queries.VectorQueries
import graft.sources.Tables

/** Contract of batched graph-index serving (q_v8g): the one-job
  * searchShards batch, merged per qid, returns exactly what the
  * per-call searchTopK loop returns for every query in the batch.
  */
class NswBatchSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)
  private val sf = "/root/testdata/sf0.001"

  test("q_v8g batch == per-query searchTopK loop") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_nswb_spec").toString + "/idx"
    NswIndex.buildIfAbsent(
      Tables.embeddings(spark, sf), "vec_id", "embedding", path)
    val batch = SparkEntry.queries("q_v8g_nsw_batch")
    // point the query at OUR index path so the spec is hermetic
    spark.conf.set("spark.graft.nswIndexDir", path)
    try {
      val got = batch(spark, sf).collect()
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
}
