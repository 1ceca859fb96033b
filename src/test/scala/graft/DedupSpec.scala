package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Dedup-operator invariants over the sf0.001 corpus. */
class DedupSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)
  private val sf = "/root/testdata/sf0.001"

  test("exact dedup is idempotent and keeps one row per fingerprint") {
    import graft.operators.TextOps._
    val docs = Tables.documents(spark, sf)
      .withColumn("fp", md5(normalizeText(col("text")).cast("binary")))
    val once = docs.dropDuplicates("fp")
    val twice = once.dropDuplicates("fp")
    assert(once.count() == twice.count())
    assert(once.groupBy("fp").count().filter(col("count") > 1).isEmpty)
  }

  test("minhash LSH finds every injected near-duplicate pair") {
    val found = SparkEntry.queries("q_d1_minhash_lsh")(spark, sf)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 25L).map(i => (i, i + 1000000L)).toSet
    assert(expected.subsetOf(found),
      s"missing pairs: ${expected -- found}")
  }

  test("simhash hamming distance is small for perturbed copies") {
    val hams = SparkEntry.queries("q_d2_simhash")(spark, sf)
      .select("hamming").collect().map(_.getAs[Number](0).intValue())
    assert(hams.nonEmpty)
    // a short appended marker should flip well under half the 16 bits
    assert(hams.forall(_ <= 8), s"max hamming = ${hams.max}")
  }

  test("ngram jaccard marks perturbed copies as near-dups") {
    val rows = SparkEntry.queries("q_d3_ngram_jaccard")(spark, sf)
      .select("jaccard").collect().map(_.getDouble(0))
    assert(rows.length == 50)
    assert(rows.forall(j => j > 0.5 && j < 1.0))
  }
}
