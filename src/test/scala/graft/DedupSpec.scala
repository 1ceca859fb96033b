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

  test("minhash LSH recall on injected near-dups matches the s-curve contract") {
    // LSH recall is probabilistic by design: a pair at Jaccard J survives
    // with prob 1-(1-J^8)^4 (4 bands x 8 rows) — ~0.99 at J≈0.95 but
    // lower for short docs where the marker suffix dilutes J. The
    // contract is >= 90% recall at this operating point; exact-Jaccard
    // re-ranking (q_d3) is the 100%-recall verification path for
    // candidate pairs.
    val found = SparkEntry.queries("q_d1_minhash_lsh")(spark, sf)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 25L).map(i => (i, i + 1000000L)).toSet
    val recall = (expected & found).size.toDouble / expected.size
    assert(recall >= 0.9, s"recall $recall; missing: ${expected -- found}")
    // everything reported really is a near-dup estimate >= 0.5
    val ests = SparkEntry.queries("q_d1_minhash_lsh")(spark, sf)
      .select("est_jaccard").collect().map(_.getDouble(0))
    assert(ests.forall(_ >= 0.5))
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
