package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps
import graft.sources.Tables

/** The codegen'd graft_polyhash expression must agree exactly with the
  * declarative HOF fold it replaces (same values the DuckDB oracle
  * computes), on real corpus text and edge cases.
  */
class PolyHashSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)

  test("codegen'd polyhash equals the HOF fold on the corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("fast", TextOps.polyHash(col("text")))
      .withColumn("slow", TextOps.polyHashHof(col("text")))
    assert(docs.filter(col("fast") =!= col("slow")).isEmpty)
    // non-degenerate: hashes vary
    assert(docs.select(countDistinct(col("fast"))).head.getLong(0) > 100)
  }

  test("polyhash edge cases: empty string, single char, null") {
    import spark.implicits._
    val df = Seq(Some(""), Some("a"), Some("ab"), None).toDF("s")
      .withColumn("h", TextOps.polyHash(col("s")))
    val rows = df.select("h").collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    val p = TextOps.HashP
    assert(rows(0).contains(7L))
    assert(rows(1).contains((7L * 31 + 'a'.toLong) % p))
    assert(rows(2).contains(((7L * 31 + 'a') * 31 + 'b') % p))
    assert(rows(3).isEmpty)
  }

  test("graft_polyhash is callable from spark.sql") {
    val r = spark.sql("SELECT graft_polyhash('ab') AS h").head.getLong(0)
    assert(r == ((7L * 31 + 'a') * 31 + 'b') % TextOps.HashP)
  }

  test("codegen'd hash_embed equals the HOF fold on the corpus") {
    import graft.operators.Scorers
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("th", Scorers.tokenHashes(col("text")))
      .withColumn("fast", Scorers.rawEmbeddingFromHashes(col("th"), 16))
      .withColumn("slow", Scorers.rawEmbeddingHof(col("th"), 16))
    // element-wise bit-exact equality (array equality covers it)
    assert(docs.filter(not(col("fast") === col("slow"))).isEmpty)
    val first = docs.select(col("fast")).head.getSeq[Double](0)
    assert(first.length == 16 && first.exists(_ != 0.0))
  }
}
