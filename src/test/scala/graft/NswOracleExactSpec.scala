package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the premise behind the q_v8-family brute-force oracles (r15,
  * VERDICT r14 next #1): at the gate corpora the registered graph WALKS
  * return exactly the brute-force top-5 — raw geometry for
  * q_v8/q_v8c/q_v8e, int8-dequantized geometry for q_v8f. The driver's
  * DuckDB gate re-proves this at sf0.01 every round; this spec catches a
  * regression (a beam/entry/prune change that costs exactness at small
  * corpora) at dev time, against the same exact reference computed
  * in-plan instead of in SQL.
  *
  * The quantized walk's reference is the DEQUANTIZED corpus (scale =
  * max|v|/127, HALF_UP round — q_v7's oracled rule), because
  * quantization happens before graph construction and the serve scores
  * on dequantized values. It also serves at ef=64: int8 collapses
  * near-ties into exact score plateaus (no beam gradient), and the ×10
  * replica's 10 bit-identical copies per vector measured one missed tied
  * member at ef=32 — the registered query carries the same oversampled
  * beam this spec asserts with.
  */
class NswOracleExactSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"

  private def spark = GraftSession.get(4)

  /** Exact top-5 over an embedding frame: SELECTED at full precision
    * (score desc, vec_id asc — the oracle's rule), then canonicalized
    * the same way [[resultOf]] is — round to 6 dp FIRST, sort by
    * (-roundedScore, vec_id) — so two members that tie at 6 dp but
    * differ at full precision cannot order the two sides differently
    * (ADVICE r15). */
  private def exactTop5(e: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    e.withColumn("score",
        graft.operators.VectorOps.cosine(col("emb"),
          typedLit(graft.queries.VectorQueries.QueryVec)))
      .orderBy(desc("score"), col("vec_id"))
      .limit(5)
      .select(col("vec_id"), round(col("score"), 6).as("score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      .sortBy(p => (-p._2, p._1))

  private def resultOf(name: String): Seq[(Long, Double)] =
    SparkEntry.queries(name)(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      .sortBy(p => (-p._2, p._1))

  test("raw walks (q_v8, q_v8c, q_v8e) equal brute-force top-5 at sf0.001") {
    val s = spark
    val raw = graft.sources.Tables.embeddings(s, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("emb"))
    val want = exactTop5(raw)
    for (q <- Seq("q_v8_nsw_ann", "q_v8c_nsw_persisted",
        "q_v8e_nsw_layered_persisted")) {
      assert(resultOf(q) == want, s"$q diverged from brute force")
    }
  }

  test("quantized walk (q_v8f) equals DEQUANTIZED brute-force top-5") {
    val s = spark
    val raw = graft.sources.Tables.embeddings(s, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("emb"))
    val deq = raw
      .withColumn("absmax",
        aggregate(col("emb"), lit(0.0), (a, v) => greatest(a, abs(v))))
      .withColumn("scale",
        when(col("absmax") > 0.0, col("absmax") / 127.0).otherwise(1.0))
      .select(col("vec_id"),
        transform(col("emb"),
          v => round(v / col("scale"), 0).cast("int").cast("double") *
            col("scale")).as("emb"))
    val want = exactTop5(deq)
    assert(resultOf("q_v8f_nsw_quantized") == want,
      "q_v8f diverged from the dequantized brute force")
  }
}
