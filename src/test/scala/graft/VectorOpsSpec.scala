package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps._
import graft.queries.VectorQueries

/** Vector-operator invariants (SURVEY.md §5.3 property tests). */
class VectorOpsSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)
  private val sf = "/root/testdata/sf0.001"

  test("cosine is bounded, symmetric, and 1.0 on self") {
    import spark.implicits._
    val df = graft.sources.Tables.embeddings(spark, sf).limit(50)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))
    val self = df.select(cosine(col("e"), col("e")).as("c"))
      .as[Double].collect()
    assert(self.forall(c => math.abs(c - 1.0) < 1e-12))

    val a = df.as("a")
    val b = df.as("b")
    val pairs = a.crossJoin(b)
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(
        cosine(col("a.e"), col("b.e")).as("ab"),
        cosine(col("b.e"), col("a.e")).as("ba"))
      .as[(Double, Double)].collect()
    assert(pairs.forall { case (ab, ba) => ab == ba && ab >= -1.0 - 1e-12 && ab <= 1.0 + 1e-12 })
  }

  test("codegen'd graft_dotp equals the HOF fold bit-exactly (float and double arrays)") {
    import spark.implicits._
    val floats = graft.sources.Tables.embeddings(spark, sf).limit(100)
      .select(col("vec_id"), col("embedding"))
    val pairs = floats.as("a").crossJoin(floats.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(500)
      .select(
        dot(col("a.embedding"), col("b.embedding")).as("fast"),
        dotHof(col("a.embedding"), col("b.embedding")).as("ref"),
        norm2(col("a.embedding")).as("n_fast"),
        norm2Hof(col("a.embedding")).as("n_ref"))
      .as[(Double, Double, Double, Double)].collect()
    pairs.foreach { case (f, r, nf, nr) =>
      assert(java.lang.Double.doubleToLongBits(f) === java.lang.Double.doubleToLongBits(r))
      assert(java.lang.Double.doubleToLongBits(nf) === java.lang.Double.doubleToLongBits(nr))
    }
    val doubles = floats
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))
    val dres = doubles.select(
      dot(col("e"), col("e")).as("fast"), dotHof(col("e"), col("e")).as("ref"))
      .as[(Double, Double)].collect()
    dres.foreach { case (f, r) =>
      assert(java.lang.Double.doubleToLongBits(f) === java.lang.Double.doubleToLongBits(r))
    }
  }

  test("top-k by cosine is a prefix of top-(k+1)") {
    import spark.implicits._
    val scored = graft.sources.Tables.embeddings(spark, sf)
      .withColumn("score", cosine(col("embedding"), typedLit(VectorQueries.QueryVec)))
      .orderBy(desc("score"), col("vec_id"))
    val k5 = scored.limit(5).select("vec_id").as[Long].collect().toSeq
    val k6 = scored.limit(6).select("vec_id").as[Long].collect().toSeq
    assert(k6.take(5) == k5)
  }

  test("LSH bucket ids are deterministic and within band range") {
    import spark.implicits._
    val planes = hyperplanes(4, 64, seed = 7L)
    val df = graft.sources.Tables.embeddings(spark, sf).limit(100)
      .select(lshBucket(col("embedding"), planes).as("b"))
    val b1 = df.as[Long].collect().toSeq
    val b2 = df.as[Long].collect().toSeq
    assert(b1 == b2)
    assert(b1.forall(b => b >= 0 && b < 16))
  }

  test("hyperplanes are reproducible from the seed") {
    assert(hyperplanes(3, 8, 42L) == hyperplanes(3, 8, 42L))
    assert(hyperplanes(3, 8, 42L) != hyperplanes(3, 8, 43L))
    assert(hyperplanes(2, 5, 1L).flatten.forall(v => v > -1.0 && v < 1.0))
  }

  test("graft_topk equals the window row_number top-k (incl. score ties)") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // scores with deliberate ties (mod 17) across 3 groups, 5k rows,
    // many partitions — exercises partial heaps + merge + tie-breaks
    val df = spark.range(5000).repartition(16)
      .select(
        (col("id") % 3).as("g"),
        col("id").as("vec_id"),
        ((col("id") * 37 % 17).cast("double") / 17.0).as("score"))
    val viaAgg = df.groupBy("g")
      .agg(call_function("graft_topk", col("score"), col("vec_id"), lit(7)).as("nbrs"))
      .select(col("g"), posexplode(col("nbrs")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("col.vec_id").as("vec_id"), col("col.score").as("score"))
    val w = Window.partitionBy("g").orderBy(desc("score"), col("vec_id"))
    val viaWindow = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 7)
      .select(col("g"), col("rank"), col("vec_id"), col("score"))
    assert(viaAgg.count() == 21)
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("banded ANN table: candidate lookup is partition pruning, not a scan") {
    // the scale claim behind q_v4 (VectorQueries scaladoc): written
    // partitioned by a band's bucket id, the per-query candidate read
    // prunes to the query's bucket directory — PartitionFilters in the
    // plan, same candidates as the in-memory filter
    import graft.queries.VectorQueries.{Planes, QueryVec}
    val dir = java.nio.file.Files.createTempDirectory("graft_banded").toString + "/t"
    val e = graft.sources.Tables.embeddings(spark, sf)
    val band0 = Planes.take(4)
    e.withColumn("b0", lshBucket(col("embedding"), band0))
      .write.partitionBy("b0").parquet(dir)
    val qb = band0.zipWithIndex.map { case (hp, k) =>
      val dot = hp.zip(QueryVec).foldLeft(0.0)((acc, p) => acc + p._1 * p._2)
      if (dot > 0.0) 1L << k else 0L
    }.sum
    val pruned = spark.read.parquet(dir).filter(col("b0") === lit(qb))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("b0"),
      s"bucket predicate not pushed to partition pruning:\n$plan")
    val expected = e.filter(lshBucket(col("embedding"), band0) === lit(qb))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val got = pruned.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == expected && got.nonEmpty)
  }
}
