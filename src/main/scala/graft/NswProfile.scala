package graft

import org.apache.spark.sql.functions._

/** Standalone attribution probe for the NSW/HNSW build family (r19
  * VERDICT ask #1: "measure whether the int8 +20% record drift is real
  * — event-log attribution, two settled reps"). Reproduces the bench's
  * exact corpus (1e5 x 768-d sin ramp, persisted) and times, twice:
  *
  *   - the quantize plan alone (withQuant -> noop sink, guide §1.4),
  *   - the flat, layered, and int8-layered buildIfAbsent calls
  *     (index dirs deleted between reps so every rep pays the build),
  *   - a driver-side pure-JVM single-shard layered build (separates
  *     graph compute from plan/shuffle/write overhead).
  *
  * Measurement-only: no declared query or bench path is touched.
  */
object NswProfile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    import graft.operators.{GraphAnn, NswIndex}
    val sc = spark.sparkContext

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val knnN = 100000L
    val dim = 768
    val vecs = spark.range(knnN)
      .select(col("id"),
        array((0 until dim).map(d =>
          sin((col("id") + 1).cast("double") * (d + 1) * 1e-4)): _*).as("v"))
      .persist()
    vecs.count()
    val corpus = vecs
      .withColumnRenamed("id", "vec_id").withColumnRenamed("v", "embedding")
    val shards = Runtime.getRuntime.availableProcessors()

    val base = System.getProperty("java.io.tmpdir") + "/graft_nswprof"
    val fs = org.apache.hadoop.fs.FileSystem.get(sc.hadoopConfiguration)
    def del(p: String): Unit = fs.delete(new org.apache.hadoop.fs.Path(p), true)

    // pure-JVM single-shard build: the same ~n/shards rows one build task
    // holds, built on the driver — isolates graph compute from the plan
    val oneShard = corpus
      .withColumn("shard", pmod(hash(col("vec_id")), lit(shards)).cast("int"))
      .filter(col("shard") === 0)
      .select("vec_id", "embedding")
      .collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)
    println(s"[nswprof] single-shard rows=${oneShard.length}")

    (1 to 2).foreach { rep =>
      sc.setJobDescription(s"nswprof: quantize plan rep$rep")
      val tQuant = time {
        NswIndex.withQuant(
          corpus.select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("v")))
          .write.format("noop").mode("overwrite").save()
      }
      val tShard = (1 to 2).map { _ =>
        time { graft.operators.GraphAnnProbe.build(oneShard, layered = true) }
      }.min
      sc.setJobDescription(s"nswprof: flat build rep$rep")
      del(base + "_flat")
      val tFlat = time {
        NswIndex.buildIfAbsent(corpus, "vec_id", "embedding", base + "_flat",
          numShards = shards)
      }
      sc.setJobDescription(s"nswprof: layered build rep$rep")
      del(base + "_l")
      val tLay = time {
        NswIndex.buildIfAbsent(corpus, "vec_id", "embedding", base + "_l",
          GraphAnn.Params(layered = true), numShards = shards)
      }
      sc.setJobDescription(s"nswprof: int8 build rep$rep")
      del(base + "_i8")
      val tI8 = time {
        NswIndex.buildIfAbsent(corpus, "vec_id", "embedding", base + "_i8",
          GraphAnn.Params(layered = true), numShards = shards, quantize = true)
      }
      sc.setJobDescription(null)
      println(f"[nswprof] rep$rep quant_plan=$tQuant%.2f flat=$tFlat%.2f " +
        f"layered=$tLay%.2f i8=$tI8%.2f one_shard_jvm=$tShard%.2f")
    }
    del(base + "_flat"); del(base + "_l"); del(base + "_i8")
    spark.stop()
  }
}
