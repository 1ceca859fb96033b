package graft

import org.apache.spark.sql.functions._

import graft.operators.{GraphAnn, NswIndex}

/** Scratch instrument (test scope, not shipped): replicates the
  * nsw_scaled ladder's corpus + recall measurement across build-param
  * configs, to locate the cheapest (m, efConstruction) that holds
  * recall@10 = 1.0 at the pinned serve ef as the corpus scales.
  * Run: sbt "Test/runMain graft.NswRecallProbe 5 25"
  */
object NswRecallProbe {
  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(5, 25)
    val spark = GraftSession.get()
    val dim = graft.queries.VectorQueries.Dim
    val baseN = 20000L
    val ef = 64
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val configs = Seq(
      ("m8_efc32 (current)", GraphAnn.Params(layered = true)),
      ("m8_efc64", GraphAnn.Params(m = 8, efConstruction = 64, layered = true)),
      ("m16_efc64", GraphAnn.Params(m = 16, efConstruction = 64, layered = true)),
      ("m16_efc128", GraphAnn.Params(m = 16, efConstruction = 128, layered = true)),
      ("m32_efc128 (reference)", GraphAnn.Params(m = 32, efConstruction = 128, layered = true)))
    for (mult <- mults) {
      val n = baseN * mult
      val e = spark.range(n).select(
        col("id").as("vec_id"),
        array((0 until dim).map(d =>
          sin((col("id") + 1).cast("double") * (d * 7 + 3) * 1e-4)): _*)
          .as("embedding")).persist()
      e.count()
      val qv: Seq[Double] =
        (0 until dim).map(d => math.sin(10001.0 * (d * 7 + 3) * 1e-4))
      val exactIds = e
        .withColumn("score",
          graft.operators.VectorOps.cosine(col("embedding"), typedLit(qv)))
        .orderBy(desc("score"), col("vec_id"))
        .limit(10).select("vec_id")
        .collect().map(_.getLong(0)).toSet
      println(s"== x$mult (n=$n) exact=${exactIds.toSeq.sorted.mkString(",")}")
      for ((name, params) <- configs) {
        val path = System.getProperty("java.io.tmpdir") +
          s"/graft_recallprobe_x${mult}_" + name.takeWhile(_ != ' ')
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
        val t0 = System.nanoTime()
        NswIndex.buildIfAbsent(e, "vec_id", "embedding", path, params,
          numShards = Runtime.getRuntime.availableProcessors())
        val buildSec = (System.nanoTime() - t0) / 1e9
        val annIds = NswIndex.searchTopK(spark, path, qv, k = 10, efSearch = ef)
          .collect().map(_.getLong(0)).toSet
        val recall = annIds.intersect(exactIds).size / 10.0
        val missed = exactIds.diff(annIds).toSeq.sorted
        println(f"  $name%-24s build=$buildSec%7.2fs recall@10=$recall%.2f" +
          (if (missed.nonEmpty) s" missed=${missed.mkString(",")}" else ""))
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
      }
      e.unpersist()
    }
    spark.stop()
  }
}
