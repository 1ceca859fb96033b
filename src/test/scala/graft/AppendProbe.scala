package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Dev probe (not a spec): per-append cost of the K1 sink as the sink
  * directory grows, to attribute the X2 tick's append-dominated phase
  * (VERDICT r17 next #8: append = 3.18 s of the 4.05 s tick phase).
  * Run: sbt "Test/runMain graft.AppendProbe". */
object AppendProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get(8)
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("v", DoubleType)))
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (1 to 5000).map(i => Row(i.toLong % 16,
      new java.sql.Timestamp(base.getTime + i * 1000L), i.toDouble))
    val sink = java.nio.file.Files.createTempDirectory("probe_sink").toString
    for (b <- 1 to 12) {
      val ds = spark.createDataset(rows)(
        org.apache.spark.sql.Encoders.row(schema)).coalesce(1)
      val t0 = System.nanoTime()
      graft.sources.Sinks.appendPartitioned(ds, "ts", sink)
      println(f"append $b%2d: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
