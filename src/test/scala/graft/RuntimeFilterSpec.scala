package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves runtime bloom-filter join pruning fires under the engine's
  * session config: a selective filter on the dimension side of a shuffle
  * join injects a bloom `might_contain` predicate into the fact-side
  * SCAN, so fact rows that cannot match die before the exchange — the
  * pre-shuffle pruning that, at 100 TB, is the difference between
  * shuffling the whole fact table and shuffling the matching slice.
  * Thresholds are lowered to unit-test sizes; production hits the same
  * rule at its default 10 MB/10 GB gates.
  */
class RuntimeFilterSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)

  test("selective dim filter injects a bloom filter into the fact scan") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    val dir = Files.createTempDirectory("graft_rtf").toString
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1B")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      spark.range(0, 200000)
        .select(col("id").as("fk"), (col("id") % 97L).as("payload"))
        .write.mode("overwrite").parquet(s"$dir/fact")
      spark.range(0, 50000)
        .select(col("id").as("pk"), (col("id") % 13L).as("cat"))
        .write.mode("overwrite").parquet(s"$dir/dim")

      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("cat") === 7L)
      val joined = fact.join(dim, col("fk") === col("pk"))
        .agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
      val row = joined.collect()(0)

      // exact result: pk % 13 == 7 within [0, 50000)
      val pks = (0L until 50000L).filter(_ % 13 == 7)
      assert(row.getLong(0) == pks.length.toLong)
      assert(row.getLong(1) == pks.map(_ % 97).sum)

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"runtime bloom filter must reach the fact scan:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None)    => conf.unset(k)
      }
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(dir), true)
    }
  }
}
