package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Sinks, Tables}

/** K1 partitioned-append and K2 keyed-upsert sink contracts. */
class SinksSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)
  private val sf = "/root/testdata/sf0.001"

  test("K1: partitioned append + partition pruning on day predicates") {
    val dir = Files.createTempDirectory("graft_k1").toString + "/sink"
    val events = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "value")
    Sinks.appendPartitioned(events.filter(col("event_id") % 2 === 0), "ts", dir)
    Sinks.appendPartitioned(events.filter(col("event_id") % 2 === 1), "ts", dir)
    val back = Sinks.readPartitioned(spark, dir)
    assert(back.count() == events.count())

    val pruned = back.filter(col("day") === "2024-01-05")
    val plan = pruned.queryExecution.executedPlan.toString
    // partition filter must reach the scan, not a post-scan Filter
    assert(plan.contains("PartitionFilters") && plan.contains("day"),
      s"no partition pruning in plan:\n$plan")
    val expected = events.filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-05").count()
    assert(pruned.count() == expected && expected > 0)
  }

  test("K2: upsert keeps the newest version per key and dedups re-delivery") {
    val dir = Files.createTempDirectory("graft_k2").toString + "/sink"
    import spark.implicits._
    val v1 = Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
      .toDF("id", "payload", "version")
    Sinks.upsertByKey(spark, v1, dir, Seq("id"), "version")
    // re-deliver id=2 with a newer version, id=3 with same (incoming wins),
    // and a brand-new id=4
    val v2 = Seq((2L, "B", 2L), (3L, "C", 1L), (4L, "d", 1L))
      .toDF("id", "payload", "version")
    Sinks.upsertByKey(spark, v2, dir, Seq("id"), "version")
    val state = spark.read.parquet(dir)
      .select("id", "payload", "version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(state == Set((1L, "a", 1L), (2L, "B", 2L), (3L, "C", 1L), (4L, "d", 1L)))
  }

  test("K2: upsert is idempotent") {
    val dir = Files.createTempDirectory("graft_k2i").toString + "/sink"
    import spark.implicits._
    val v = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "payload", "version")
    Sinks.upsertByKey(spark, v, dir, Seq("id"), "version")
    Sinks.upsertByKey(spark, v, dir, Seq("id"), "version")
    assert(spark.read.parquet(dir).count() == 2)
  }

  /** All parquet file paths under the sink, grouped by bucket directory. */
  private def bucketFiles(dir: String): Map[String, Set[String]] = {
    val root = java.nio.file.Paths.get(dir)
    val out = scala.collection.mutable.Map[String, Set[String]]()
    java.nio.file.Files.list(root).forEach { d =>
      val name = d.getFileName.toString
      if (name.startsWith("__bucket=")) {
        val files = java.nio.file.Files.list(d)
          .filter(f => f.toString.endsWith(".parquet"))
          .map[String](_.getFileName.toString)
          .toArray.map(_.toString).toSet
        out(name) = files
      }
    }
    out.toMap
  }

  test("K2 bucketed: merge rewrites ONLY touched bucket directories, same semantics") {
    val dir = Files.createTempDirectory("graft_k2b").toString + "/sink"
    import spark.implicits._
    val v1 = (0L until 100L).map(i => (i, s"p$i", 1L)).toDF("id", "payload", "version")
    Sinks.upsertByKeyBucketed(spark, v1, dir, Seq("id"), "version", nBuckets = 8)
    val before = bucketFiles(dir)
    assert(before.nonEmpty)

    // update 10 keys (newer version) + 1 new key
    val v2 = ((0L until 10L).map(i => (i, s"P$i", 2L)) :+ (100L, "new", 1L))
      .toDF("id", "payload", "version")
    val touched = v2
      .select(pmod(hash(col("id")), lit(8)).as("b")).distinct()
      .collect().map(r => s"__bucket=${r.getInt(0)}").toSet
    Sinks.upsertByKeyBucketed(spark, v2, dir, Seq("id"), "version", nBuckets = 8)
    val after = bucketFiles(dir)

    // untouched bucket directories keep their exact file sets
    for ((b, files) <- before if !touched(b))
      assert(after(b) == files, s"untouched $b was rewritten")
    // touched buckets were rewritten (file names change with the new job)
    assert(touched.exists(b => before.get(b) != after.get(b)))

    // merge semantics identical to the unbucketed path
    val state = spark.read.parquet(dir)
      .select("id", "payload", "version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val expect = ((10L until 100L).map(i => (i, s"p$i", 1L)) ++
      (0L until 10L).map(i => (i, s"P$i", 2L)) :+ (100L, "new", 1L)).toSet
    assert(state == expect)

    // idempotent re-delivery
    Sinks.upsertByKeyBucketed(spark, v2, dir, Seq("id"), "version", nBuckets = 8)
    assert(spark.read.parquet(dir).count() == 101)

    // layout contract: merging with a different nBuckets would hash keys
    // into the wrong dirs and keep stale rows — must be refused loudly
    val mismatch = intercept[IllegalArgumentException] {
      Sinks.upsertByKeyBucketed(spark, v2, dir, Seq("id"), "version", nBuckets = 16)
    }
    assert(mismatch.getMessage.contains("nBuckets=8"))
  }

  test("K1 compaction: fewer files, identical rows, pruning intact, idempotent") {
    val dir = Files.createTempDirectory("graft_k1c").toString + "/sink"
    val events = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "value")
    // 6 tiny appends → ≥6 files per day partition
    (0 until 6).foreach { i =>
      Sinks.appendPartitioned(events.filter(col("event_id") % 6 === i), "ts", dir)
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def filesPerDay: Map[String, Int] = fs.listStatus(
        new org.apache.hadoop.fs.Path(dir)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("day="))
      .map { d =>
        d.getPath.getName -> fs.listStatus(d.getPath).count { f =>
          f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith(".")
        }
      }.toMap
    val before = filesPerDay
    assert(before.values.forall(_ >= 6))
    val preRows = Sinks.readPartitioned(spark, dir)
      .collect().map(_.toString).sorted.toSeq

    val done = Sinks.compactPartitioned(spark, dir,
      targetBytes = 1L << 30, maxFilesPerPartition = 2)
    assert(done.nonEmpty && done.forall(_._3 == 1),
      s"everything fits one 1GiB target file: $done")
    val after = filesPerDay
    assert(after.keySet == before.keySet, "partition layout must survive")
    assert(after.values.forall(_ == 1), s"uncompacted partitions remain: $after")

    val back = Sinks.readPartitioned(spark, dir)
    assert(back.collect().map(_.toString).sorted.toSeq == preRows,
      "compaction must not change a single row")
    val plan = back.filter(col("day") === "2024-01-05")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day"))

    assert(Sinks.compactPartitioned(spark, dir,
      targetBytes = 1L << 30, maxFilesPerPartition = 2).isEmpty,
      "second compaction must be a no-op")
  }
}
