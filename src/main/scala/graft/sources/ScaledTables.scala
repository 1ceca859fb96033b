package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Key-shifted replication of a testdata SF into tmp — the scaled corpus
  * behind Bench's `duckdb_scaled` block and the [[graft.ScaleProof]]
  * main (VERDICT r5 next #3: measure, don't assert, that the per-job
  * scheduling floor amortizes with data volume).
  *
  * Each replica is a DISJOINT copy of the base SF: every key column and
  * its foreign-key partners shift together by `replica * 1e9`, so joins
  * stay 1:1 per replica and the join output grows LINEARLY — what real
  * SF growth looks like. Dimension tables (nation, region) are not
  * replicated. Events' TIMESTAMP(NANOS) column (a raw long under
  * nanosAsLong) is re-emitted as micros timestamps so DuckDB can
  * date_trunc it — this corpus is a wall-time instrument, not a hash
  * gate.
  *
  * Layout: a multi-file parquet DIRECTORY per table
  * (`<dir>/<t>.parquet/part-*.parquet`) — a single 100+ MB file is ONE
  * Spark scan split (`files.maxPartitionBytes`), which would serialize
  * the scan while DuckDB parallelizes row groups internally; 16 files
  * give both engines their natural parallelism (tools/time_duckdb.py
  * globs directories). `_SCALED_READY` carries (layout, mult, base row
  * count) so regeneration only happens when the base SF or layout
  * changes.
  */
object ScaledTables {

  private val Shifts: Seq[(String, Seq[String])] = Seq(
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "nation" -> Seq.empty, "region" -> Seq.empty)

  /** Ensure the `mult`-replicated copy of `sfDir` exists; returns its dir. */
  def ensure(spark: SparkSession, sfDir: String, mult: Int): String = {
    val scaledDir = System.getProperty("java.io.tmpdir") +
      s"/graft_sfscaled_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}_x$mult"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val marker = new Path(scaledDir, "_SCALED_READY")
    // v3: embeddings replicate too (vec_id shift) so a FULL-surface
    // correctness sweep — vector family included — can run on the
    // scaled dir (round-10 "sf1" sweep); pre-v3 dirs regenerate.
    val stamp =
      s"v3,mult=$mult,base_lineitem=${Tables.lineitem(spark, sfDir).count()}"
    val current = fs.exists(marker) && {
      val in = fs.open(marker)
      val got = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                finally in.close()
      got == stamp
    }
    if (current) return scaledDir
    fs.delete(new Path(scaledDir), true)
    Shifts.foreach { case (t, keys) =>
      val raw = Tables.load(spark, sfDir, t)
      val base0 =
        if (t == "events" &&
            raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          raw.withColumn("ts",
            expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
        else raw
      val scaledDf =
        if (keys.isEmpty) base0
        else (0 until mult).map { c =>
          keys.foldLeft(base0) { (df, kcol) =>
            df.withColumn(kcol, col(kcol) + lit(c * 1000000000L))
          }
        }.reduce(_ unionByName _)
      val out =
        if (keys.isEmpty) scaledDf.coalesce(1) else scaledDf.repartition(16)
      out.write.mode("overwrite").parquet(s"$scaledDir/$t.parquet")
    }
    val out = fs.create(marker, true)
    try out.write(stamp.getBytes("UTF-8")) finally out.close()
    scaledDir
  }
}
