package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * r13 (VERDICT r12 next #1 — the r12 driver round left CORRECTNESS_r12
  * empty after its wall budget died): two budget fixes.
  *  - `oracle_sql.json` is written FIRST, so a Verify killed mid-run
  *    leaves the oracle map plus every already-dumped query dir — a
  *    partial correctness gate instead of `{}`.
  *  - queries dump CONCURRENTLY (SPARK_GRAFT_VERIFY_PAR threads, default
  *    6; 1 restores the serial path). Spark job submission is
  *    thread-safe, every query writes its own output dir, and the
  *    engine-side memo caches are lock-guarded — the win is overlapping
  *    each query's driver-side planning/coalesce latency with the
  *    others' execution, which dominates wall time at sf0.01 where per
  *    query work is small (the serial sweep paid ~139 back-to-back
  *    plan→execute→write round-trips).
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional 3rd+ args: only dump queries whose name starts with one of
    // these prefixes (local dev loop; the driver always passes 2 args).
    val prefixes = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.get(cpus)
    dump(spark, sfDir, outDir, prefixes.toSeq)
    spark.stop()
  }

  /** The dump body, callable in-process (Bench's sf1_sweep phase reuses
    * it against the x10 replica without forking a JVM). Returns the
    * number of selected queries. */
  def dump(spark: SparkSession, sfDir: String, outDir: String,
      prefixes: Seq[String] = Nil): Int = {
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      prefixes.isEmpty || prefixes.exists(name.startsWith)
    }.toSeq.sortBy(_._1)
    val par = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "6").toInt)
    // total-wall deadline, same discipline as Bench (VERDICT r13 next
    // #1c): on a contended-enough box a full dump could outlive the
    // driver's round budget — past the deadline the remaining queries
    // are skipped (each logged) and the process exits 0 with every
    // already-dumped dir intact, instead of being killed mid-write.
    // Default 1800 s is ~20x the quiet full-surface wall (~80 s).
    val deadlineSec =
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_DEADLINE_S", "1800").toInt
    val queue = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]()
    selected.foreach(queue.add)
    // The deadline gates STARTING a query, not a running one (Spark jobs
    // aren't interrupted mid-flight), so each worker stops dequeuing a
    // margin before the deadline — the margin is the worst single-query
    // wall this surface shows under heavy contention (~2 min), which is
    // what keeps an almost-expired run from launching `par` more
    // long-runners that the driver's outer `timeout` would then kill
    // mid-write. An individual pathological query can still overrun;
    // the already-dumped dirs stay intact either way.
    // clamp to half the deadline (ADVICE r14 #1): a deadline at or below
    // the default 120 s margin would otherwise skip EVERY query at t=0
    // and exit 0 with an empty gate — under a short deadline, letting
    // early queries start is strictly better than a silent no-op run
    val startMarginSec = math.min(
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_START_MARGIN_S", "120").toInt,
      deadlineSec / 2)
    val t0All = System.nanoTime()
    def worker(): Unit = {
      var next = queue.poll()
      while (next != null) {
        val (name, fn) = next
        if ((System.nanoTime() - t0All) / 1e9 > deadlineSec - startMarginSec) {
          System.err.println(s"[verify] $name skipped: within " +
            s"${startMarginSec}s of deadline ${deadlineSec}s " +
            "(SPARK_GRAFT_VERIFY_DEADLINE_S / _START_MARGIN_S)")
        } else {
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            System.err.println(
              f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1fs")
          } catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
        }
        next = queue.poll()
      }
    }
    val threads = (1 to par).map { i =>
      val t = new Thread(() => worker(), s"verify-$i")
      t.setDaemon(true)
      t.start()
      t
    }
    threads.foreach(_.join())
    System.err.println(
      f"[verify] done: ${selected.size} queries in " +
        f"${(System.nanoTime() - t0All) / 1e9}%.1fs (par=$par)")
    selected.size
  }
}
