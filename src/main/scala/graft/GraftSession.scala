package graft

import org.apache.spark.sql.SparkSession

/** Standard session factory: every entry point (Verify, Bench, tests) uses
  * the same config so plans and numeric results are reproducible.
  *
  * Scale notes (targets a 1000-executor cluster even though we test on
  * local[N]):
  *  - `shuffle.partitions` follows the core count locally; on a real
  *    cluster AQE coalesces post-shuffle partitions so the static value
  *    only seeds the initial plan.
  *  - AQE on: runtime re-plan for skew joins + dynamic coalescing.
  *  - UTC session timezone: numeric parity with the DuckDB oracle.
  *  - `nanosAsLong`: the events table carries parquet TIMESTAMP(NANOS)
  *    which Spark has no native type for; we read the raw long and floor
  *    to micros in [[graft.sources.Tables.events]].
  */
object GraftSession {
  def builder(cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def get(cores: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt): SparkSession = {
    val spark = builder(cores).getOrCreate()
    // getOrCreate silently ignores static confs when a session already
    // exists in the JVM; fail loudly instead of computing wrong answers.
    val mustMatch = Seq(
      "spark.sql.session.timeZone" -> "UTC",
      "spark.sql.legacy.parquet.nanosAsLong" -> "true")
    for ((k, want) <- mustMatch) {
      val got = spark.conf.get(k, "")
      require(got == want,
        s"GraftSession: existing SparkSession has $k=$got, need $want — " +
        "stop the stale session before calling GraftSession.get")
    }
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
