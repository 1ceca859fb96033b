package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

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
      // custom codegen'd expressions (see graft.functions) — injected via
      // the public extensions API so they're usable from spark.sql too.
      .withExtensions { ext =>
        ext.injectFunction((
          FunctionIdentifier("graft_polyhash"),
          new ExpressionInfo(classOf[graft.functions.PolyHash].getName, "graft_polyhash"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
            graft.functions.PolyHash(children.head)))
        ext.injectFunction((
          FunctionIdentifier("graft_hash_embed"),
          new ExpressionInfo(classOf[graft.functions.HashEmbed].getName, "graft_hash_embed"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
            val dim = children.lift(1) match {
              case Some(org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _)) => v
              case None => 16
              case other => throw new IllegalArgumentException(
                s"graft_hash_embed(th[, dim]): dim must be an int literal, got $other")
            }
            graft.functions.HashEmbed(children.head, dim)
          }))
        ext.injectFunction((
          FunctionIdentifier("graft_minhash"),
          new ExpressionInfo(classOf[graft.functions.MinHashSig].getName, "graft_minhash"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
            graft.functions.MinHashSig(children.head)))
        ext.injectFunction((
          FunctionIdentifier("graft_shingle_hash"),
          new ExpressionInfo(classOf[graft.functions.ShingleHash].getName, "graft_shingle_hash"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
            val n = children.lift(1) match {
              case Some(org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _)) => v
              case None => 3
              case other => throw new IllegalArgumentException(
                s"graft_shingle_hash(toks[, n]): n must be an int literal, got $other")
            }
            graft.functions.ShingleHash(children.head, n)
          }))
        ext.injectFunction((
          FunctionIdentifier("graft_lexcount"),
          new ExpressionInfo(classOf[graft.functions.TokenLexCount].getName, "graft_lexcount"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
            graft.functions.TokenLexCount(children.head)))
        ext.injectFunction((
          FunctionIdentifier("graft_topk"),
          new ExpressionInfo(classOf[graft.functions.TopKByScore].getName, "graft_topk"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
            val k = children.lift(2) match {
              case Some(org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _)) => v
              case None => 10
              case other => throw new IllegalArgumentException(
                s"graft_topk(score, id[, k]): k must be an int literal, got $other")
            }
            graft.functions.TopKByScore(children(0), children(1), k)
          }))
        ext.injectFunction((
          FunctionIdentifier("graft_token_hashes"),
          new ExpressionInfo(classOf[graft.functions.TokenHashes].getName, "graft_token_hashes"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
            graft.functions.TokenHashes(children.head)))
      }
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
