package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query of the engine's public surface.
  *
  * @param build  Spark-side implementation; `dir` is a testdata sf directory.
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same parquet
  *               tables (tables registered by bare name). None for operators
  *               with no SQL equivalent (recursive kernels, UDF scorers) —
  *               the driver then records a weaker rows-only check.
  * @param bench  include in the Bench headline set.
  *
  * Numeric-parity rules used throughout (so the driver's hash compare is
  * stable across engines):
  *  - money-style sums: per-term `CAST(expr AS DECIMAL(18,4))` then SUM
  *    (exact, order-independent), result cast back to DOUBLE;
  *  - quantity-like sums of integer-valued doubles: plain SUM (exact);
  *  - window averages/medians: round(_, 6);
  *  - timestamps in outputs: formatted `yyyy-MM-dd HH:mm:ss` strings
  *    (events.ts is nanos in DuckDB but micros in Spark);
  *  - every result set carries a deterministic total ORDER BY.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

trait QueryPack {
  def queries: Seq[QueryDef]
}
