package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query surface is assembled from per-domain packs; each pack row maps
  * one operator of SURVEY.md §2's inventory to a named query, with DuckDB
  * oracle SQL wherever the operator is SQL-expressible.
  */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    TimeSeriesFrameQueries,
    RecursiveKernelQueries,
    TextQueries,
    TextAnalysisQueries,
    VectorQueries,
    DedupQueries,
    ScorerQueries,
    FirKernelQueries,
    PipelineQueries,
    StreamingQueries,
    MultimodalQueries)

  private lazy val all: Seq[QueryDef] = packs.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_j1b_star_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql.stripMargin)).toMap

  /** Headline subset timed by [[Bench]]. */
  def benchQueries: Seq[String] = all.filter(_.bench).map(_.name)
}
