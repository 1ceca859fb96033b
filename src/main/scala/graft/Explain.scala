package graft

/** Plan diagnostics: `runMain graft.Explain <queryName> [sfDir]` prints
  * the formatted physical plan of a SparkEntry query plus exchange /
  * sort / window / codegen counts — the per-operator feedback loop for
  * the would-this-survive-100TB review (builder brief: iterate on
  * `.explain("formatted")` until the plan is the one you'd want).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_e1_ohlcv_pipeline")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get(4)
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    val plan = df.queryExecution.executedPlan.toString
    def n(p: String) = p.r.findAllIn(plan).length
    println(s"[explain] $name: exchanges=${n("Exchange ")} " +
      s"sorts=${n("\\bSort\\b")} windows=${n("\\bWindow\\b")} " +
      s"wholeStageCodegen=${n("WholeStageCodegen")}")
    spark.stop()
  }
}
