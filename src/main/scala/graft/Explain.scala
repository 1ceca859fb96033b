package graft

/** Plan diagnostics: `runMain graft.Explain <queryName> [sfDir]` prints
  * the formatted physical plan of a SparkEntry query plus exchange /
  * sort / window / codegen counts — the per-operator feedback loop for
  * the would-this-survive-100TB review (builder brief: iterate on
  * `.explain("formatted")` until the plan is the one you'd want).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = if (args.isEmpty) Seq("q_e1_ohlcv_pipeline")
      else args.filter(_.startsWith("q_")).toSeq
    val sfDir = args.find(a => !a.startsWith("q_")).getOrElse("/root/testdata/sf0.001")
    val full = sys.env.get("GRAFT_EXPLAIN_FULL").contains("1")
    val spark = GraftSession.get(4)
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      // execute first: under AQE the unexecuted plan prints as a bare
      // `AdaptiveSparkPlan isFinalPlan=false` wrapper — no codegen
      // stars, no final exchanges — so every count read as zero.
      // collect() runs on the Dataset's OWN QueryExecution (a noop
      // write would build a new one and leave this plan unexecuted);
      // Explain runs at sf0.001 where every result is small.
      df.collect()
      if (full) df.explain("formatted")
      // the executed adaptive plan prints "== Final Plan ==" followed by
      // "== Initial Plan ==" — count only the final section
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      def n(p: String) = p.r.findAllIn(plan).length
      val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toSeq.distinct
      println(s"[explain] $name: exchanges=${n("Exchange ")} " +
        s"sorts=${n("\\bSort\\b")} windows=${n("\\bWindow\\b")} " +
        s"broadcasts=${n("BroadcastExchange")} " +
        s"wholeStageCodegen=${n("\\*\\(\\d+\\)")} " +
        pushed.mkString(" | "))
    }
    spark.stop()
  }
}
