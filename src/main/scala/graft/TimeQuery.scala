package graft

/** Dev utility: warm fresh-lineage timing for individual registered
  * queries — the same discipline as Bench's scaled comparison (warm the
  * tables/codegen once, then best-of-N on FRESH plans, with the
  * separately-measured planning time reported so exec-vs-plan splits are
  * visible) without paying a full bench sweep for one number.
  *
  * Usage: runMain graft.TimeQuery <sfDir> <queryName> [<queryName> ...]
  * `<sfDir>@xN` ensures and times against the N×-replicated copy of the
  * SF (the Bench scaled tiers' corpus), so scaled-tier numbers can be
  * reproduced for one query without a full bench phase.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQuery <sfDir>[@xN] <name> [name ...]")
    val spark = GraftSession.get()
    val dir = args.head.split("@x") match {
      case Array(base, mult) if mult.nonEmpty && mult.forall(_.isDigit) =>
        graft.sources.ScaledTables.ensure(spark, base, mult.toInt)
      case _ => args.head
    }
    args.tail.foreach { name =>
      val fn = SparkEntry.freshQueries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      fn(spark, dir).collect() // warm tables + codegen
      val planT = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).queryExecution.executedPlan
        (System.nanoTime() - t0) / 1e9
      }.min
      val callT = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).collect()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$name: fresh_call=$callT%.3f plan=$planT%.3f " +
        f"exec=${math.max(callT - planT, 0)}%.3f sec")
    }
    spark.stop()
  }
}
