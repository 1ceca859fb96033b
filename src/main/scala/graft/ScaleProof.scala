package graft

/** Standalone scaled-SF execution comparison (VERDICT r5 next #3): the
  * Bench `duckdb_scaled` measurement at an arbitrary multiplier,
  * runnable without the full bench sweep.
  *
  * Usage: `runMain graft.ScaleProof <baseSfDir> <mult>` — generates (or
  * reuses) the key-shifted replica via [[graft.sources.ScaledTables]],
  * times the relational oracle SQLs in DuckDB there (subprocess,
  * tools/time_duckdb.py), measures Spark fresh-lineage execution with
  * separately-timed planning subtracted for the queries where DuckDB
  * itself does >= 0.05s * mult of work, and prints ONE JSON line with
  * the per-query ratios and their median. mult=10 over sf0.1 is the
  * "sf1" point the r5 verdict asked for.
  */
object ScaleProof {
  def main(args: Array[String]): Unit = {
    val baseSf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 10
    val spark = GraftSession.get()
    // full JSON escape incl. control chars — oracle SQL is multi-line
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""

    val scaledDir = graft.sources.ScaledTables.ensure(spark, baseSf, mult)
    val prefixes = Seq("q_s", "q_p", "q_j", "q_u", "q_a", "q_w", "q_g", "q_t", "q_e2", "q_e3")
    val rel = SparkEntry.oracleSql
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
    val tmp = java.nio.file.Files.createTempFile("graft_oracle_scale", ".json")
    java.nio.file.Files.write(tmp,
      rel.toSeq.sortBy(_._1).map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
        .mkString("{", ",", "}").getBytes("UTF-8"))
    // merge stderr into stdout (ADVICE r6): an undrained stderr pipe can
    // fill and deadlock both processes; the regex scan below tolerates
    // any interleaved warning lines.
    val proc = new ProcessBuilder(
      "python3", "tools/time_duckdb.py", scaledDir, tmp.toString)
      .redirectErrorStream(true).start()
    val outS = scala.io.Source.fromInputStream(proc.getInputStream).mkString.trim
    require(proc.waitFor() == 0 && outS.nonEmpty, "time_duckdb.py failed")
    val pair = """"([^"]+)":\s*(-?[0-9.eE+]+)""".r
    val duckSec = pair.findAllMatchIn(outS)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    // heavy at this scale: DuckDB does >= 0.05s of work per base unit
    val heavy = duckSec.toSeq.filter(_._2 >= 0.05 * mult).map(_._1).sorted
    val ratios = heavy.flatMap { n =>
      SparkEntry.freshQueries.get(n).flatMap { fn =>
        try {
          fn(spark, scaledDir).collect() // warm tables/codegen
          val planT = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, scaledDir).queryExecution.executedPlan
            (System.nanoTime() - t0) / 1e9
          }.min
          val callT = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, scaledDir).collect()
            (System.nanoTime() - t0) / 1e9
          }.min
          System.err.println(
            f"[scaleproof] $n duck=${duckSec(n)}%.2fs spark=$callT%.2fs plan=$planT%.2fs")
          Some(n -> (math.max(callT - planT, 1e-4) / duckSec(n)))
        } catch { case _: Throwable => None }
      }
    }
    def med(rs: Seq[Double]): Double = {
      val s = rs.sorted; if (s.isEmpty) -1.0 else s(s.size / 2)
    }
    ScratchCache.drain(spark)
    val perQ = ratios.sortBy(_._1)
      .map { case (k, v) => s"${jstr(k)}:${f"$v%.3f"}" }.mkString("{", ",", "}")
    println(
      s"""{"metric":"scale_proof","base_sf":${jstr(baseSf)},"mult":$mult,""" +
      s""""n_compared":${ratios.size},""" +
      f""""median_ratio_exec_heavy":${med(ratios.map(_._2))}%.3f,""" +
      s""""ratios":$perQ}""")
    spark.stop()
  }
}
