package graft

/** Builds (or reuses) the key-shifted scaled replica of a testdata SF
  * ([[graft.sources.ScaledTables]]) and prints its directory — the prep
  * step for a full-surface correctness sweep at "sf1" (sf0.1 × 10) via
  * `Verify <scaledDir> <out>` + `tools/check_oracle.py <scaledDir> <out>`
  * (VERDICT r9 stretch #10).
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val baseSf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 10
    val spark = GraftSession.get()
    println(graft.sources.ScaledTables.ensure(spark, baseSf, mult))
    spark.stop()
  }
}
