package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

class RelationalQueriesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get(4)
  val dir = "/root/testdata/sf0.001"

  test("every declared query runs and is non-empty at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("s3 last point is a single row with the global max timestamp") {
    val df = SparkEntry.queries("q_s3_last_point")(spark, dir)
    assert(df.count() == 1)
  }

  test("p6 limit returns exactly 10 ordered orderkeys") {
    val keys = SparkEntry.queries("q_p6_limit")(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(keys.size == 10 && keys == keys.sorted)
  }

  test("a5 value_counts covers all 5 languages") {
    val langs = SparkEntry.queries("q_a5_value_counts")(spark, dir)
      .collect().map(_.getString(0)).toSet
    assert(langs == Set("en", "fr", "es", "zh", "de"))
  }

  test("x8 ohlcv bars: high >= low and high >= open, close") {
    val bad = SparkEntry.queries("q_x8_ohlcv_bars")(spark, dir)
      .filter("high < low OR high < open OR high < close OR low > open OR low > close")
      .count()
    assert(bad == 0)
  }

  test("entry flagship is non-empty") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
