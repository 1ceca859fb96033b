package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Attribution probe for the streaming-gate harness (r19 VERDICT ask #4:
  * "measure first: if >=50% is clone/replan, reuse one configured gate
  * session"). Runs the six gate queries twice with per-phase wall
  * timings printed, so the fixed cost splits into session-clone,
  * stream-start, per-phase micro-batch, and stop shares.
  * Measurement-only: no declared query is touched.
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t0 = System.nanoTime()
    def secs(s: Long): Double = (System.nanoTime() - s) / 1e9

    val gates = Seq("q_x1_stream_tumbling", "q_x3_stream_dedup",
      "q_x10_stream_join", "q_x11_stream_sliding",
      "q_x12_stream_left_join", "q_x13_stream_session")
    (1 to 2).foreach { rep =>
      val repT = t0
      gates.foreach { name =>
        val s = t0
        val df: DataFrame = SparkEntry.freshQueries(name)(spark, dir)
        val n = df.count()
        println(f"[streamprof] rep$rep $name ${secs(s)}%.2fs rows=$n")
      }
      println(f"[streamprof] rep$rep total ${secs(repT)}%.2fs")
    }

    // fine-grained q_x10 breakdown: clone / start / batch1 / batch2 / stop
    {
      import graft.streaming.StreamingOps.Ev
      import graft.sources.Tables
      import spark.implicits._
      val rows = Tables.events(spark, dir)
        .filter(col("event_id") % 7 === 0)
        .orderBy("event_id").limit(2000)
        .select(col("event_id"),
          expr("(ts_ns - pmod(ts_ns, 1000)) div 1000").as("ts_us"),
          col("user_id"), col("value"))
        .as[Ev].collect().sortBy(e => (e.ts_us, e.event_id)).toSeq
      val left = rows.filter(_.event_id % 2 == 0)
      val right = rows.filter(_.event_id % 2 == 1)
      (1 to 2).foreach { rep =>
        val sC = t0
        val ss = spark.newSession()
        ss.conf.set("spark.sql.session.timeZone",
          spark.conf.get("spark.sql.session.timeZone"))
        ss.conf.set("spark.sql.shuffle.partitions",
          if (rep == 2) "1"
          else math.max(1L, (left.length + right.length) / 1000L).toString)
        val tClone = secs(sC)
        implicit val sq = ss.sqlContext
        val ls = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
        val rs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
        val sink = s"sp_${rep}_${java.util.UUID.randomUUID().toString.take(8).replace("-","")}"
        val sS = t0
        val q = graft.streaming.StreamingOps.intervalJoin(ls.toDF(), rs.toDF())
          .writeStream.format("memory").queryName(sink).outputMode("append").start()
        val tStart = secs(sS)
        val (l1, l2) = left.splitAt(left.length / 2)
        val (r1, r2) = right.splitAt(right.length / 2)
        val sB1 = t0
        ls.addData(l1); rs.addData(r1); q.processAllAvailable()
        val tB1 = secs(sB1)
        val maxUs = (left ++ right).map(_.ts_us).max
        val sentinel = Ev(-1L, maxUs + 10L * 24 * 3600 * 1000000, -1L, 0.0)
        val sB2 = t0
        ls.addData(l2 :+ sentinel); rs.addData(r2 :+ sentinel); q.processAllAvailable()
        val tB2 = secs(sB2)
        q.recentProgress.foreach { p =>
          println(s"[streamprof] x10batch rep$rep batch=${p.batchId} " +
            s"rows=${p.numInputRows} durationMs=${p.durationMs} " +
            s"stateOps=${p.stateOperators.map(so =>
              s"(commit=${so.commitTimeMs}ms mem=${so.memoryUsedBytes})").mkString(",")}")
        }
        val sStop = t0
        q.stop()
        val tStop = secs(sStop)
        val sCol = t0
        val n = ss.table(sink).filter(col("user_id") >= 0).count()
        val tCol = secs(sCol)
        println(f"[streamprof] x10detail rep$rep clone=$tClone%.3f start=$tStart%.3f " +
          f"b1=$tB1%.3f b2=$tB2%.3f stop=$tStop%.3f collect=$tCol%.3f rows=$n")
      }
    }
    spark.stop()
  }
}
