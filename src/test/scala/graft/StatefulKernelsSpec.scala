package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SeriesKernels.SesKernel
import graft.streaming.StatefulKernels
import graft.streaming.StreamingOps.Ev

/** X2 via typed streaming state: the SES kernel's snapshot as
  * flatMapGroupsWithState state must reproduce the batch kernel run
  * bit-for-bit across micro-batch splits, and redelivered rows must not
  * double-advance the kernel.
  */
class StatefulKernelsSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)

  private def mkRows(users: Int, perUser: Int): Seq[Ev] = {
    val rnd = new scala.util.Random(11)
    (for {
      u <- 0 until users
      i <- 0 until perUser
    } yield Ev(u * 1000L + i, 1700000000000000L + i * 60000000L + u,
      u.toLong, 50.0 + rnd.nextDouble() * 10)).sortBy(_.ts_us)
  }

  private def batchReference(rows: Seq[Ev], alpha: Double): Map[Long, Double] =
    rows.groupBy(_.user_id).flatMap { case (_, evs) =>
      val k = new SesKernel(alpha)
      k.reset()
      evs.sortBy(e => (e.ts_us, e.event_id)).map { e =>
        e.event_id -> k.step(Array(e.value))(0)
      }
    }

  private def runStream(batches: Seq[Seq[Ev]]): Map[Long, Double] = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val source = MemoryStream[Ev]
    val sink = s"ses_sink_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = StatefulKernels.sesStream(source.toDS(), alpha = 0.2)
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    try {
      batches.foreach { b => source.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val out = spark.table(sink).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("y"))
    assert(out.length == out.toMap.size, "each event must be emitted exactly once")
    out.toMap
  }

  test("3-batch stream equals the batch kernel bit-for-bit") {
    val rows = mkRows(users = 6, perUser = 30)
    val got = runStream(rows.grouped(60).toSeq)
    val want = batchReference(rows, 0.2)
    assert(got.keySet == want.keySet)
    assert(got.forall { case (id, y) =>
      val w = want(id)
      (y.isNaN && w.isNaN) || y == w
    }, "streamed SES must equal batch SES exactly")
  }

  test("redelivered and stale rows never double-advance the kernel") {
    val rows = mkRows(users = 3, perUser = 20)
    val (b1, b2) = rows.splitAt(30)
    // batch 3 redelivers all of batch 1 (dup event ids, old timestamps)
    val got = runStream(Seq(b1, b2, b1))
    val want = batchReference(rows, 0.2)
    assert(got.keySet == want.keySet, "dups must be dropped, not re-emitted")
    assert(got.forall { case (id, y) =>
      val w = want(id); (y.isNaN && w.isNaN) || y == w
    })
  }
}
