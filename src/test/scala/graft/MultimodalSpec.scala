package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalOps
import graft.sources.Tables

/** Contract for the multimodal decode stage (the FakeCodec stub carries
  * no oracle; the plumbing invariants live here).
  */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)
  private val sf = "/root/testdata/sf0.001"

  private lazy val decoded = MultimodalOps.decodeStage(
    Tables.documents(spark, sf).withColumn("payload", col("text").cast("binary")),
    "payload").cache()

  test("decode stage appends the fixed feature schema to every row") {
    assert(decoded.columns.takeRight(5).toSeq ==
      Seq("width", "height", "channels", "mean_byte", "byte_entropy"))
    assert(decoded.count() == Tables.documents(spark, sf).count())
    assert(decoded.filter(col("width").isNull || col("mean_byte").isNull).isEmpty)
  }

  test("decoded features are deterministic and in-range") {
    val a = decoded.select("doc_id", "width", "height", "mean_byte").collect().toSeq
    val b = MultimodalOps.decodeStage(
      Tables.documents(spark, sf).withColumn("payload", col("text").cast("binary")),
      "payload").select("doc_id", "width", "height", "mean_byte").collect().toSeq
    assert(a.map(_.toSeq).toSet == b.map(_.toSeq).toSet)
    assert(decoded.filter(col("width") < 64 || col("width") >= 1344
      || col("height") < 64 || col("height") >= 784
      || col("mean_byte") < 0 || col("mean_byte") > 255
      || col("byte_entropy") < 0 || col("byte_entropy") > 8).isEmpty)
  }

  test("frame sampling emits every stride-th frame with full frames only") {
    val frames = MultimodalOps.sampleFrames(
      Tables.documents(spark, sf).withColumn("payload", col("text").cast("binary")),
      "payload", frameSize = 64, stride = 4)
    assert(frames.filter(col("frame_idx") % 4 =!= 0).isEmpty)
    assert(frames.filter(length(col("frame")) =!= 64).isEmpty)
    // frame count per doc = ceil(n_full_frames / stride)
    val bad = frames.groupBy("doc_id").count()
      .join(Tables.documents(spark, sf), "doc_id")
      .withColumn("n_frames", floor(length(col("text")) / 64))
      .filter(col("count") =!= ceil(col("n_frames") / 4.0).cast("long")
        && col("n_frames") > 0)
    assert(bad.isEmpty)
  }
}
