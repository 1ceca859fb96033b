package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalOps
import graft.sources.Tables

/** Contract for the multimodal GRFT encode/decode stage: round-trip
  * header fidelity, batch-amortized codec init, fail-loudly on
  * malformed containers, and the frame-sampling invariants. The decode
  * values themselves are oracle-checked by q_mm2.
  */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get(4)
  private val sf = "/root/testdata/sf0.001"

  private def encoded() = Tables.documents(spark, sf)
    .withColumn("payload", MultimodalOps.grftEncode(
      col("doc_id") % 1280 + 64, col("doc_id") % 720 + 64,
      col("text").cast("binary")))
    .select(col("doc_id"), col("text"), col("payload"))

  private lazy val decoded = MultimodalOps.decodeStage(encoded(), "payload").cache()

  test("decode stage appends the fixed feature schema to every row") {
    assert(decoded.columns.takeRight(6).toSeq ==
      Seq("width", "height", "channels", "payload_bytes", "mean_byte", "byte_entropy"))
    assert(decoded.count() == Tables.documents(spark, sf).count())
    assert(decoded.filter(col("width").isNull || col("mean_byte").isNull).isEmpty)
  }

  test("header round-trips: decoded fields equal the encode inputs") {
    val bad = decoded.filter(
      col("width") =!= (col("doc_id") % 1280 + 64).cast("int") ||
      col("height") =!= (col("doc_id") % 720 + 64).cast("int") ||
      col("channels") =!= 3 ||
      col("payload_bytes") =!= length(col("text").cast("binary")))
    assert(bad.isEmpty, bad.limit(3).collect().mkString(";"))
  }

  test("decoded statistics are deterministic and in-range") {
    val a = decoded.select("doc_id", "mean_byte", "byte_entropy").collect().toSeq
    val b = MultimodalOps.decodeStage(encoded(), "payload")
      .select("doc_id", "mean_byte", "byte_entropy").collect().toSeq
    assert(a.map(_.toSeq).toSet == b.map(_.toSeq).toSet)
    assert(decoded.filter(
      col("mean_byte") < 0 || col("mean_byte") > 255
      || col("byte_entropy") < 0 || col("byte_entropy") > 8).isEmpty)
  }

  test("malformed containers fail loudly, not silently") {
    val truncated = encoded()
      .withColumn("payload", expr("substring(payload, 1, 8)"))
    val exTrunc = intercept[org.apache.spark.SparkException] {
      MultimodalOps.decodeStage(truncated, "payload").count()
    }
    assert(exTrunc.getMessage.contains("GRFT") ||
      Option(exTrunc.getCause).exists(_.getMessage.contains("GRFT")))
    val badMagic = encoded()
      .withColumn("payload",
        concat(lit("XXXX").cast("binary"), expr("substring(payload, 5)")))
    val exMagic = intercept[org.apache.spark.SparkException] {
      MultimodalOps.decodeStage(badMagic, "payload").count()
    }
    assert(exMagic.getMessage.contains("GRFT") ||
      Option(exMagic.getCause).exists(_.getMessage.contains("GRFT")))
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
