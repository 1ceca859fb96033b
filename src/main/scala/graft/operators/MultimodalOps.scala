package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for a training-data pipeline (builder
  * brief): image/audio/video payloads ride through the engine as opaque
  * `binary` columns with typed metadata structs; decode / feature
  * extraction runs as a BATCHED per-partition stage.
  *
  * The actual codec step is a STUB by design — this container has no
  * image/audio libraries — implemented as [[FakeCodec]], a deterministic
  * stand-in behind the same interface a real decoder (JavaCPP/FFmpeg,
  * javax.imageio, …) would use: bytes in → fixed-schema features out.
  * Everything AROUND the stub is real and tested: the binary schema, the
  * batch shape (one codec instance per partition, amortized init — the
  * mapPartitions analog of `mapInPandas` batch semantics), partition
  * sizing, and the pure-column ops (metadata extraction, frame
  * sampling/slicing) that don't need a codec at all.
  *
  * Scale: payload bytes never shuffle in any of these ops — metadata
  * extraction and frame sampling are narrow projections; the decode
  * stage is a map over the scan. `spark.sql.files.maxPartitionBytes`
  * governs batch size; a real deployment stores payloads in parquet
  * binary columns (or pointers to object storage) exactly like this.
  */
object MultimodalOps {

  /** Codec interface: one instance per partition (amortizes model/codec
    * init, the expensive part of real decoders). */
  trait Codec extends Serializable {
    def open(): Unit
    def decode(payload: Array[Byte]): DecodedFeatures
  }

  /** Fixed decode output schema (the contract a real codec honors). */
  final case class DecodedFeatures(
      width: Int, height: Int, channels: Int,
      meanByte: Double, byteEntropy: Double)

  /** Deterministic stand-in codec: "dimensions" derived from the payload
    * hash, statistics computed from the real bytes. A real image decoder
    * plugs in behind [[Codec]] without touching the pipeline. */
  final class FakeCodec extends Codec {
    private var opened = false
    def open(): Unit = { opened = true }
    def decode(payload: Array[Byte]): DecodedFeatures = {
      require(opened, "codec not opened")
      var h = 7L
      var sum = 0L
      val hist = new Array[Long](256)
      var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xff
        h = (h * 31 + b) % 2147483647L
        sum += b
        hist(b) += 1
        i += 1
      }
      val n = math.max(payload.length, 1)
      var ent = 0.0
      var k = 0
      while (k < 256) {
        if (hist(k) > 0) {
          val p = hist(k).toDouble / n
          ent -= p * math.log(p) / math.log(2.0)
        }
        k += 1
      }
      DecodedFeatures(
        width = (h % 1280 + 64).toInt,
        height = ((h / 1280) % 720 + 64).toInt,
        channels = 3,
        meanByte = sum.toDouble / n,
        byteEntropy = ent)
    }
  }

  private val decodedSchema = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false),
    StructField("byte_entropy", DoubleType, nullable = false)))

  /** The batched decode stage: appends the decode-feature columns by
    * running `codec` over each partition (one `open()` per partition —
    * the batch-amortization contract). `payloadCol` must be binary.
    */
  def decodeStage(df: DataFrame, payloadCol: String,
      makeCodec: () => Codec = () => new FakeCodec): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ decodedSchema.fields)
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      val codec = makeCodec()
      codec.open()
      rows.map { r =>
        val f = codec.decode(
          if (r.isNullAt(payloadIdx)) Array.emptyByteArray
          else r.getAs[Array[Byte]](payloadIdx))
        // Seq[Any]: a plain Seq would unify Int/Double via weak
        // conformance and widen the Ints, breaking the schema
        Row.fromSeq(r.toSeq ++ Seq[Any](f.width, f.height, f.channels, f.meanByte, f.byteEntropy))
      }
    }(Encoders.row(outSchema))
  }

  /** Frame sampling over a "video" payload: fixed-size frames, keep every
    * `stride`-th frame starting at 0 — pure column ops (substring on
    * binary), no codec, no shuffle. Emits one row per sampled frame.
    */
  def sampleFrames(df: DataFrame, payloadCol: String, frameSize: Int,
      stride: Int): DataFrame = {
    val nFrames = floor(length(col(payloadCol)).cast("double") / frameSize).cast("int")
    df.withColumn("__n_frames", nFrames)
      .withColumn("frame_idx",
        explode(filter(
          sequence(lit(0), greatest(col("__n_frames") - 1, lit(0))),
          i => i % stride === 0 && i < col("__n_frames"))))
      .withColumn("frame",
        expr(s"substring($payloadCol, frame_idx * $frameSize + 1, $frameSize)"))
      .drop("__n_frames")
  }
}
