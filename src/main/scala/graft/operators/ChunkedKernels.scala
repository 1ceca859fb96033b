package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ArrayType, DoubleType, StructField, StructType}

import SeriesKernels.{Checkpointable, KernelSpec}

/** SURVEY §7.4's single-colossal-series escape hatch, prototyped (r3):
  * when ONE series is too large for a single sequential task — or arrives
  * endlessly, the streaming case — process it in driver-sequenced,
  * time-ordered CHUNKS, carrying each kernel's O(1) state across chunk
  * boundaries.
  *
  * Chunk j runs the same repartition + sortWithinPartitions +
  * mapPartitions state machines as [[SeriesKernels.applyKernels]], except
  * each series' kernels first `restore` the snapshot taken at the end of
  * chunk j−1 (broadcast from the driver — the carried state is
  * O(series × state doubles), a few bytes per series, never data-sized).
  * The pass emits each series' end-of-chunk snapshot on its LAST row
  * only; the driver collects just those tail rows (#series tiny rows per
  * chunk) to seed chunk j+1. Because restoring the snapshot reproduces
  * the exact arithmetic sequence of the unchunked recursion, stitched
  * outputs are bit-identical to one whole-series pass —
  * ChunkedKernelsSpec asserts this for SES (the 1-state case,
  * reference smoothers.py:27-33) and Kalman (filters.py:8-27).
  *
  * Correctness contract: chunks are non-overlapping, each holds a
  * contiguous time range per series, and chunks arrive in ascending time
  * order — exactly what a day-partitioned sink or a micro-batch sequence
  * already guarantees. Kernels must implement [[Checkpointable]] —
  * every §2.5b recursive kernel does (SES, Kalman, RSI, MACD, EMA, ADX;
  * the wavelet is a global whole-series transform and stays out of
  * scope, SURVEY §7.4). Non-checkpointable specs are rejected up front
  * with a driver-side error naming the offender, not a mid-job executor
  * ClassCastException (ADVICE r3).
  */
object ChunkedKernels {

  /** Runs `specs` (kernels must be [[Checkpointable]]) over each chunk in
    * order, returning the enriched chunks (same appended columns as
    * [[SeriesKernels.applyKernels]]). Each returned chunk is persisted
    * (it is scanned once for its rows and once for its tail states);
    * callers unpersist when done.
    */
  def applyChunked(
      chunks: Seq[DataFrame],
      keyCols: Seq[String],
      orderCols: Seq[String],
      specs: Seq[KernelSpec]): Seq[DataFrame] = {
    val bad = specs.filterNot(_.make().isInstanceOf[Checkpointable])
    require(bad.isEmpty,
      "ChunkedKernels.applyChunked: kernels must be Checkpointable; " +
        s"offending specs (by output cols): ${bad.map(_.outputCols.mkString("/")).mkString(", ")}")
    var carried: Map[Seq[Any], Seq[Array[Double]]] = Map.empty
    chunks.map { chunk =>
      val (enriched, tails) = runChunk(chunk, keyCols, orderCols, specs, carried)
      carried = carried ++ tails
      enriched
    }
  }

  private def runChunk(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      specs: Seq[KernelSpec],
      seed: Map[Seq[Any], Seq[Array[Double]]])
      : (DataFrame, Map[Seq[Any], Seq[Array[Double]]]) = {
    val inSchema = df.schema
    val outCols = specs.flatMap(_.outputCols)
    val stagedSchema = StructType(
      inSchema.fields ++
        outCols.map(c => StructField(c, DoubleType, nullable = true)) :+
        StructField("__state",
          ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false),
          nullable = true))
    val keyIdx = keyCols.map(inSchema.fieldIndex).toArray
    val inIdx = specs.map(_.inputCols.map(inSchema.fieldIndex).toArray).toArray
    val bc = df.sparkSession.sparkContext.broadcast(seed)

    val partitioned = df
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)

    val staged = partitioned.mapPartitions { rows =>
      val it = rows.buffered
      new Iterator[Row] {
        private val kernels =
          specs.map(_.make().asInstanceOf[Checkpointable]).toArray
        private var lastKey: Seq[Any] = null

        override def hasNext: Boolean = it.hasNext

        override def next(): Row = {
          val row = it.next()
          val key = keyIdx.map(row.get).toSeq
          if (key != lastKey) {
            kernels.foreach(_.reset())
            bc.value.get(key).foreach { snaps =>
              var k = 0
              while (k < kernels.length) { kernels(k).restore(snaps(k)); k += 1 }
            }
            lastKey = key
          }
          val out = new Array[Any](stagedSchema.length)
          var i = 0
          while (i < inSchema.length) { out(i) = row.get(i); i += 1 }
          var k = 0
          var o = inSchema.length
          while (k < kernels.length) {
            val idx = inIdx(k)
            val in = new Array[Double](idx.length)
            var j = 0
            while (j < idx.length) {
              in(j) = if (row.isNullAt(idx(j))) Double.NaN else row.getDouble(idx(j))
              j += 1
            }
            val res = kernels(k).step(in)
            var w = 0
            while (w < res.length) {
              out(o) = if (java.lang.Double.isNaN(res(w))) null else res(w)
              o += 1; w += 1
            }
            k += 1
          }
          // the series' last row in this chunk carries the kernel state
          val isLast = !it.hasNext || keyIdx.map(it.head.get).toSeq != key
          out(stagedSchema.length - 1) =
            if (isLast) kernels.map(_.snapshot.toSeq).toSeq else null
          Row.fromSeq(out.toIndexedSeq)
        }
      }
    }(Encoders.row(stagedSchema)).persist()

    val tails = staged
      .filter(col("__state").isNotNull)
      .select((keyCols.map(col) :+ col("__state")): _*)
      .collect()
      .map { r =>
        val key: Seq[Any] = keyCols.indices.map(r.get(_): Any).toList
        val snaps = r
          .getAs[scala.collection.Seq[scala.collection.Seq[Double]]](keyCols.length)
          .map(_.toArray).toSeq
        key -> snaps
      }
      .toMap
    (staged.drop("__state"), tails)
  }
}
