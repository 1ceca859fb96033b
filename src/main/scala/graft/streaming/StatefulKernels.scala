package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.SeriesKernels.{Checkpointable, SesKernel}

/** Recursive kernels as STREAMING state — the typed
  * `KeyValueGroupedDataset.flatMapGroupsWithState` realization of X2's
  * incremental tick, complementing the `foreachBatch` component
  * ([[IncrementalTick]]): instead of re-reading a sink tail each batch,
  * the kernel's O(1) [[Checkpointable]] snapshot (a few doubles) IS the
  * streaming state, checkpointed by the engine with the query.
  *
  * Scale shape: state is hash-partitioned by series key across executors
  * like any streaming aggregation; per-key state is a fixed-size double
  * vector (SES: 3 doubles) independent of history length, so a million
  * series cost a few MB of state store. Within a micro-batch a group's
  * rows are sorted by (ts_us, event_id) in memory — bounded by per-key
  * per-batch volume, the same bound any stateful streaming op carries.
  *
  * Determinism/redelivery: rows at-or-below the per-key high-water mark
  * (`lastTs`) are dropped, so duplicate delivery and batch re-processing
  * cannot double-advance the kernel — the streaming output equals the
  * batch kernel run over the deduped in-order series bit-for-bit
  * (StatefulKernelsSpec).
  */
object StatefulKernels {

  /** Per-key state: kernel snapshot + event-time high-water mark. */
  final case class KState(snap: Array[Double], lastTs: Long)

  final case class KernelOut(
      user_id: Long, ts_us: Long, event_id: Long, value: Double, y: Double)

  /** SES(alpha) over a stream of [[StreamingOps.Ev]] rows, keyed by
    * user_id; emits one row per accepted input row with the smoothed
    * value (NaN while the kernel warms up ⇒ filter on isNaN downstream).
    */
  def sesStream(stream: Dataset[StreamingOps.Ev], alpha: Double = 0.2): Dataset[KernelOut] =
    kernelStream(stream, () => new SesKernel(alpha))

  /** Generic: any single-input/single-output [[Checkpointable]] kernel
    * family member as streaming state. */
  def kernelStream(
      stream: Dataset[StreamingOps.Ev],
      make: () => Checkpointable): Dataset[KernelOut] = {
    implicit val stateEnc: Encoder[KState] = Encoders.product[KState]
    implicit val outEnc: Encoder[KernelOut] = Encoders.product[KernelOut]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    stream.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[StreamingOps.Ev], state: GroupState[KState]) =>
          val kernel = make()
          kernel.reset()
          val prior = state.getOption
          prior.foreach(s => kernel.restore(s.snap))
          var lastTs = prior.map(_.lastTs).getOrElse(Long.MinValue)
          val out = rows.toIndexedSeq.sortBy(e => (e.ts_us, e.event_id))
            .flatMap { e =>
              if (e.ts_us <= lastTs) None
              else {
                lastTs = e.ts_us
                val y = kernel.step(Array(e.value))(0)
                Some(KernelOut(uid, e.ts_us, e.event_id, e.value, y))
              }
            }
          state.update(KState(kernel.snapshot, lastTs))
          out.iterator
      }
  }
}
