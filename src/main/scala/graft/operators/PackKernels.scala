package graft.operators

import graft.operators.SeriesKernels.Checkpointable

/** Greedy sequence packing for training-data assembly: documents are
  * filled into fixed token-budget packs in deterministic (shard, doc_id)
  * order; a document that would overflow the current pack starts a new
  * one (documents larger than the budget get a pack of their own).
  *
  * This is the standard pre-tokenization packing pass of an LLM data
  * pipeline (the reference pipeline stops at scoring — packing is part of
  * the builder brief's "operations a large-scale training-data pipeline
  * would need"). The recurrence (current pack's running total) depends on
  * the previous *output*, so like the R-kernels it cannot be a bounded
  * window frame; it runs on the [[SeriesKernels.applyKernels]] path —
  * one shuffle on the shard key, then O(1)-state sequential fill within
  * each shard. Parallelism is across shards: a 100 TB corpus packs with
  * whatever shard fan-out the hash gives it, and the assignment is
  * reproducible because order and shard are content/id-derived, not
  * partition-dependent.
  *
  * State is two counters, exported via [[SeriesKernels.Checkpointable]]
  * so a colossal shard can be chunk-stitched like any other kernel.
  */
object PackKernels {

  /** Emits (pack_id, cum_tok) per document: pack_id is the 0-based pack
    * index within the shard, cum_tok the pack's running token total
    * after placing this document.
    */
  final class GreedyPackKernel(budget: Long) extends Checkpointable {
    val arity = 1; val width = 2
    private var pack = 0L
    private var cum = 0L
    def reset(): Unit = { pack = 0L; cum = 0L }
    def snapshot: Array[Double] = Array(pack.toDouble, cum.toDouble)
    def restore(s: Array[Double]): Unit = { pack = s(0).toLong; cum = s(1).toLong }
    def step(in: Array[Double]): Array[Double] = {
      val tok = in(0).toLong
      if (cum > 0 && cum + tok > budget) { pack += 1; cum = 0 }
      cum += tok
      Array(pack.toDouble, cum.toDouble)
    }
  }
}
