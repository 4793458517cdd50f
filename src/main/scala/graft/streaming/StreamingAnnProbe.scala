package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.operators.{Dedup, PqSearch, SqSearch}

/** A streamed query/ingest vector — the embedding-family analog of
  * [[graft.operators.MediaRow]] for MemoryStream/Kafka sources.
  */
final case class VecRow(vec_id: Long, embedding: Array[Double])

/** Continuous ANN probing: the streaming form of the incremental
  * embedding-index probes — every micro-batch of arriving vectors
  * scores ONLY itself against the release's persisted compressed index
  * ([[graft.operators.TrainingPipeline.writeSqIndex]] /
  * [[graft.operators.TrainingPipeline.writePqIndex]]), emitting
  * (qid, rnk, vec_id, adist_micro) top-k rows for the sink to act on
  * (near-dup drop, retrieval, hard-negative mining).
  *
  * Amortization contract (the [[StreamingVisualDedup]] discipline,
  * embedding edition): the quantizer fits and the corpus encodes ONCE
  * at release; per batch the released vectors are touched only through
  * the code frame's ADC scan — never re-encoded, never re-read in
  * float form. Batches are independent (the probe is stateless against
  * a frozen index), so per-batch output equals the batch operator run
  * on the same rows — spec-pinned. The query restarts with a rebuilt
  * index on release boundaries, exactly like the visual-dedup and
  * refresh streams.
  */
object StreamingAnnProbe {

  /** foreachBatch body probing the SQ8 code index — use with
    * `stream.writeStream.foreachBatch(...)`. `codes` must be a
    * kind-stamped `sq_codes` frame matching `model`'s dim
    * ([[SqSearch.encodeSq]] or
    * [[graft.operators.TrainingPipeline.loadSqIndex]]); a foreign or
    * re-dimensioned index fails fast at setup, not silently per batch.
    */
  def foreachBatchSqProbe(
      model: SqSearch.SqModel,
      codes: DataFrame,
      topK: Int = 10)(
      sink: (DataFrame, Long) => Unit): (Dataset[VecRow], Long) => Unit = {
    // requireIndexKind, not the lenient param check: a frame missing
    // the code column entirely (e.g. a PQ index handed to the SQ probe)
    // must fail here at setup, not per batch with an analysis error
    Dedup.requireIndexKind(codes, "cd", "sq_codes", "foreachBatchSqProbe")
    Dedup.checkIndexMeta(codes, "cd", "sq_codes",
      Map("dim" -> model.dim.toLong))
    (batch: Dataset[VecRow], batchId: Long) =>
      sink(SqSearch.probeSqCodes(batch.toDF(), model, codes, topK), batchId)
  }

  /** foreachBatch body probing the IVF-PQ code index — the same
    * contract over `pq_codes` artifacts ([[PqSearch.probePqCodes]]:
    * coarse cells prune to nProbe, ADC scores within).
    */
  def foreachBatchPqProbe(
      model: PqSearch.PqModel,
      codes: DataFrame,
      nProbe: Int = 4,
      topK: Int = 10)(
      sink: (DataFrame, Long) => Unit): (Dataset[VecRow], Long) => Unit = {
    Dedup.requireIndexKind(codes, "codes", "pq_codes", "foreachBatchPqProbe")
    Dedup.checkIndexMeta(codes, "codes", "pq_codes",
      Map("m" -> model.m.toLong,
        "k" -> model.books.map(_.length).max.toLong,
        "nClusters" -> model.nClusters.toLong,
        "dim" -> model.dim.toLong))
    (batch: Dataset[VecRow], batchId: Long) =>
      sink(PqSearch.probePqCodes(batch.toDF(), model, codes, nProbe, topK),
        batchId)
  }
}
