package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.operators.{MediaRow, Multimodal}

/** Continuous visual dedup: the streaming form of the incremental
  * image near-dup probes — every micro-batch of newly ingested images
  * decodes and signatures ONLY its own payloads and probes the
  * release's persisted perceptual-hash band index
  * ([[graft.operators.TrainingPipeline.writeDhashIndex]] /
  * [[graft.operators.TrainingPipeline.writePhashIndex]]), emitting
  * (da = released image, db = batch image, hamming) rows for the sink
  * to act on (drop, review-queue, cluster).
  *
  * Amortization contract (the [[StreamingRefresh]] discipline): the
  * index is decoded and signatured ONCE at release time; per batch the
  * released images are touched only through the (band, byte) equi-join
  * against the loaded index frame — never re-decoded, never shuffled
  * corpus-side beyond the band join. Cross-batch duplicates (new vs
  * new) are the release-time batch operator's job
  * ([[Multimodal.phashPairs]]); the query restarts with a rebuilt
  * index on release boundaries.
  */
object StreamingVisualDedup {

  /** foreachBatch body probing the pHash (DCT) index — use with
    * `stream.writeStream.foreachBatch(...)`. `index` must be a
    * kind-stamped `phash_index` frame ([[Multimodal.phashIndex]] or
    * [[graft.operators.TrainingPipeline.loadPhashIndex]]); a foreign
    * index fails fast at setup, not silently per batch.
    */
  def foreachBatchPhashProbe(
      index: DataFrame,
      maxHamming: Int = 7)(
      sink: (DataFrame, Long) => Unit): (Dataset[MediaRow], Long) => Unit = {
    graft.operators.Dedup.checkIndexMeta(index, "sig", "phash_index", Map.empty)
    (batch: Dataset[MediaRow], batchId: Long) => {
      implicit val spark = batch.sparkSession
      sink(Multimodal.phashIncrementalPairs(batch, index, maxHamming), batchId)
    }
  }

  /** foreachBatch body probing the dHash (gradient) index — the same
    * contract over `dhash_index` artifacts.
    */
  def foreachBatchDhashProbe(
      index: DataFrame,
      maxHamming: Int = 7)(
      sink: (DataFrame, Long) => Unit): (Dataset[MediaRow], Long) => Unit = {
    graft.operators.Dedup.checkIndexMeta(index, "sig", "dhash_index", Map.empty)
    (batch: Dataset[MediaRow], batchId: Long) => {
      implicit val spark = batch.sparkSession
      sink(Multimodal.dhashIncrementalPairs(batch, index, maxHamming), batchId)
    }
  }
}
