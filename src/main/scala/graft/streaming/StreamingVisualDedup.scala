package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.operators.{MediaRow, Multimodal}

/** Continuous perceptual-media dedup: the streaming form of the
  * incremental image/video/audio near-dup probes — every micro-batch
  * of newly ingested media decodes and signatures ONLY its own
  * payloads and probes the release's persisted perceptual index
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
    // strict kind check first (the StreamingAnnProbe rule): the lenient
    // param check passes silently when the signature column is absent
    graft.operators.Dedup.requireIndexKind(index, "sig", "phash_index",
      "foreachBatchPhashProbe")
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
    graft.operators.Dedup.requireIndexKind(index, "sig", "dhash_index",
      "foreachBatchDhashProbe")
    graft.operators.Dedup.checkIndexMeta(index, "sig", "dhash_index", Map.empty)
    (batch: Dataset[MediaRow], batchId: Long) => {
      implicit val spark = batch.sparkSession
      sink(Multimodal.dhashIncrementalPairs(batch, index, maxHamming), batchId)
    }
  }

  /** foreachBatch body probing the video frame-signature index — the
    * same contract over `video_frame_index` artifacts
    * ([[graft.operators.TrainingPipeline.writeVideoFrameIndex]]): each
    * micro-batch of arriving videos frame-samples and digests ONLY its
    * own payloads ([[Multimodal.frameSample]] with the supplied
    * sampling geometry) and joins the index on the signature; released
    * frame bytes are never re-digested.
    */
  def foreachBatchVideoProbe(
      index: DataFrame,
      frameBytes: Int = 256,
      targetFrames: Int = 8,
      threshold: Double = 0.5)(
      sink: (DataFrame, Long) => Unit): (Dataset[MediaRow], Long) => Unit = {
    graft.operators.Dedup.requireIndexKind(index, "s", "video_frame_index",
      "foreachBatchVideoProbe")
    // sampling-geometry check (the SQ/PQ dim-check discipline): a probe
    // sampling different byte windows than the index build matches zero
    // signatures SILENTLY per batch — fail at setup instead. Lenient on
    // pre-geometry-stamp artifacts (checkIndexMeta skips absent keys).
    graft.operators.Dedup.checkIndexMeta(index, "s", "video_frame_index",
      Map("frameBytes" -> frameBytes.toLong,
        "targetFrames" -> targetFrames.toLong))
    (batch: Dataset[MediaRow], batchId: Long) => {
      implicit val spark = batch.sparkSession
      sink(Multimodal.videoIncrementalPairs(
        Multimodal.frameSampleMedia(batch, frameBytes, targetFrames).toDF(),
        index, threshold = threshold), batchId)
    }
  }

  /** foreachBatch body probing the audio envelope band index — the
    * same contract over `audio_envelope_index` artifacts
    * ([[graft.operators.TrainingPipeline.writeAudioEnvelopeIndex]]):
    * each micro-batch decodes only its own clips (decode is ~70% of
    * the pair query's cost) and probes the banded Hamming join.
    */
  def foreachBatchAudioProbe(
      index: DataFrame,
      maxHamming: Int = 7)(
      sink: (DataFrame, Long) => Unit): (Dataset[MediaRow], Long) => Unit = {
    graft.operators.Dedup.requireIndexKind(index, "sig",
      "audio_envelope_index", "foreachBatchAudioProbe")
    graft.operators.Dedup.checkIndexMeta(index, "sig",
      "audio_envelope_index", Map.empty)
    (batch: Dataset[MediaRow], batchId: Long) => {
      implicit val spark = batch.sparkSession
      sink(Multimodal.audioIncrementalPairs(batch, index, maxHamming), batchId)
    }
  }
}
