package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.operators.{Dedup, TextAnalysis}

/** A streamed retrieval query term — BM25 queries arrive as
  * (qid, term) rows, exactly the shape [[TextAnalysis.probeBm25]]
  * scores (multi-term queries are simply several rows per qid inside
  * one batch).
  */
final case class QueryTermRow(qid: Long, term: String)

/** Continuous retrieval: the streaming form of the incremental BM25
  * probe (ir3) — every micro-batch of arriving queries scores ONLY
  * itself against the release's persisted postings index
  * ([[graft.operators.TrainingPipeline.writeBm25Index]]), emitting
  * (qid, rnk, doc_id, bm25_micro) top-k rows.
  *
  * Amortization contract (the [[StreamingAnnProbe]] discipline,
  * retrieval edition): the corpus tokenizes, counts and joins ONCE at
  * release; per batch the released text is touched only through the
  * postings equi-join against the broadcast batch terms — never
  * re-tokenized. Corpus stats ride the index stamp, so a batch costs
  * zero build jobs. Batches are independent (stateless probe of a
  * frozen index), so per-batch output equals the batch operator on the
  * same rows — spec-pinned. The query restarts with a rebuilt index on
  * release boundaries.
  */
object StreamingRetrievalProbe {

  /** foreachBatch body probing the BM25 postings index — use with
    * `stream.writeStream.foreachBatch(...)`. `postings` must carry the
    * `bm25_postings` stamp ([[TextAnalysis.bm25Postings]] or
    * [[graft.operators.TrainingPipeline.loadBm25Index]]); a foreign
    * frame fails fast here at setup, not per batch.
    */
  def foreachBatchBm25Probe(
      postings: DataFrame,
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 10)(
      sink: (DataFrame, Long) => Unit): (Dataset[QueryTermRow], Long) => Unit = {
    Dedup.requireIndexKind(postings, "tf", "bm25_postings",
      "foreachBatchBm25Probe")
    (batch: Dataset[QueryTermRow], batchId: Long) =>
      sink(TextAnalysis.probeBm25(postings, batch.toDF(), k1, b, topK),
        batchId)
  }
}
