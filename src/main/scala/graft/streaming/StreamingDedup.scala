package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming-side incremental dedup against a historical corpus: the
  * continuous-ingest form of [[graft.operators.Dedup.bloomPrefilterDedup]]
  * — "is this incoming document already in the released dataset",
  * answered inside a Structured Streaming query.
  *
  * Shape: the Bloom sketch of corpus content hashes is built ONCE,
  * batch-side (a distributed treeAggregate over the corpus), and
  * embedded in the streaming plan as a literal — the codegen'd
  * [[graft.functions.BloomMightContain]] probe then runs as a NARROW
  * filter on the stream's hot path, so at 1% fpp ~99% of genuinely-new
  * documents are decided without touching the corpus at all. Only the
  * surviving candidates (true dups + fpp stragglers) enter the
  * stream-static semi-join that confirms exactly (clearing Bloom false
  * positives and xxhash64 collisions) — result semantics are identical
  * to the batch operator, spec-pinned by a MemoryStream parity test.
  *
  * Two forms, same result semantics (both parity spec-pinned):
  *   - [[knownDuplicates]] — fully declarative stream-static form. The
  *     confirm is a stream-static semi-join whose static side re-plans
  *     per micro-batch: fine while the corpus text column is modest
  *     (it is scanned, and for a large corpus SHUFFLED, each batch) —
  *     the simple form for small reference corpora.
  *   - [[foreachBatchDedup]] — the SCALE form: each micro-batch runs
  *     the batch operator's broadcast-candidate confirm
  *     ([[graft.operators.Dedup.bloomPrefilterDedupWithSketch]]), so
  *     the corpus is scanned narrowly but NEVER shuffled per batch —
  *     the same plan shape the batch dd7 fix established, with the
  *     sketch still built exactly once at query setup.
  *
  * Deployment notes: pass an already-deduplicated corpus (run
  * [[graft.operators.Dedup.exact]] once) and persist it; the sketch
  * goes stale as the corpus grows — restart the query with a rebuilt
  * sketch on corpus releases (false negatives cannot occur for the
  * corpus the sketch was built from, and new-corpus misses only ever
  * ADMIT a candidate to the exact confirm, never produce a wrong
  * result).
  */
object StreamingDedup {

  /** Declarative stream-static form. SCALE GUARD: Structured Streaming
    * re-plans the stream-static semi-join every micro-batch, and the
    * STATIC side shuffles each time — acceptable for a small reference
    * corpus, a scale-killer for a large one. The guard refuses a
    * static side above `maxStaticRows` (measured from the same count
    * the sketch sizing already takes; pass `expectedItems` to skip the
    * count) and steers to [[foreachBatchDedup]], whose confirm
    * broadcasts the candidate set and never shuffles the corpus.
    */
  def knownDuplicates(
      corpus: DataFrame,
      stream: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      fpp: Double = 0.01,
      expectedItems: Long = -1L,
      maxStaticRows: Long = 10000000L): DataFrame = {
    val n = if (expectedItems > 0) expectedItems else math.max(corpus.count(), 1L)
    require(n <= maxStaticRows,
      s"knownDuplicates shuffles its $n-row static corpus on EVERY micro-batch " +
        s"(> maxStaticRows=$maxStaticRows); use foreachBatchDedup, whose " +
        "broadcast-candidate confirm never shuffles the corpus")
    val sketch = graft.operators.Dedup.contentSketch(corpus, textCol, fpp, n)
    val candidates = stream.filter(
      graft.functions.GraftFunctions.bloom_might_contain(
        lit(sketch), xxhash64(col(textCol))))
    candidates
      .join(corpus.select(col(textCol)), Seq(textCol), "left_semi")
      .select(col(idCol), md5(col(textCol)).as("h"))
  }

  /** The corpus-never-shuffled form: returns a foreachBatch body that
    * applies the batch confirm to every micro-batch and hands the
    * result to `sink`. The sketch is built ONCE, here; use as
    * `stream.writeStream.foreachBatch(StreamingDedup.foreachBatchDedup(corpus)(sink))`.
    */
  def foreachBatchDedup(
      corpus: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      fpp: Double = 0.01,
      expectedItems: Long = -1L)(
      sink: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    val sketch = graft.operators.Dedup.contentSketch(corpus, textCol, fpp, expectedItems)
    (batch: DataFrame, batchId: Long) =>
      sink(graft.operators.Dedup.bloomPrefilterDedupWithSketch(
        corpus, batch, idCol, textCol, sketch), batchId)
  }
}
