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
  * Deployment notes: the static confirm side re-plans per micro-batch,
  * so pass an already-deduplicated corpus (run [[graft.operators.Dedup.exact]]
  * once) and persist it; the sketch goes stale as the corpus grows —
  * restart the query with a rebuilt sketch on corpus releases (false
  * negatives cannot occur for the corpus the sketch was built from,
  * and new-corpus misses only ever ADMIT a candidate to the exact
  * confirm, never produce a wrong result).
  */
object StreamingDedup {

  def knownDuplicates(
      corpus: DataFrame,
      stream: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      fpp: Double = 0.01,
      expectedItems: Long = -1L): DataFrame = {
    val expected =
      if (expectedItems > 0) expectedItems else math.max(corpus.count(), 1L)
    val bf = corpus.select(xxhash64(col(textCol)).as("h"))
      .stat.bloomFilter("h", expected, fpp)
    val bytes = graft.functions.BloomMightContain.serialize(bf)
    val candidates = stream.filter(
      graft.functions.GraftFunctions.bloom_might_contain(
        lit(bytes), xxhash64(col(textCol))))
    candidates
      .join(corpus.select(col(textCol)), Seq(textCol), "left_semi")
      .select(col(idCol), md5(col(textCol)).as("h"))
  }
}
