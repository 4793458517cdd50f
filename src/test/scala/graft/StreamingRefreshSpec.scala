package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.TrainingPipeline
import graft.streaming.StreamingRefresh

/** The continuous-refresh surface: every micro-batch runs the full
  * refresh chain (corpus dedup, within-batch dedup, decontamination,
  * placement) with the sketch and eval side built once — and the
  * result matches the batch operator per micro-batch exactly.
  */
class StreamingRefreshSpec extends SparkSpec {

  test("streaming refresh matches batch refresh per micro-batch; one-time artifacts reused") {
    import spark.implicits._
    val released = (0 until 200).map(i => (i.toLong, s"released doc $i stable words"))
      .toDF("doc_id", "text")
    val evalDocs = Seq(
      (900L, "secret held out eval question answer pair")).toDF("doc_id", "text")
    // batch 1: fresh docs + a corpus re-crawl + an in-batch duplicate
    val batch1 = Seq(
      (1000L, "fresh crawl first body"),
      (1001L, "fresh crawl second body"),
      (1002L, "fresh crawl second body"),                 // in-batch dup of 1001
      (1003L, "released doc 42 stable words"))            // corpus dup -> drop
    // batch 2: fresh + a contaminated doc; note 2001 repeats batch 1's
    // text — the between-releases contract admits it (released corpus
    // only advances on release boundaries)
    val batch2 = Seq(
      (2000L, "totally new third body"),
      (2001L, "fresh crawl first body"),
      (2002L, "contains held out eval question answer pair leak"))

    val got = scala.collection.mutable.Map[Long, Set[Long]]()
    val body = StreamingRefresh.foreachBatchRefresh(released, evalDocs) {
      (additions, batchId) =>
        got(batchId) = additions.collect().map(_.getLong(0)).toSet
    }
    val input = MemoryStream[(Long, String)](spark, numPartitions = 1)
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .outputMode("append").foreachBatch(body).start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    // per-batch parity vs the batch operator on identical inputs
    val b1 = TrainingPipeline.refresh(released, batch1.toDF("doc_id", "text"), evalDocs)
      .collect().map(_.getLong(0)).toSet
    val b2 = TrainingPipeline.refresh(released, batch2.toDF("doc_id", "text"), evalDocs)
      .collect().map(_.getLong(0)).toSet
    assert(got.values.toSet === Set(b1, b2))
    assert(b1 === Set(1000L, 1001L))
    assert(b2 === Set(2000L, 2001L),
      "between-releases semantics: 2001 is admitted, the contaminated 2002 is not")
  }
}
