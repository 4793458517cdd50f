package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{TextAnalysis, TrainingPipeline}
import graft.streaming.{QueryTermRow, StreamingRetrievalProbe}

/** The streaming retrieval surface: per micro-batch the arriving
  * (qid, term) queries probe the release's persisted BM25 postings;
  * the union over batches equals the batch incremental probe on the
  * same inputs (the StreamingAnnProbe parity convention, retrieval
  * edition).
  */
class StreamingRetrievalProbeSpec extends SparkSpec {

  test("streaming BM25 probe matches the batch incremental operator across batches") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("srp-bm25").toString
    TrainingPipeline.writeBm25Index(docs, dir)
    val postings = TrainingPipeline.loadBm25Index(spark, dir)

    // probe fixture from the index itself (the ir3 rule): df ranks
    // 2..9 as 2 queries x 4 terms, plus one OOV term that must score 0
    val ranked = postings.select("term", "df").distinct()
      .orderBy(col("df").desc, col("term")).limit(9).collect()
    assert(ranked.length === 9)
    val terms = ranked.iterator.zipWithIndex.drop(1)
      .map { case (r, i) => QueryTermRow((i - 1).toLong / 4, r.getString(0)) }
      .toArray :+ QueryTermRow(2L, "zz~never~a~token~zz")
    val (b1, b2) = terms.splitAt(4)

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Long)]
    val body = StreamingRetrievalProbe.foreachBatchBm25Probe(postings) { (topk, _) =>
      got ++= topk.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      ()
    }
    val input = MemoryStream[QueryTermRow](spark, numPartitions = 1)
    val q = input.toDS().writeStream.outputMode("append")
      .foreachBatch(body).start()
    try {
      input.addData(b1.toSeq: _*)
      q.processAllAvailable()
      input.addData(b2.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    // batch twin per micro-batch slice (equivalently the full batch —
    // the fixture keeps each qid's terms inside one batch, the routing
    // contract a multi-term streaming query rides)
    val batch = Seq(b1, b2).flatMap { bs =>
      TextAnalysis.probeBm25(postings, bs.toSeq.toDF("qid", "term"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    }
    assert(got.toSet === batch.toSet && got.nonEmpty,
      "streamed BM25 top-k union must equal the per-slice batch probes")
  }

  test("probe body fails fast on an unstamped frame") {
    import spark.implicits._
    val fake = Seq(("a", 1L, 1L, 1L, 1L)).toDF("term", "doc_id", "tf", "df", "dl")
    val e = intercept[IllegalArgumentException] {
      StreamingRetrievalProbe.foreachBatchBm25Probe(fake) { (_, _) => () }
    }
    assert(e.getMessage.contains("bm25_postings"))
  }
}
