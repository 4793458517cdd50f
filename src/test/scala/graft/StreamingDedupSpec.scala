package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Dedup
import graft.streaming.StreamingDedup

/** The streaming incremental-dedup surface: the Bloom sketch built
  * batch-side filters the stream's hot path, and the result matches the
  * batch operator exactly on the same inputs.
  */
class StreamingDedupSpec extends SparkSpec {

  test("streaming bloom dedup matches the batch operator exactly across batches") {
    import spark.implicits._
    val corpus = (0 until 300).map(i => (i.toLong, s"corpus doc $i unique words"))
      .toDF("doc_id", "text")
    // two micro-batches: fresh docs + planted corpus copies in each
    val batch1 = (1000 until 1200).map(i => (i.toLong, s"new doc $i other words")) ++
      Seq(5L, 17L).map(i => (2000L + i, s"corpus doc $i unique words"))
    val batch2 = (1200 until 1400).map(i => (i.toLong, s"new doc $i other words")) ++
      Seq(123L).map(i => (2000L + i, s"corpus doc $i unique words"))

    val input = MemoryStream[(Long, String)](spark, numPartitions = 1)
    val out = StreamingDedup.knownDuplicates(corpus, input.toDF().toDF("doc_id", "text"))
    // the codegen'd sketch probe must sit in the streaming plan as a
    // narrow filter (the hot path never waits on the confirm join)
    assert(out.queryExecution.analyzed.toString.contains("bloom_might_contain"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("stream_dedup").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_dedup").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val batch = Dedup.bloomPrefilterDedup(
        corpus, (batch1 ++ batch2).toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamed === batch,
        "streaming result must equal the batch operator on identical inputs")
      assert(streamed.map(_._1) === Set(2005L, 2017L, 2123L))
    } finally q.stop()
  }

  test("knownDuplicates refuses a static corpus above maxStaticRows") {
    import spark.implicits._
    val corpus = (0 until 50).map(i => (i.toLong, s"corpus doc $i"))
      .toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)](spark, numPartitions = 1)
    val ex = intercept[IllegalArgumentException] {
      StreamingDedup.knownDuplicates(
        corpus, input.toDF().toDF("doc_id", "text"), maxStaticRows = 10L)
    }
    assert(ex.getMessage.contains("foreachBatchDedup"),
      "the guard must steer to the corpus-never-shuffled form")
    // expectedItems skips the count but still trips the guard
    val ex2 = intercept[IllegalArgumentException] {
      StreamingDedup.knownDuplicates(
        corpus, input.toDF().toDF("doc_id", "text"),
        expectedItems = 100L, maxStaticRows = 10L)
    }
    assert(ex2.getMessage.contains("micro-batch"))
  }

  test("foreachBatch form (corpus never shuffled) matches the declarative form") {
    import spark.implicits._
    val corpus = (0 until 300).map(i => (i.toLong, s"corpus doc $i unique words"))
      .toDF("doc_id", "text")
    val batch1 = (1000 until 1100).map(i => (i.toLong, s"new doc $i other words")) ++
      Seq(7L, 42L).map(i => (3000L + i, s"corpus doc $i unique words"))
    val batch2 = Seq(250L).map(i => (3000L + i, s"corpus doc $i unique words"))
    val got = scala.collection.mutable.Set[(Long, String)]()
    val body = StreamingDedup.foreachBatchDedup(corpus) { (out, _) =>
      got ++= out.collect().map(r => (r.getLong(0), r.getString(1)))
    }
    val input = MemoryStream[(Long, String)](spark, numPartitions = 1)
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append").foreachBatch(body).start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val batchRes = Dedup.bloomPrefilterDedup(
        corpus, (batch1 ++ batch2).toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got.toSet === batchRes)
      assert(got.map(_._1).toSet === Set(3007L, 3042L, 3250L))
    } finally q.stop()
  }
}
