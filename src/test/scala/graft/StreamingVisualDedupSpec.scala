package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{MediaRow, Multimodal}
import graft.streaming.StreamingVisualDedup

/** The streaming visual-dedup surface: per micro-batch the incoming
  * images decode/signature once and probe the release's persisted
  * perceptual-hash band index; the union over batches equals the batch
  * incremental probe on the same inputs (the StreamingDedup parity
  * convention).
  */
class StreamingVisualDedupSpec extends SparkSpec {

  test("streaming phash probe matches the batch incremental operator across batches") {
    implicit val s = spark
    import s.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id").cast("long").as("doc_id"))
    val corpus = Multimodal.syntheticPatternImages(docs.filter(col("doc_id") < 400))
    val batchRows = Multimodal.syntheticPatternImages(
      docs.filter(col("doc_id") >= 400)).collect().sortBy(_.doc_id)
    val (b1, b2) = batchRows.splitAt(batchRows.length / 2)

    val dir = java.nio.file.Files.createTempDirectory("svd-idx").toString
    graft.operators.TrainingPipeline.writePhashIndex(corpus, dir)
    val index = graft.operators.TrainingPipeline.loadPhashIndex(spark, dir)

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    val body = StreamingVisualDedup.foreachBatchPhashProbe(index) { (pairs, _) =>
      got ++= pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      ()
    }
    val input = MemoryStream[MediaRow](spark, numPartitions = 1)
    val q = input.toDS().writeStream.outputMode("append")
      .foreachBatch(body).start()
    try {
      input.addData(b1.toSeq: _*)
      q.processAllAvailable()
      input.addData(b2.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val batch = Multimodal.phashIncrementalPairs(
        Multimodal.syntheticPatternImages(docs.filter(col("doc_id") >= 400)), index)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSet === batch.toSet && batch.nonEmpty,
      "streamed pair union must equal the batch incremental probe")
  }

  test("streaming video probe matches the batch incremental operator across batches") {
    implicit val s = spark
    import s.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
    val vids = Multimodal.asMediaTable(
      Multimodal.syntheticVideoDocs(docs.select("doc_id")))
    def frames(d: org.apache.spark.sql.Dataset[MediaRow]) =
      Multimodal.frameSampleMedia(d, frameBytes = 16, targetFrames = 64).toDF()
    val corpus = vids.filter(col("doc_id") < 400)
    // the index records the geometry its frames were sampled with — a
    // probe with different geometry must fail at setup (case below)
    val index = Multimodal.videoFrameIndex(frames(corpus),
      frameBytes = 16, targetFrames = 64)
    val batchRows = vids.filter(col("doc_id") >= 400).collect().sortBy(_.doc_id)
    val (b1, b2) = batchRows.splitAt(batchRows.length / 2)

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val body = StreamingVisualDedup.foreachBatchVideoProbe(
        index, frameBytes = 16, targetFrames = 64) { (pairs, _) =>
      got ++= pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      ()
    }
    val input = MemoryStream[MediaRow](spark, numPartitions = 1)
    val q = input.toDS().writeStream.outputMode("append")
      .foreachBatch(body).start()
    try {
      input.addData(b1.toSeq: _*)
      q.processAllAvailable()
      input.addData(b2.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val batch = Multimodal.videoIncrementalPairs(
        frames(vids.filter(col("doc_id") >= 400)), index)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSet === batch.toSet && batch.nonEmpty,
      "streamed video pair union must equal the batch incremental probe")
  }

  test("video probe with mismatched sampling geometry fails at setup, not per batch") {
    implicit val s = spark
    val docs = graft.sources.Tables.documents(spark, sf)
    val vids = Multimodal.asMediaTable(
      Multimodal.syntheticVideoDocs(docs.select("doc_id").limit(20)))
    val index = Multimodal.videoFrameIndex(
      Multimodal.frameSampleMedia(vids, frameBytes = 16, targetFrames = 64).toDF(),
      frameBytes = 16, targetFrames = 64)
    // a probe sampling different byte windows would digest different
    // signatures and match ZERO index rows silently per batch — the
    // geometry stamp turns that into a setup-time failure
    val e = intercept[IllegalArgumentException] {
      StreamingVisualDedup.foreachBatchVideoProbe(
        index, frameBytes = 256, targetFrames = 8) { (_, _) => () }
    }
    assert(e.getMessage.contains("frameBytes") ||
      e.getMessage.contains("targetFrames"))
  }

  test("streaming audio probe matches the batch incremental operator across batches") {
    implicit val s = spark
    import s.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
    val clips = Multimodal.syntheticPatternAudio(docs.select("doc_id"))
    val index = Multimodal.audioEnvelopeIndex(clips.filter(col("doc_id") < 400))
    val batchRows = clips.filter(col("doc_id") >= 400).collect().sortBy(_.doc_id)
    val (b1, b2) = batchRows.splitAt(batchRows.length / 2)

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    val body = StreamingVisualDedup.foreachBatchAudioProbe(index) { (pairs, _) =>
      got ++= pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      ()
    }
    val input = MemoryStream[MediaRow](spark, numPartitions = 1)
    val q = input.toDS().writeStream.outputMode("append")
      .foreachBatch(body).start()
    try {
      input.addData(b1.toSeq: _*)
      q.processAllAvailable()
      input.addData(b2.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val batch = Multimodal.audioIncrementalPairs(
        clips.filter(col("doc_id") >= 400), index)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSet === batch.toSet && batch.nonEmpty,
      "streamed audio pair union must equal the batch incremental probe")
  }

  test("probe bodies fail fast on a wrong-family index") {
    implicit val s = spark
    import s.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id").cast("long").as("doc_id")).limit(50)
    val dIdx = Multimodal.dhashIndex(Multimodal.syntheticPatternImages(docs))
    val e = intercept[IllegalArgumentException] {
      StreamingVisualDedup.foreachBatchPhashProbe(dIdx) { (_, _) => () }
    }
    assert(e.getMessage.contains("phash_index"))
    val pIdx = Multimodal.phashIndex(Multimodal.syntheticPatternImages(docs))
    val e2 = intercept[IllegalArgumentException] {
      StreamingVisualDedup.foreachBatchDhashProbe(pIdx) { (_, _) => () }
    }
    assert(e2.getMessage.contains("dhash_index"))
  }
}
