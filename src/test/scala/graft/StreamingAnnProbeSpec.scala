package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{PqSearch, SqSearch, TrainingPipeline}
import graft.streaming.{StreamingAnnProbe, VecRow}

/** The streaming ANN-probe surface: per micro-batch the arriving
  * vectors score only themselves against the release's persisted
  * SQ8/PQ code index; the union over batches equals the batch
  * incremental probe on the same inputs (the StreamingVisualDedup
  * parity convention, embedding edition).
  */
class StreamingAnnProbeSpec extends SparkSpec {

  private def vecRows(df: org.apache.spark.sql.DataFrame): Array[VecRow] = {
    import spark.implicits._
    df.select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect()
      .sortBy(_._1).map { case (id, v) => VecRow(id, v) }
  }

  test("streaming SQ8 probe matches the batch incremental operator across batches") {
    import spark.implicits._
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val released = emb.filter(col("vec_id") < 400)
    val batchDf = emb.filter(col("vec_id") >= 400 && col("vec_id") < 420)
    val dir = java.nio.file.Files.createTempDirectory("sap-sq").toString
    TrainingPipeline.writeSqIndex(released, dir)
    val (model, codes) = TrainingPipeline.loadSqIndex(spark, dir)

    val rows = vecRows(batchDf)
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Long)]
    val body = StreamingAnnProbe.foreachBatchSqProbe(model, codes) { (topk, _) =>
      got ++= topk.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      ()
    }
    val input = MemoryStream[VecRow](spark, numPartitions = 1)
    val q = input.toDS().writeStream.outputMode("append")
      .foreachBatch(body).start()
    try {
      input.addData(b1.toSeq: _*)
      q.processAllAvailable()
      input.addData(b2.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val batch = SqSearch.probeSqCodes(batchDf, model, codes)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSet === batch.toSet && batch.nonEmpty,
      "streamed SQ8 top-k union must equal the batch incremental probe")
  }

  test("streaming IVF-PQ probe matches the batch incremental operator across batches") {
    import spark.implicits._
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val released = emb.filter(col("vec_id") < 400)
    val batchDf = emb.filter(col("vec_id") >= 400 && col("vec_id") < 412)
    val dir = java.nio.file.Files.createTempDirectory("sap-pq").toString
    TrainingPipeline.writePqIndex(released, dir)
    val (model, codes) = TrainingPipeline.loadPqIndex(spark, dir)

    val rows = vecRows(batchDf)
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Long)]
    val body = StreamingAnnProbe.foreachBatchPqProbe(model, codes) { (topk, _) =>
      got ++= topk.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      ()
    }
    val input = MemoryStream[VecRow](spark, numPartitions = 1)
    val q = input.toDS().writeStream.outputMode("append")
      .foreachBatch(body).start()
    try {
      input.addData(b1.toSeq: _*)
      q.processAllAvailable()
      input.addData(b2.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val batch = PqSearch.probePqCodes(batchDf, model, codes)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSet === batch.toSet && batch.nonEmpty,
      "streamed PQ top-k union must equal the batch incremental probe")
  }

  test("probe bodies fail fast on a wrong-family index") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 100)
    val sqModel = SqSearch.fitSqModel(emb)
    val sqCodes = SqSearch.encodeSq(emb, sqModel)
    val pqModel = PqSearch.fitPqModel(emb)
    val pqCodes = PqSearch.encodePq(emb, pqModel)
    val e = intercept[IllegalArgumentException] {
      StreamingAnnProbe.foreachBatchSqProbe(sqModel, pqCodes) { (_, _) => () }
    }
    assert(e.getMessage.toLowerCase.contains("sq_codes") ||
      e.getMessage.contains("cd"))
    val e2 = intercept[IllegalArgumentException] {
      StreamingAnnProbe.foreachBatchPqProbe(pqModel, sqCodes) { (_, _) => () }
    }
    assert(e2.getMessage.toLowerCase.contains("pq_codes") ||
      e2.getMessage.contains("codes"))
  }
}
