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

  test("restart from a written release: zero setup jobs before the first batch") {
    import spark.implicits._
    val released = (0 until 200).map(i => (i.toLong, s"released doc $i stable words"))
      .toDF("doc_id", "text")
    val evalDocs = Seq(
      (900L, "secret held out eval question answer pair")).toDF("doc_id", "text")
    val batch = Seq(
      (1000L, "fresh crawl first body"),
      (1003L, "released doc 42 stable words"),             // corpus dup -> drop
      (1004L, "contains held out eval question answer pair leak")) // leak -> drop
    // cold baseline (what a restart previously had to pay): result set +
    // evidence that building the artifacts costs Spark jobs
    val cold = TrainingPipeline.refresh(released, batch.toDF("doc_id", "text"), evalDocs)
      .collect().map(_.getLong(0)).toSet
    assert(cold === Set(1000L))

    // release-time: persist the sketch + prepared eval side
    val releaseDir = java.nio.file.Files.createTempDirectory("graft-release").toString
    TrainingPipeline.writeRefreshArtifacts(released, evalDocs, releaseDir)

    // "restart": a fresh query builds its per-batch closure from the
    // release directory — audit every job between load and first batch
    spark.catalog.clearCache()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (js.stageInfos.nonEmpty)
          jobs.add(js.stageInfos.maxBy(_.stageId).name)
    }
    val sc = spark.sparkContext
    sc.addSparkListener(listener)
    val got = scala.collection.mutable.Map[Long, Set[Long]]()
    try {
      val body = graft.streaming.StreamingRefresh.foreachBatchRefreshFromRelease(
        released, releaseDir) { (additions, batchId) =>
        got(batchId) = additions.collect().map(_.getLong(0)).toSet
      }
      // drain the listener bus, then assert NOTHING ran during setup:
      // the under-cap artifacts load is one driver file read + a
      // broadcast — no corpus scan, no eval scan, no job at all
      var spins = 0
      while (spins < 20) { Thread.sleep(50); spins += 1 }
      import scala.jdk.CollectionConverters._
      assert(jobs.asScala.toSeq.isEmpty,
        s"restart setup must run zero jobs, saw: ${jobs.asScala.toSeq}")

      val input = MemoryStream[(Long, String)](spark, numPartitions = 1)
      val q = input.toDS().toDF("doc_id", "text").writeStream
        .outputMode("append").foreachBatch(body).start()
      try {
        input.addData(batch: _*)
        q.processAllAvailable()
      } finally q.stop()
    } finally sc.removeSparkListener(listener)
    // parity: the restarted query's first batch matches the cold result
    assert(got.values.toSet === Set(cold))
  }

  test("full-screen restart: near-dup batch doc drops via the persisted band index") {
    import spark.implicits._
    val released = (0 until 200).map(i => (i.toLong, s"released doc $i stable words"))
      .toDF("doc_id", "text")
    val evalDocs = Seq(
      (900L, "secret held out eval question answer pair")).toDF("doc_id", "text")
    val batch = Seq(
      (1000L, "fresh crawl first body"),
      (1001L, "released doc 42 stable words extra"), // NEAR-dup (J=0.75), not exact
      (1003L, "released doc 42 stable words"))       // exact corpus dup
    // plain refresh keeps the near-dup (only exact text matches drop)
    val plain = TrainingPipeline.refresh(
        released, batch.toDF("doc_id", "text"), evalDocs)
      .collect().map(_.getLong(0)).toSet
    assert(plain === Set(1000L, 1001L))

    val dir = java.nio.file.Files.createTempDirectory("graft-release-nd").toString
    TrainingPipeline.writeRefreshArtifacts(released, evalDocs, dir)
    TrainingPipeline.writeMinhashBands(released, dir)
    spark.catalog.clearCache()

    val got = scala.collection.mutable.Map[Long, Set[Long]]()
    val body = graft.streaming.StreamingRefresh
      .foreachBatchRefreshNearDupFromRelease(released, dir) {
        (additions, batchId) =>
          got(batchId) = additions.collect().map(_.getLong(0)).toSet
      }
    val input = MemoryStream[(Long, String)](spark, numPartitions = 1)
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .outputMode("append").foreachBatch(body).start()
    try {
      input.addData(batch: _*)
      q.processAllAvailable()
    } finally q.stop()
    // the near-dup stage removes 1001; parity with the batch composition
    assert(got.values.toSet === Set(Set(1000L)))
    val batchForm = TrainingPipeline.refreshWithNearDup(
        released, batch.toDF("doc_id", "text"), evalDocs,
        graft.operators.Dedup.minhashBands(released))
      .collect().map(_.getLong(0)).toSet
    assert(batchForm === Set(1000L))
  }

  test("refreshObserved: stage counts pin every drop, output equals plain refresh") {
    import spark.implicits._
    val released = (0 until 100).map(i => (i.toLong, s"released doc $i stable words"))
      .toDF("doc_id", "text")
    val evalDocs = Seq(
      (900L, "secret held out eval question answer pair")).toDF("doc_id", "text")
    val batch = Seq(
      (1000L, "fresh crawl first body"),
      (1001L, "fresh crawl first body"),                    // in-batch dup
      (1003L, "released doc 42 stable words"),              // corpus dup
      (1004L, "contains held out eval question answer pair leak")) // leak
      .toDF("doc_id", "text")
    val (placed, m) = TrainingPipeline.refreshObserved(released, batch, evalDocs)
    val ids = placed.collect().map(_.getLong(0)).toSet
    assert(ids === Set(1000L))
    assert(m.counts === Seq(
      "batch" -> 4L, "fresh" -> 3L, "repr" -> 2L, "placed" -> 1L))
    // tapped form returns exactly what the plain form returns
    val plain = TrainingPipeline.refresh(released, batch, evalDocs)
      .collect().map(_.getLong(0)).toSet
    assert(plain === ids)
  }

  test("over-cap artifacts round-trip: bloom + shingle parquet, same refresh result") {
    import spark.implicits._
    val released = (0 until 100).map(i => (i.toLong, s"released doc $i stable words"))
      .toDF("doc_id", "text")
    val evalDocs = Seq(
      (900L, "secret held out eval question answer pair")).toDF("doc_id", "text")
    val batch = Seq(
      (1000L, "fresh crawl first body"),
      (1004L, "contains held out eval question answer pair leak")).toDF("doc_id", "text")
    val cold = TrainingPipeline.refresh(released, batch, evalDocs)
      .collect().map(_.getLong(0)).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-release-oc").toString
    // cap 0 forces the distributed eval side: bloom bytes + shingle parquet
    TrainingPipeline.writeRefreshArtifacts(released, evalDocs, dir,
      maxCollectedShingles = 0L)
    spark.catalog.clearCache()
    val (sketch, prepared) = TrainingPipeline.loadRefreshArtifacts(spark, dir)
    val warm = TrainingPipeline.refresh(released, batch, spark.emptyDataFrame,
        corpusSketch = Some(sketch), preparedEval = Some(prepared))
      .collect().map(_.getLong(0)).toSet
    assert(warm === cold)
    assert(warm === Set(1000L))
  }
}
