package graft

import graft.operators.{PqSearch, Similarity}
import graft.sources.Tables

class PqSearchSpec extends SparkSpec {

  lazy val emb = Tables.embeddings(spark, sf).cache()
  private val qids = Seq(0L, 1L, 2L, 3L, 4L)

  test("pqTopK: hand-computed fixture (init-only codebooks, tie rules)") {
    import spark.implicits._
    // dim 4, m=2 (subDim 2), k=2, iters=1 -> codebooks are the two
    // smallest ids' subvectors verbatim:
    //   sub0: code0=[0,0] (id0), code1=[1,0] (id1)
    //   sub1: code0=[10,10], code1=[10,10] (identical -> ties to code0)
    val df = Seq(
      (0L, Array(0.0, 0.0, 10.0, 10.0)),
      (1L, Array(1.0, 0.0, 10.0, 10.0)),
      (2L, Array(5.0, 5.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val out = PqSearch.pqTopK(df, queryIds = Seq(0L), m = 2, k = 2, iters = 1)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // encodes: id1 -> (code1, code0); id2 -> sub0 d(c0)=50 > d(c1)=41
    // -> (code1, code0). q0 tables: sub0 [0, 1e6], sub1 [0, 0].
    // Both score 1_000_000; the tie breaks to the lower vec_id.
    assert(out.toSeq === Seq(
      (0L, 1, 1L, 1000000L),
      (0L, 2, 2L, 1000000L)))
  }

  test("pqTopK: useful recall against exact squared-L2 top-10") {
    // exact L2 top-10 (PQ approximates L2, not cosine - compare like
    // with like), computed in-memory at spec scale
    val all = emb.selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val exact: Map[Long, Set[Long]] = qids.map { q =>
      val qv = all.find(_._1 == q).get._2
      q -> all.filter(_._1 != q).map { case (id, v) => (sq(qv, v), id) }
        .sortBy(identity).take(10).map(_._2).toSet
    }.toMap
    val pq = PqSearch.pqTopK(emb, qids).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val recalls = qids.map { q =>
      (exact(q) intersect pq.getOrElse(q, Set.empty)).size.toDouble / 10.0
    }
    val mean = recalls.sum / recalls.size
    // 4x3-bit codes is a coarse quantizer; it must still clearly beat
    // the random baseline (10/N ~ 5%) on near-orthogonal data
    assert(mean >= 0.25, s"mean PQ recall@10 too low: $mean (per-query $recalls)")
  }

  test("ivfPqTopK: probing ALL cells reproduces pqTopK exactly") {
    // with nProbe = nClusters the coarse quantizer prunes nothing, and
    // with the fit sample covering the whole corpus the driver-side
    // codebook fit must land on the same round-6 codebooks as pqTopK's
    // distributed fit — so the composed index degrades EXACTLY to PQ
    val pq = PqSearch.pqTopK(emb, qids).orderBy("qid", "rnk").collect().toSeq
    val ivfpq = PqSearch.ivfPqTopK(emb, qids, nProbe = 16, nClusters = 16)
      .orderBy("qid", "rnk").collect().toSeq
    assert(ivfpq === pq)
  }

  test("ivfPqTopK: results are a subset of each query's probed cells") {
    import spark.implicits._
    val cs = graft.operators.IvfSearch.fitCentroids(
      emb.selectExpr("cast(vec_id as long) as id",
        "cast(embedding as array<double>) as v")
        .as[(Long, Array[Double])],
      nClusters = 16, lloydIter = 3, fitSampleMod = 1L)
    val cells = emb.selectExpr("cast(vec_id as long) as id",
        "cast(embedding as array<double>) as v")
      .as[(Long, Array[Double])]
      .map { case (id, v) => (id, graft.operators.IvfSearch.nearestCell(v, cs)) }
      .collect().toMap
    val qProbe = qids.map { q =>
      q -> graft.operators.IvfSearch.probeCellsOf(
        emb.filter(s"vec_id = $q").selectExpr("cast(embedding as array<double>)")
          .collect().head.getSeq[Double](0).toArray, cs, 4).toSet
    }.toMap
    PqSearch.ivfPqTopK(emb, qids).collect().foreach { r =>
      val (q, v) = (r.getLong(0), r.getLong(2))
      assert(qProbe(q).contains(cells(v)),
        s"result $v for query $q sits outside its probed cells")
    }
  }

  test("pq index artifacts: save/load round-trip, probe equals in-session") {
    import graft.operators.{PqSearch, TrainingPipeline}
    import org.apache.spark.sql.functions.{col, max}
    val n = emb.agg(max(col("vec_id").cast("long"))).head().getLong(0) + 1
    val cut = 4 * n / 5
    val released = emb.filter(col("vec_id") < cut)
    val batch = emb.filter(col("vec_id") >= cut)
    val dir = java.nio.file.Files.createTempDirectory("pq-release").toString
    TrainingPipeline.writePqIndex(released, dir)
    val (model, codes) = TrainingPipeline.loadPqIndex(spark, dir)
    // the binary model round-trips order-exact
    val live = PqSearch.fitPqModel(released)
    assert(model.centroids.map(_.toSeq).toSeq === live.centroids.map(_.toSeq).toSeq)
    assert(model.books.map(_.map { case (c, v) => (c, v.toSeq) }.toSeq).toSeq ===
      live.books.map(_.map { case (c, v) => (c, v.toSeq) }.toSeq).toSeq)
    // probing the loaded artifact = probing the in-session index
    val a = PqSearch.probePqCodes(batch, model, codes)
      .orderBy("qid", "rnk").collect().toSeq
    val b = PqSearch.probePqCodes(batch, live, PqSearch.encodePq(released, live))
      .orderBy("qid", "rnk").collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("streaming PQ probe: per-micro-batch parity vs the batch probe, index loaded once") {
    import spark.implicits._
    import graft.operators.{PqSearch, TrainingPipeline}
    import org.apache.spark.sql.functions.{col, max}
    // release: fit + encode + persist ONCE; the stream only probes
    val n = emb.agg(max(col("vec_id").cast("long"))).head().getLong(0) + 1
    val cut = 4 * n / 5
    val released = emb.filter(col("vec_id") < cut)
    val dir = java.nio.file.Files.createTempDirectory("pq-stream").toString
    TrainingPipeline.writePqIndex(released, dir)
    val (model, codes) = TrainingPipeline.loadPqIndex(spark, dir)
    val batchRows = emb.filter(col("vec_id") >= cut)
      .selectExpr("cast(vec_id as long)", "cast(embedding as array<double>)")
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    val (b1, b2) = batchRows.splitAt(batchRows.length / 2)

    def rowSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val got = scala.collection.mutable.Map[Long, Set[(Long, Int, Long, Long)]]()
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Double])](spark, numPartitions = 1)
    val q = input.toDS().toDF("vec_id", "embedding").writeStream
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        got(batchId) = rowSet(PqSearch.probePqCodes(df, model, codes))
        ()
      }.start()
    try {
      input.addData(b1.toSeq: _*); q.processAllAvailable()
      input.addData(b2.toSeq: _*); q.processAllAvailable()
    } finally q.stop()

    def batchProbe(rows: Array[(Long, Array[Double])]) =
      rowSet(PqSearch.probePqCodes(
        rows.toSeq.toDF("vec_id", "embedding"), model, codes))
    assert(got(0L) === batchProbe(b1) && got(0L).nonEmpty)
    assert(got(1L) === batchProbe(b2) && got(1L).nonEmpty)
  }

  test("probePqCodes: mismatched index parameters fail fast") {
    import graft.operators.PqSearch
    val codes8 = PqSearch.encodePq(emb, PqSearch.fitPqModel(emb, m = 8))
    val model4 = PqSearch.fitPqModel(emb, m = 4)
    val err = intercept[IllegalArgumentException] {
      PqSearch.probePqCodes(emb.filter("vec_id < 5"), model4, codes8)
    }
    assert(err.getMessage.contains("mismatch"))
  }

  test("probePqCodes: mismatched k (codebook size) fails fast") {
    import graft.operators.PqSearch
    // same m/nClusters/dim, different per-subspace codebook size: codes
    // encoded against k=8 books hold code values a k=4 probe model has
    // no table rows for — must fail at the metadata check, not at
    // executor time with an ArrayIndexOutOfBounds / wrong distance
    val codes8 = PqSearch.encodePq(emb, PqSearch.fitPqModel(emb, k = 8))
    val modelK4 = PqSearch.fitPqModel(emb, k = 4)
    val err = intercept[IllegalArgumentException] {
      PqSearch.probePqCodes(emb.filter("vec_id < 5"), modelK4, codes8)
    }
    assert(err.getMessage.contains("'k'"), err.getMessage)
  }

  test("probePqCodes: over-cap distributed fallback is row-identical to the broadcast path") {
    import org.apache.spark.sql.functions.{col, max}
    val n = emb.agg(max(col("vec_id").cast("long"))).head().getLong(0) + 1
    val cut = 4 * n / 5
    val released = emb.filter(col("vec_id") < cut)
    val batch = emb.filter(col("vec_id") >= cut)
    val model = PqSearch.fitPqModel(released)
    val codes = PqSearch.encodePq(released, model).cache()
    try {
      val viaDriver = PqSearch.probePqCodes(batch, model, codes)
        .orderBy("qid", "rnk").collect().toSeq
      // cap of 1 row forces every multi-row batch onto the relational
      // ADC fallback — same integer sums, same tie order, so the two
      // paths must agree row for row
      val viaJoin = PqSearch.probePqCodes(batch, model, codes,
          maxDriverBatchRows = 1)
        .orderBy("qid", "rnk").collect().toSeq
      assert(viaJoin === viaDriver && viaJoin.nonEmpty)
    } finally { codes.unpersist(); () }
  }

  test("residual IVF-PQ: recall >= the non-residual index at equal code budget") {
    // the point of by_residual=true: the same m x k codebooks quantize
    // x - centroid(cell(x)) instead of x, spending resolution on local
    // structure — on the exact-L2 panel the residual layout must not
    // lose recall vs the non-residual layout at identical pruning
    val exact = Similarity.bruteForceTopKL2(emb, queryIds = qids)
    def meanRecall(approx: org.apache.spark.sql.DataFrame): Double = {
      val r = Similarity.annRecall(exact, approx, k = 10).collect()
      r.map(_.getAs[Double]("recall_at_10")).sum / r.length
    }
    val res = meanRecall(PqSearch.ivfPqResidualTopK(emb, qids))
    val plain = meanRecall(PqSearch.ivfPqTopK(emb, qids))
    assert(res >= plain,
      s"residual recall $res fell below non-residual $plain")
  }

  test("probePqCodesResidual: over-cap distributed fallback is row-identical") {
    import org.apache.spark.sql.functions.{col, max}
    val n = emb.agg(max(col("vec_id").cast("long"))).head().getLong(0) + 1
    val cut = 4 * n / 5
    val released = emb.filter(col("vec_id") < cut)
    val batch = emb.filter(col("vec_id") >= cut)
    val model = PqSearch.fitPqModelResidual(released)
    val codes = PqSearch.encodePqResidual(released, model).cache()
    try {
      val viaDriver = PqSearch.probePqCodesResidual(batch, model, codes)
        .orderBy("qid", "rnk").collect().toSeq
      val viaJoin = PqSearch.probePqCodesResidual(batch, model, codes,
          maxDriverBatchRows = 1)
        .orderBy("qid", "rnk").collect().toSeq
      assert(viaJoin === viaDriver && viaJoin.nonEmpty)
    } finally { codes.unpersist(); () }
  }

  test("residual codes are kind-stamped: a non-residual probe fails fast") {
    import graft.operators.PqSearch
    val model = PqSearch.fitPqModelResidual(emb)
    val resCodes = PqSearch.encodePqResidual(emb, model)
    val err = intercept[IllegalArgumentException] {
      PqSearch.probePqCodes(emb.filter("vec_id < 5"), model, resCodes)
    }
    assert(err.getMessage.contains("kind mismatch"), err.getMessage)
  }

  test("pqTopK: deterministic across runs; distances ranked ascending") {
    val a = PqSearch.pqTopK(emb, qids).orderBy("qid", "rnk").collect().toSeq
    val b = PqSearch.pqTopK(emb, qids).orderBy("qid", "rnk").collect().toSeq
    assert(a === b)
    a.groupBy(_.getLong(0)).values.foreach { rows =>
      val ds = rows.sortBy(_.getInt(1)).map(_.getLong(3))
      assert(ds.zip(ds.tail).forall { case (x, y) => x <= y })
      assert(ds.forall(_ >= 0L))
    }
  }
}
