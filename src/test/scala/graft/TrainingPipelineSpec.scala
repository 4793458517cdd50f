package graft

import org.apache.spark.sql.functions._
import graft.operators.{TextAnalysis, TrainingPipeline}

/** End-to-end behavior of the composed training pipeline: the fused
  * filter agrees with the composable per-signal operators, and the
  * dedup stage provably depends on the normalize stage (the planted
  * trio collapses only because normalization makes the copies
  * identical).
  */
class TrainingPipelineSpec extends SparkSpec {

  test("refreshWithNearDup: composition parity, organic near-dups actually drop") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") < 400)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val batch = docs.filter(col("doc_id") >= 400)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val noEval = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val bands = graft.operators.Dedup.minhashBands(corpus)
    val base = TrainingPipeline.refresh(corpus, batch, noEval)
    val screened = TrainingPipeline.refreshWithNearDup(
      corpus, batch, noEval, bands)
    val baseIds = base.select("doc_id").as[Long].collect().toSet
    val screenedIds = screened.select("doc_id").as[Long].collect().toSet
    // parity: screened = base minus the near-dup drop set over survivors
    val survivors = batch.join(base.select("doc_id"), Seq("doc_id"), "left_semi")
    val drops = graft.operators.Dedup
      .incrementalNearDup(survivors, corpus, bands)
      .select("db").as[Long].collect().toSet
    assert(screenedIds === baseIds -- drops)
    // the organic cross-split near-dups are non-exact, so plain refresh
    // keeps them and the near-dup stage is what removes them
    assert(drops.nonEmpty && (baseIds & drops) === drops,
      s"near-dup stage must drop docs refresh kept: $drops")
  }

  test("unigram LM: self-trained scoring equals unigramLogProb; round-trip preserves it") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val lm = TextAnalysis.trainUnigramLm(docs)
    val direct = TextAnalysis.unigramLogProb(docs).orderBy("doc_id").collect().toSeq
    // full-corpus LM on the same corpus: no OOV, identical scores
    val withLm = TextAnalysis.unigramLogProbWith(docs, lm)
      .orderBy("doc_id").collect().toSeq
    assert(withLm === direct)
    // persist with the release, reload, re-score: bit-identical
    val dir = java.nio.file.Files.createTempDirectory("lm").toString
    TrainingPipeline.writeUnigramLm(lm, dir)
    val loaded = TrainingPipeline.loadUnigramLm(spark, dir)
    assert((loaded.n, loaded.v) === ((lm.n, lm.v)))
    val rescored = TextAnalysis.unigramLogProbWith(docs, loaded)
      .orderBy("doc_id").collect().toSeq
    assert(rescored === direct)
  }

  test("unigram LM: OOV tokens score at the Laplace floor under the frozen denominator") {
    import spark.implicits._
    val train = Seq((1L, "a a b")).toDF("doc_id", "text")
    val lm = TextAnalysis.trainUnigramLm(train) // n=3, v=2
    assert((lm.n, lm.v) === ((3L, 2L)))
    val out = TextAnalysis.unigramLogProbWith(
        Seq((9L, "zz zz")).toDF("doc_id", "text"), lm)
      .collect().head
    // both tokens unseen: bits = -log2((0+1)/(3+2)) = log2(5)
    val expected = math.floor(math.log(5.0) / math.log(2.0) * 1e4 + 0.5) / 1e4
    assert((out.getLong(0), out.getLong(1), out.getDouble(2)) === ((9L, 2L, expected)))
  }

  test("quality weights: write/load round-trip feeds linearQualityScore unchanged") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val labeled = docs.select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .join(TextAnalysis.quality(docs)
        .select(col("doc_id").cast("long").as("doc_id"),
          (col("quality_score") >= 0.5).cast("double").as("label")), "doc_id")
    val weights = TextAnalysis.trainQualityWeights(labeled, iters = 2)
    val direct = TextAnalysis.linearQualityScore(docs, weights = Some(weights))
      .orderBy("doc_id").collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("qw").toString
    TrainingPipeline.writeQualityWeights(weights, dir)
    val reloaded = TrainingPipeline.loadQualityWeights(spark, dir)
    val rescored = TextAnalysis.linearQualityScore(docs, weights = Some(reloaded))
      .orderBy("doc_id").collect().toSeq
    assert(rescored === direct && direct.nonEmpty)
  }

  test("fused quality/langid filter agrees with the composable operators") {
    import spark.implicits._
    // ids chosen so the eval slice (id % 100 < 3) is empty and no two
    // docs share shingles — the pipeline output is exactly the filter-
    // pass set, packed
    val docs = Seq(
      (103L, "the the the the the"),                       // stop-heavy: keep
      (104L, "zz1 zz2 zz3"),                               // no profile hit: und, drop
      (105L, "the w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),        // score 0.1 < 0.2: drop
      (106L, ((1 to 30).map(i => s"u$i") ++ Seq.fill(30)("the")).mkString(" ")))
      .toDF("doc_id", "text")
    val out = TrainingPipeline.run(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(103L, 106L))
    // parity: the same set falls out of composing quality() + languageId()
    val norm = docs.select(col("doc_id"),
      TextAnalysis.normalizedText(col("text")).as("text"))
      .withColumn("n_chars", length(col("text")))
    val q = TextAnalysis.quality(norm)
      .filter(col("quality_score") >= 0.2).select("doc_id")
    val l = TextAnalysis.languageId(norm.withColumn("lang", lit("en")))
      .filter(col("predicted_lang") =!= "und").select("doc_id")
    val composed = q.join(l, "doc_id").collect().map(_.getLong(0)).toSet
    assert(composed === out,
      "fused filter must keep exactly the docs the composable operators keep")
  }

  test("refresh: planted drops at every stage; prebuilt sketch gives identical output") {
    import spark.implicits._
    // released corpus: two docs; eval suite: one doc
    val released = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val evalDocs = Seq(
      (900L, "held out eval question about physics")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon"),        // exact corpus dup -> drop
      (11L, "brand new document body here"),           // clean -> keep
      (12L, "brand new document body here"),           // within-batch dup of 11 -> drop
      (13L, "this mentions eval question about physics verbatim"), // contaminated -> drop
      (14L, "another clean fresh text entirely"))      // clean -> keep
      .toDF("doc_id", "text")
    val out = TrainingPipeline.refresh(released, batch, evalDocs)
    val kept = out.collect().map(r => r.getLong(0)).toSet
    assert(kept === Set(11L, 14L),
      s"expected corpus-dup, batch-dup and contaminated drops, got $kept")
    // placement columns are pure functions of id/text — spot-check shape
    val row = out.filter(col("doc_id") === 11L).collect().head
    assert(Set("train", "val", "test").contains(row.getString(2)))
    assert(row.getLong(3) >= 0L && row.getLong(3) < 32L)
    // sketch reuse parity: build the release sketch once, pass it in —
    // the weekly-batch amortization path must emit the identical frame
    val sketch = graft.operators.Dedup.contentSketch(released)
    val out2 = TrainingPipeline.refresh(released, batch, evalDocs,
      corpusSketch = Some(sketch))
    assert(out2.collect().toSet === out.collect().toSet)
  }

  test("pipe1 fixture: normalized copies dedup to one survivor (sf fixture)") {
    // the full wrapped query on the test fixture: the clean planted doc
    // survives; the uppercased and whitespace-dirty copies are dropped
    // by the dedup stage — which can only happen if normalization ran
    // first (un-normalized they share no 3-gram shingles)
    val rows = SparkEntry.queries("pipe1_training_pipeline")(spark, sf)
      .filter(col("doc_id") >= 1000000L).collect()
    assert(rows.map(_.getLong(0)).toSet === Set(1000003L),
      "only the cluster representative of the planted trio may survive")
  }

  test("packing output is consistent: offsets are cumulative within shards") {
    import spark.implicits._
    // ids 310.. stay clear of the eval slice (id % 100 < 3) and every
    // doc interleaves unique tokens between the stopwords, so no two
    // docs share a 3-gram shingle (no dedup losses) or a 4-gram with
    // anything (no decontamination losses): ALL 40 docs must reach the
    // packing stage — guarded below so this test can never go vacuous.
    val docs = (0 until 40).map { i =>
      (310L + i,
        s"the x$i a y$i of z$i in w$i to v$i is u$i and q$i the r$i")
    }.toDF("doc_id", "text")
    val out = TrainingPipeline.run(docs)
      .select("doc_id", "shard", "off", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length === 40, s"expected all 40 docs to survive, got ${out.length}")
    out.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      var expected = 0L
      sorted.foreach { case (id, _, off, n) =>
        assert(off === expected, s"doc $id offset $off != running total $expected")
        expected += n
      }
    }
  }

  test("runObserved: per-stage counts pin the planted drops, at zero extra jobs") {
    import spark.implicits._
    // one planted casualty per stage:
    //   102  -> eval slice (102 % 100 = 2 < 3): held out, decon target
    //   104  -> no profile hit ('und'): fused filter drop
    //   105  -> quality 0.1 < 0.2: fused filter drop
    //   111  -> exact copy of 110: dedup loser
    //   120  -> shares 4-gram 'alpha beta gamma delta' with eval 102:
    //           decontamination drop
    //   103, 110 survive to the packed release
    val docs = Seq(
      (102L, "the alpha beta gamma delta epsilon"),
      (103L, "the the the the the"),
      (104L, "zz1 zz2 zz3"),
      (105L, "the w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (110L, "the dup1 dup2 dup3 dup4 and dup5 the dup6"),
      (111L, "the dup1 dup2 dup3 dup4 and dup5 the dup6"),
      (120L, "the alpha beta gamma delta zeta of the xx1"))
      .toDF("doc_id", "text")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
    }
    val sc = spark.sparkContext
    sc.addSparkListener(listener)
    try {
      val (out, m) = TrainingPipeline.runObserved(docs)
      val survivors = out.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(survivors === Set(103L, 110L))
      // every metric is already bound once the action above finished:
      // harvesting them must launch NOTHING (the audit a per-stage
      // .count() chain would fail by construction). The listener bus
      // posts asynchronously — poll until quiet (dd8's audit idiom).
      def quietJobs(): Int = {
        var last = -1; var spins = 0
        while (last != jobs.get() && spins < 50) {
          last = jobs.get(); Thread.sleep(100); spins += 1
        }
        last
      }
      val jobsBefore = quietJobs()
      assert(m.counts === Map(
        "n_docs" -> 7L, "n_eval" -> 1L, "n_filtered" -> 4L,
        "n_deduped" -> 3L, "n_clean" -> 2L, "n_packed" -> 2L))
      assert(quietJobs() === jobsBefore,
        "harvesting observe metrics must not launch any Spark job")
    } finally sc.removeSparkListener(listener)
  }

  test("refresh append cycle: write release, append refresh output, diff shows exactly the additions") {
    import spark.implicits._
    // initial release: 100 fixture docs, written sharded
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val released = docs.filter(col("doc_id") < 100)
    val relFrame = released
      .select(col("doc_id"), md5(col("text")).as("h"),
        graft.operators.Sampling.splitLabel(col("doc_id")).as("split"),
        pmod(graft.operators.IvfSearch.mix32(col("doc_id")), lit(8L)).as("shard"))
    val dir = java.nio.file.Files.createTempDirectory("refresh").toString
    TrainingPipeline.writeRelease(relFrame, dir)
    // weekly batch: 30 new docs + 10 exact re-crawls of released docs
    val batch = docs.filter(col("doc_id") >= 100 && col("doc_id") < 130)
      .unionByName(released.filter(col("doc_id") < 10)
        .select((col("doc_id") + 500000L).as("doc_id"), col("text")))
    val evalDocs = docs.filter(col("doc_id") >= 400)
    val add = TrainingPipeline.refresh(released, batch, evalDocs, shards = 8)
    val addRows = add.collect()
    val addIds = addRows.map(_.getLong(0)).toSet
    // re-crawled texts never survive; survivors are genuinely new ids
    assert(addIds.forall(id => id >= 100 && id < 130))
    assert(addRows.nonEmpty)
    // append the refresh output into the same sharded layout — the
    // weekly write is an append of new (split, shard) files, existing
    // cells untouched semantically
    TrainingPipeline.releaseLayout(add)
      .write.mode("append").partitionBy("split", "shard").parquet(dir)
    val back = spark.read.parquet(dir)
      .select(col("doc_id"), col("h")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val expected = (relFrame.select("doc_id", "h").collect() ++
      addRows.map(r => org.apache.spark.sql.Row(r.getLong(0), r.getString(1))))
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back === expected, "appended release must hold old + new rows exactly")
    // releaseDiff(old, appended) reports exactly the refresh additions
    val diff = TrainingPipeline.releaseDiff(
      relFrame.select("doc_id", "h"),
      spark.read.parquet(dir).select("doc_id", "h"),
      contentCols = Seq("h"))
    val diffRows = diff.collect()
    assert(diffRows.forall(_.getString(1) == "added"))
    assert(diffRows.map(_.getLong(0)).toSet === addIds)
  }

  test("refresh: empty batch and empty eval degrade gracefully") {
    import spark.implicits._
    val released = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val batch = Seq((2L, "fresh new text here")).toDF("doc_id", "text")
    // empty batch -> empty output (the no-new-crawl week)
    assert(TrainingPipeline.refresh(released, empty, batch).count() === 0L)
    // empty eval -> nothing contaminated, batch survives
    val out = TrainingPipeline.refresh(released, batch, empty)
    assert(out.collect().map(_.getLong(0)).toSet === Set(2L))
  }

  test("writeRelease: read-back parity, one file per (split,shard), id-sorted files") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id").cast("long").as("doc_id"), col("text")).limit(200)
    // a release frame = packing output joined with the split assignment
    // (the same columns TrainingPipeline.run emits), 8 shards so every
    // (split, shard) cell is populated at 200 docs
    val release = graft.operators.Sampling.packSequences(docs, shards = 8)
      .join(graft.operators.Sampling.hashSplit(docs).select("doc_id", "split"), "doc_id")
      .select("doc_id", "split", "shard", "bin", "off", "n_tokens")
      .cache()
    val expected = release.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    val dir = java.nio.file.Files.createTempDirectory("release").toString
    TrainingPipeline.writeRelease(release, dir)
    // read-back parity: every row survives byte-exactly (partition
    // columns come back from the directory keys; shard infers as int)
    val back = spark.read.parquet(dir)
      .select(col("doc_id"), col("split"), col("shard").cast("long"),
        col("bin"), col("off"), col("n_tokens")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(back === expected)
    // layout: one parquet file per (split, shard) directory, rows
    // id-sorted within each file (the determinism contract)
    val root = new java.io.File(dir)
    val cells = for {
      split <- root.listFiles().toSeq if split.getName.startsWith("split=")
      shard <- split.listFiles().toSeq if shard.getName.startsWith("shard=")
    } yield shard
    assert(cells.nonEmpty)
    cells.foreach { cell =>
      val parts = cell.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1,
        s"${cell.getPath} must hold exactly one file, got ${parts.length}")
      val ids = spark.read.parquet(parts.head.getPath)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(ids === ids.sorted, s"${cell.getPath} rows not id-sorted")
    }
    // the write is reproducible: a second write yields identical bytes
    // per data file (same layout, same order, same encoding)
    val dir2 = java.nio.file.Files.createTempDirectory("release2").toString
    TrainingPipeline.writeRelease(release, dir2)
    def fileMap(d: String): Map[String, String] = {
      val base = java.nio.file.Paths.get(d)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(base).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map { p =>
          val rel = base.relativize(p).getParent.toString
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(java.nio.file.Files.readAllBytes(p))
          rel -> md.map(b => f"$b%02x").mkString
        }.toMap
    }
    assert(fileMap(dir) === fileMap(dir2), "release write must be byte-stable")
    release.unpersist()
  }

  test("releaseLayout plans exactly one exchange (the shard partitioning)") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id").cast("long").as("doc_id"), col("text")).limit(50)
    val release = graft.operators.Sampling.packSequences(docs, shards = 4)
      .join(graft.operators.Sampling.hashSplit(docs).select("doc_id", "split"), "doc_id")
    // count exchanges ABOVE the release frame: explain the layout and
    // subtract the exchanges the input plan already carries
    // formatted mode prints the partitioning in the node's Arguments
    // detail line ("Arguments: hashpartitioning(shard, ...)"), not in
    // the "Exchange" header itself
    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!p.contains("Arguments: rangepartitioning"), p)
      "Arguments: hashpartitioning".r.findAllIn(p).length
    }
    val layered = TrainingPipeline.releaseLayout(release)
    assert(exchanges(layered) === exchanges(release) + 1,
      "the layout must add exactly the one shard exchange")
  }

  test("screenAndPhase: stage composition agrees with the component operators run in order") {
    import graft.operators.{Dedup, Sampling, TextAnalysis}
    val docs = graft.sources.Tables.documents(spark, sf)
    val out = TrainingPipeline.screenAndPhase(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet.subsetOf(Set("pretrain", "anneal")) && out.nonEmpty)
    // replay the chain with the component operators directly
    val clfKeep = TextAnalysis.linearQualityScore(docs, threshold = -0.2)
      .filter(col("keep")).select("doc_id")
    val screened = docs.select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .join(clfKeep, Seq("doc_id"), "left_semi")
    val survivors = Dedup.spanDupFraction(screened).filter(!col("drop"))
    val phased = Sampling.curriculum(screened.join(
      survivors.select("doc_id"), Seq("doc_id"), "left_semi"))
    val expected = phased.groupBy("phase").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.view.mapValues(_._1).toMap === expected)
    // anneal members all clear the quality floor (and exist at gate SF)
    assert(out.contains("anneal") && out("anneal")._3 >= 0.5)
    // textCol threads through every stage incl. curriculum (the r9
    // advice finding: curriculum used to hardcode col("text"))
    val renamed = TrainingPipeline.screenAndPhase(
      docs.withColumnRenamed("text", "body"), textCol = "body").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(renamed === out, "screenAndPhase must honor textCol end-to-end")
  }

  test("screenAndPhaseManaged: cleanup releases the two mid-pipeline cache entries") {
    val docs = graft.sources.Tables.documents(spark, sf)
    spark.catalog.clearCache()
    val (report, cleanup) = TrainingPipeline.screenAndPhaseManaged(docs)
    assert(report.collect().nonEmpty)
    val cachedAfterRun = spark.sparkContext.getPersistentRDDs.size
    cleanup()
    // inner operators may hold their own (clearCache-scoped) entries;
    // cleanup is accountable for exactly the screened+survivors pair
    assert(spark.sparkContext.getPersistentRDDs.size === cachedAfterRun - 2,
      "cleanup must unpersist the two mid-pipeline frames")
    cleanup() // idempotent
    assert(spark.sparkContext.getPersistentRDDs.size === cachedAfterRun - 2)
    spark.catalog.clearCache()
  }

  test("splitLeakage: cross-split digests reported, same-split dups and uniques filtered") {
    import spark.implicits._
    val rel = Seq(
      (1L, "train", "aaa"), (2L, "test", "aaa"), // leak: 2 splits
      (3L, "train", "bbb"), (4L, "train", "bbb"), // duplicate but same split
      (5L, "val", "ccc"), // unique
      (6L, "train", "ddd"), (7L, "val", "ddd"), (8L, "test", "ddd") // 3-way
    ).toDF("doc_id", "split", "text")
    val out = TrainingPipeline.splitLeakage(rel)
      .orderBy("first_doc")
      .as[(String, Long, Int, String, Long)].collect()
    def md5(x: String) = graft.functions.TextHashing.md5Hex(x)
    assert(out === Array(
      (md5("aaa"), 2L, 2, "test,train", 1L),
      (md5("ddd"), 3L, 3, "test,train,val", 6L)))
  }
}
