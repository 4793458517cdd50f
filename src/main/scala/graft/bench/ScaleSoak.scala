package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale soak: the data-dominated operator family timed at 1x and 10x
  * the bench corpus size (5k vs 50k docs — the bench SF has only ever
  * run at sf0.1), writing `SCALE.json` with per-query wall ratios. A
  * LINEAR operator lands at ratio <= ~12 (10x data ± job constants,
  * which amortize so most land BELOW 10); a super-linear one shows up
  * immediately as a 20-100x ratio.
  *
  * The corpus is synthesized IN-ENGINE (deterministic hash tokens, the
  * fixture-machinery discipline) and materialized to parquet first so
  * every timed operator reads parquet exactly like the bench does:
  *   - token vocabulary scales WITH the corpus (vocab = 4n), so
  *     per-token document frequency is constant across scales and
  *     candidate growth from random shingle collisions is excluded BY
  *     CONSTRUCTION — the soak isolates engine scaling; collision/cap
  *     behavior under adversarial density is separately pinned by the
  *     capped fixtures (CappedFixtureSpec).
  *   - near-dup structure is PLANTED at a fixed rate (1% in-split
  *     neighbors + 1% cross-split copies for the incremental probe),
  *     so true-pair counts scale linearly, as they do in a real corpus.
  *
  * Usage: `runMain graft.bench.ScaleSoak [outPath]` (default
  * SCALE.json). `SPARK_GRAFT_SCALE_ONLY=dd15_...,pipe2_...` restricts
  * to a subset (focused re-reads of a flagged row — the bench's
  * BENCH_ONLY convention; a filtered run should NOT overwrite the
  * committed SCALE.json), `SPARK_GRAFT_SCALE_RUNS=3` raises the
  * per-scale min-of (default 2). Not part of the driver contract;
  * evidence for the would-it-survive-100TB audit.
  */
object ScaleSoak {

  /** splitmix64 finalizer — deterministic, seedless doc content
    * (shared with [[SkewSoak]]'s Zipf fixture).
    */
  private[bench] def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** A few constant common words ride every doc (every 7th token) so
    * the language-ID and stopword-quality signals behave organically —
    * a doc of pure hash tokens has no language and pipe1's langid
    * stage would drop the whole corpus.
    */
  private val Common = Array("the", "and", "of", "to", "data", "a", "in", "is")

  /** One doc's token stream: 40-69 tokens drawn from a vocab of 4n
    * (constant expected df ~13.5 at every scale). Docs with id%100==1
    * are ~92% near-copies of id-1 (in-split planted pairs, J ~0.6
    * after trigram-shingle breakage); docs in the top fifth with
    * id%100==51 are ~92% near-copies of their corpus twin id - 4n/5
    * (cross-split pairs for the incremental probe).
    */
  private def docText(id0: Long, n: Long): String = {
    val vocab = 4 * n
    val (id, perturb) =
      if (id0 % 100 == 1 && id0 > 0) (id0 - 1, true)
      else if (id0 % 100 == 51 && id0 >= 4 * n / 5) (id0 - 4 * n / 5, true)
      else (id0, false)
    val len = 40 + Math.floorMod(mix(id), 30L).toInt
    val sb = new StringBuilder
    var j = 0
    while (j < len) {
      if (j > 0) sb.append(' ')
      if (j % 7 == 3)
        sb.append(Common(Math.floorMod(mix(id * 17L + j), Common.length.toLong).toInt))
      else {
        val t =
          if (perturb && j % 12 == 0) Math.floorMod(mix(id0 * 31L + j), vocab)
          else Math.floorMod(mix(id * 131L + j * 7919L), vocab)
        sb.append('w').append(t)
      }
      j += 1
    }
    sb.toString
  }

  private[bench] def synthDocs(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    val nn = n
    spark.range(n).as[Long]
      .map(id => (id, docText(id, nn), "l" + Math.floorMod(mix(id * 5L), 5L),
        "s" + Math.floorMod(mix(id * 11L), 20L)))
      .toDF("doc_id", "text", "lang", "source")
  }

  /** Event stream: n events over n/50 users across 30 days, value a
    * 2-dp hash amount — the sessionize/window-analytics family's food.
    */
  private def synthEvents(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    val users = math.max(n / 50L, 1L)
    spark.range(n).as[Long]
      .map { id =>
        val tsUs = 1704067200000000L + Math.floorMod(mix(id * 13L), 2592000000000L)
        (id, Math.floorMod(mix(id * 7L), users), tsUs,
          Math.floorMod(mix(id * 3L), 10000L) / 100.0)
      }
      .toDF("event_id", "user_id", "ts_us", "value")
      .select(col("event_id"), col("user_id"),
        expr("timestamp_micros(ts_us)").as("ts"), col("value"))
  }

  /** Zipf-vocabulary corpus for the TOKENIZER row: natural language has
    * Heaps-law vocabulary growth (V ~ n^0.5-0.7) and Zipf token mass,
    * which is exactly what the BPE memo's O(1)-hit claim rests on. The
    * uniform vocab-proportional corpus above is ADVERSARIAL for the
    * memo (per-partition df drops below 1 as vocab outgrows the
    * partition's token count, every word misses) — measured and
    * recorded in BENCH_NOTES, not used for the tok1 row.
    */
  private def zipfText(id: Long): String = {
    val len = 40 + Math.floorMod(mix(id), 30L).toInt
    val sb = new StringBuilder
    var j = 0
    while (j < len) {
      if (j > 0) sb.append(' ')
      val u = Math.floorMod(mix(id * 193L + j * 6151L), 1000000L) / 1000000.0
      sb.append('z').append((30000 * u * u * u).toLong)
      j += 1
    }
    sb.toString
  }

  private def synthZipfDocs(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].map(id => (id, zipfText(id))).toDF("doc_id", "text")
  }

  private def synthEmbeddings(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long]
      .map { id =>
        val v = Array.tabulate(64)(d =>
          (Math.floorMod(mix(id * 64L + d), 2000L) - 1000L) / 1000.0)
        (id, v)
      }
      .toDF("vec_id", "embedding")
  }

  def main(args: Array[String]): Unit = {
    // a SCALE_ONLY-filtered run writes PARTIAL rows (and a subset
    // worst_ratio); without an explicit outPath it must not clobber the
    // committed full artifact — redirect to SCALE_partial.json instead
    // of relying on the docstring (the r17 advice item)
    val filtered = sys.env.get("SPARK_GRAFT_SCALE_ONLY").exists(_.trim.nonEmpty)
    val out =
      if (args.nonEmpty) args(0)
      else if (filtered) {
        println("[scale] SPARK_GRAFT_SCALE_ONLY set and no outPath given" +
          " — writing SCALE_partial.json to protect the committed SCALE.json")
        "SCALE_partial.json"
      } else "SCALE.json"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("graft-scale").toString
    val scales = Seq("x1" -> 5000L, "x10" -> 50000L, "x100" -> 500000L)
    scales.foreach { case (tag, n) =>
      synthDocs(spark, n).repartition(32)
        .write.mode("overwrite").parquet(s"$base/$tag/documents.parquet")
      synthZipfDocs(spark, n).repartition(32)
        .write.mode("overwrite").parquet(s"$base/$tag/zipfdocs.parquet")
      synthEmbeddings(spark, (2 * n) / 5).repartition(32)
        .write.mode("overwrite").parquet(s"$base/$tag/embeddings.parquet")
      synthEvents(spark, n).repartition(32)
        .write.mode("overwrite").parquet(s"$base/$tag/events.parquet")
    }
    // the tokenizer is trained ONCE on a fixed 500-doc slice (a frozen
    // artifact does not grow with the corpus; tok1 times TOKENIZATION)
    val merges = graft.operators.TextAnalysis.bpeTrain(
      spark.read.parquet(s"$base/x1/zipfdocs.parquet")
        .filter(col("doc_id") < 500), numMerges = 200)

    def docs(tag: String) = spark.read.parquet(s"$base/$tag/documents.parquet")
    def emb(tag: String) = spark.read.parquet(s"$base/$tag/embeddings.parquet")
    def evs(tag: String) = spark.read.parquet(s"$base/$tag/events.parquet")

    val queries: Seq[(String, String => DataFrame)] = Seq(
      "dd2_minhash_lsh" -> (t => graft.operators.Dedup.minhashLsh(docs(t))),
      "dd3_ngram_jaccard" -> (t => graft.operators.Dedup.ngramJaccard(docs(t))),
      "dd4_simhash" -> (t => graft.operators.Dedup.simhashPairs(docs(t))),
      "dd15_incremental_neardup" -> { t =>
        val d = docs(t)
        val n = scales.toMap.apply(t)
        val corpus = d.filter(col("doc_id") < 4 * n / 5)
        val batch = d.filter(col("doc_id") >= 4 * n / 5)
        graft.operators.Dedup.incrementalNearDup(batch, corpus,
          corpusBands = graft.operators.Dedup.minhashBands(corpus))
      },
      "rf1_corpus_refresh" -> { t =>
        val d = docs(t)
        val released = d.filter(pmod(col("doc_id"), lit(5)) =!= 0)
        val batch = d.filter(pmod(col("doc_id"), lit(3)) === 0)
        val evalDocs = d.filter(pmod(col("doc_id"), lit(100)) < 3)
        graft.operators.TrainingPipeline.refresh(released, batch, evalDocs)
      },
      "pipe1_training_pipeline" ->
        (t => graft.operators.TrainingPipeline.run(docs(t))),
      "pipe2_screen_and_phase" ->
        (t => graft.operators.TrainingPipeline.screenAndPhase(docs(t))),
      "dd8_dup_clusters" -> { t =>
        graft.operators.Dedup.duplicateClusters(
          graft.operators.Dedup.minhashLsh(docs(t)))
      },
      "ann_lsh_topk" -> { t =>
        graft.operators.Similarity.lshTopK(emb(t), queryIds = Seq(0L, 1L, 2L, 3L, 4L))
      },
      "cl1_kmeans" -> (t => graft.operators.Clustering.kmeans(emb(t))),
      "ann_pq_topk" -> { t =>
        graft.operators.PqSearch.pqTopK(emb(t), queryIds = Seq(0L, 1L, 2L, 3L, 4L))
      },
      "ann_ivfpq_topk" -> { t =>
        // sample-capped fit (4096) at every scale — the steady-state shape
        graft.operators.PqSearch.ivfPqTopK(emb(t), queryIds = Seq(0L, 1L, 2L, 3L, 4L))
      },
      "ann_pq_residual" -> { t =>
        // residual layout rides the same narrow encode pass — the soak
        // proves the per-(query, cell) tables add no data-scaled cost
        graft.operators.PqSearch.ivfPqResidualTopK(
          emb(t), queryIds = Seq(0L, 1L, 2L, 3L, 4L))
      },
      "tok1_bpe_tokenize" -> (t => graft.operators.TextAnalysis.bpeTokenize(
        spark.read.parquet(s"$base/$t/zipfdocs.parquet"), merges)),
      "ev1_sessionize" ->
        (t => graft.operators.EventAnalytics.sessionize(evs(t), 30)),
      "ev7_transitions" -> { t =>
        // event_type derives from the hash value column so the matrix
        // stays 5x5 while transitions scale with the event count
        val e = evs(t).withColumn("event_type",
          concat(lit("t"), pmod(col("event_id") * 37, lit(5)).cast("string")))
        graft.operators.EventAnalytics.transitionMatrix(e)
      },
      "ev8_attribution" -> { t =>
        // ~10% purchases, the rest split view/click — per-user pair
        // fan-out stays human-bounded while pairs scale with events
        val e = evs(t).withColumn("event_type",
          when(pmod(col("event_id") * 37, lit(10)) === 0, lit("purchase"))
            .when(pmod(col("event_id") * 37, lit(10)) < 5, lit("view"))
            .otherwise(lit("click")))
        graft.operators.EventAnalytics.attribution(e, lookbackDays = 30)
      },
      "tok4_unigram" -> (t => graft.operators.TextAnalysis.unigramTokenize(
        spark.read.parquet(s"$base/$t/zipfdocs.parquet"), merges)),
      "tok5_unigram_em1" -> (t => graft.operators.TextAnalysis.unigramTokenizeEm1(
        spark.read.parquet(s"$base/$t/zipfdocs.parquet"), merges)),
      "ir1_bm25_topk" ->
        (t => graft.operators.TextAnalysis.bm25TopK(docs(t))),
      "ann_sq8" -> { t =>
        graft.operators.SqSearch.sq8TopK(emb(t), queryIds = Seq(0L, 1L, 2L, 3L, 4L))
      },
      "txt_ppl4_kn" ->
        (t => graft.operators.TextAnalysis.knBigramLogProb(docs(t))),
      "ev10_survival" ->
        (t => graft.operators.EventAnalytics.survivalCurve(evs(t))),
      "cl3_silhouette" ->
        (t => graft.operators.Clustering.silhouetteAudit(emb(t))),
      "tok6_unigram_em" -> (t => graft.operators.TextAnalysis.unigramTokenizeEm(
        spark.read.parquet(s"$base/$t/zipfdocs.parquet"), merges)),
      "dd17_template_spam" ->
        (t => graft.operators.Dedup.templateSpam(docs(t))),
      "txt_ppl3_approx" ->
        (t => graft.operators.TextAnalysis.pplBucketsApprox(docs(t))),
      "emb1_random_projection" ->
        (t => graft.operators.Similarity.randomProjection(emb(t))),
      "txt_filter_stack" ->
        (t => graft.operators.TextAnalysis.filterStack(docs(t))),
      "pipe3_curation_report" ->
        (t => graft.operators.TrainingPipeline.curationReport(docs(t))),
      "gr1_pagerank_loop" -> { t =>
        // domain count scales with the corpus; loop pinned (cap=0)
        val n = scales.toMap.apply(t)
        val k = math.max(n / 100L, 20L)
        val d = docs(t)
        def node(c: org.apache.spark.sql.Column) =
          concat(lit("d"), pmod(c, lit(k)).cast("string"))
        val e = d.select(node(col("doc_id") * 131).as("src"),
            node(col("doc_id") * 7 + 3).as("dst"))
          .union(d.select(node(col("doc_id") * 131).as("src"),
            node(col("doc_id") * 13 + 5).as("dst")))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        graft.operators.GraphRank.pageRankFixedPoint(e, 5, smallGraphMaxEdges = 0)
      },
      "gr3_hits_loop" -> { t =>
        // same scaling edge fixture as gr1; loop pinned (cap=0)
        val n = scales.toMap.apply(t)
        val k = math.max(n / 100L, 20L)
        val d = docs(t)
        def node(c: org.apache.spark.sql.Column) =
          concat(lit("d"), pmod(c, lit(k)).cast("string"))
        val e = d.select(node(col("doc_id") * 131).as("src"),
            node(col("doc_id") * 7 + 3).as("dst"))
          .union(d.select(node(col("doc_id") * 131).as("src"),
            node(col("doc_id") * 13 + 5).as("dst")))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        graft.operators.GraphRank.hitsFixedPoint(e, 3, smallGraphMaxEdges = 0)
      },
      "gr4_label_prop" -> { t =>
        // same scaling edge fixture as gr1/gr3; loop pinned (cap=0)
        val n = scales.toMap.apply(t)
        val k = math.max(n / 100L, 20L)
        val d = docs(t)
        def node(c: org.apache.spark.sql.Column) =
          concat(lit("d"), pmod(c, lit(k)).cast("string"))
        val e = d.select(node(col("doc_id") * 131).as("src"),
            node(col("doc_id") * 7 + 3).as("dst"))
          .union(d.select(node(col("doc_id") * 131).as("src"),
            node(col("doc_id") * 13 + 5).as("dst")))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        graft.operators.GraphRank.labelPropagation(e, 3, smallGraphMaxEdges = 0)
      },
      "gr5_triangles" -> { t =>
        // same scaling edge fixture — node count grows with the corpus,
        // mean degree stays ~constant, so triangles scale linearly and
        // the degree-ordered wedge join must too
        val n = scales.toMap.apply(t)
        val k = math.max(n / 100L, 20L)
        val d = docs(t)
        def node(c: org.apache.spark.sql.Column) =
          concat(lit("d"), pmod(c, lit(k)).cast("string"))
        val e = d.select(node(col("doc_id") * 131).as("src"),
            node(col("doc_id") * 7 + 3).as("dst"))
          .union(d.select(node(col("doc_id") * 131).as("src"),
            node(col("doc_id") * 13 + 5).as("dst")))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        graft.operators.GraphRank.triangleStats(e)
      },
      "ir4_query_likelihood" ->
        (t => graft.operators.TextAnalysis.qlTopK(docs(t))),
      "cl4_dbscan" -> { t =>
        // soak the OPERATOR's machinery (degree agg, core filter,
        // size-gated CC, border assignment) on a planted pair graph
        // that scales linearly by construction: chains of ±1/±2 links
        // inside 100-id blocks, every 7th id left edgeless (noise).
        // Pair GENERATION is a separate operator with its own soak
        // rows (the banded-join family); the synthetic embeddings'
        // structured sign patterns overload 8-bit LSH buckets and
        // would measure the fixture, not the engine.
        import spark.implicits._
        val m = (2 * scales.toMap.apply(t)) / 5
        val pairs = spark.range(m).as[Long].flatMap { id =>
          Seq(id + 1, id + 2)
            .filter(b => b < m && b / 100 == id / 100 &&
              id % 7 != 0 && b % 7 != 0)
            .map(b => (id, b))
        }.toDF("va", "vb")
        graft.operators.Clustering.dbscan(emb(t), pairs = Some(pairs))
      },
      "ann_ivfsq" -> { t =>
        graft.operators.SqSearch.ivfSqTopK(emb(t), queryIds = Seq(0L, 1L, 2L, 3L, 4L))
      },
      "dd5c_embedding_lsh16" -> { t =>
        // the wide-band pair-generation shape at scale: 16-bit bands
        // (65536 buckets each) stay sparse at 200k random vectors,
        // where the byte default saturates its 256 buckets and the
        // per-bucket pair fan-out goes quadratic — the r16 forensic
        // that kept 8-bit pair generation OUT of this soak
        graft.operators.Similarity.lshNearDupPairs(
          emb(t), nBits = 128, bandBits = 16)
      },
      "mm_phash_pairs" -> { t =>
        // real PNG encode+decode per doc id at every scale: the decode/
        // pool/DCT pass is the data term, banding bounds the join
        implicit val s = spark
        graft.operators.Multimodal.phashPairs(
          graft.operators.Multimodal.syntheticPatternImages(
            docs(t).select(col("doc_id"))))
      })

    def timeIt(f: => Long): (Double, Long) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val nRuns = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_SCALE_RUNS", "2").toInt)
    val results = queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, q) =>
      // JIT warmup on the small scale, then min of nRuns at each scale.
      // r19 (verdict #5): ALL runs are kept and land in the artifact as
      // per-scale run arrays — a high-variance row (dd15's recorded
      // 4.3x–16.4x window spread at x100) is readable from the artifact
      // itself instead of living only in BENCH_NOTES prose.
      q("x1").count(): Unit
      val bySc = scales.map { case (tag, _) =>
        val runs = (1 to nRuns).map(_ => timeIt(q(tag).count()))
        (tag, runs.minBy(_._1), runs.map(_._1))
      }
      val (t1, _) = bySc.head._2
      val line = bySc.map { case (tag, (t, r), _) =>
        f"$tag=${t}%.2fs ($r rows, ${t / t1}%.1fx)"
      }.mkString("  ")
      println(f"[scale] $name%-26s $line")
      (name, bySc)
    }

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val items = results.map { case (name, bySc) =>
      val t1 = bySc.head._2._1
      val fields = bySc.map { case (tag, (t, r), runs) =>
        s""""t_${tag}_sec":${num(t)},"rows_$tag":$r,""" +
          s""""ratio_$tag":${num(t / t1)},""" +
          s""""runs_$tag":[${runs.map(num).mkString(",")}],""" +
          s""""med_${tag}_sec":${num(med(runs))}"""
      }.mkString(",")
      s"""  "$name": {$fields}"""
    }
    // worst 100x ratio vs the 100x data factor is the headline
    val worst100 = results.map { case (_, bySc) =>
      bySc.last._2._1 / bySc.head._2._1 }.max
    val body = s"""{"docs_x1":5000,"docs_x10":50000,"docs_x100":500000,""" +
      s""""n_runs":$nRuns,""" +
      s""""worst_ratio_x100":${num(worst100)},"queries":{\n""" +
      items.mkString(",\n") + "\n}}\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[scale] worst x100 ratio ${num(worst100)} -> $out")
    spark.stop()
  }
}
