package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling
import graft.sources.Tables

class SamplingSpec extends SparkSpec {

  lazy val docs = Tables.documents(spark, sf)

  test("epochUpsample: copy counts replay floor + hash-fraction exactly") {
    val weights = Seq("src0" -> 2300L, "src1" -> 500L, "src2" -> 0L)
    val out = Sampling.epochUpsample(docs, weights).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // independently recompute every doc's copy count from the weight
    // arithmetic + the shared mix32 (the oracle the SQL mirror replays)
    val wMap = weights.toMap
    def mix32(id: Long): Long = {
      val h0 = java.lang.Math.floorMod(id, 4294967296L)
      val m1 = h0 ^ (h0 >> 16)
      val m2 = java.lang.Math.floorMod(m1 * 40503L, 4294967296L)
      m2 ^ (m2 >> 13)
    }
    val expected = docs.select("doc_id", "source").collect().flatMap { r =>
      val (id, src) = (r.getLong(0), r.getString(1))
      val w = wMap.getOrElse(src, 1000L)
      val n = w / 1000 + (if (mix32(id) % 1000000 < (w % 1000) * 1000) 1 else 0)
      (0 until n.toInt).map(c => (id, src, c))
    }.toSet
    assert(out.toSet === expected)
    assert(out.length === expected.size, "no duplicate copy rows")
    // every branch is live: full+fractional (src0), fractional-only
    // (src1 partial), dropped (src2), default pass-through (src3)
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("src0") > bySrc.getOrElse("src3", 0))
    assert(bySrc.getOrElse("src2", 0) === 0)
    val n1 = bySrc.getOrElse("src1", 0)
    assert(n1 > 0 && n1 < docs.filter(col("source") === "src1").count())
  }

  test("packStats: utilization is tokens over touched bins, consistent with packSequences") {
    val stats = Sampling.packStats(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val packed = Sampling.packSequences(docs).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4))) // (shard, off, n_tokens)
    val byShard = packed.groupBy(_._1)
    assert(stats.keySet === byShard.keySet)
    stats.foreach { case (shard, (nDocs, nTokens, nBins, util)) =>
      val rows = byShard(shard)
      assert(nDocs === rows.length.toLong)
      assert(nTokens === rows.map(_._3).sum)
      // bins from END offsets: a doc straddling past the last start-bin
      // boundary still counts the bins its tail spills into
      val endMax = rows.map(r => r._2 + r._3).max
      assert(nBins === math.max((endMax + 2047) / 2048, 1L))
      val expected = math.floor(nTokens.toDouble / (nBins * 2048) * 1e4 + 0.5) / 1e4
      assert(math.abs(util - expected) < 1e-9)
      assert(util > 0.0 && util <= 1.0 + 1e-9)
    }
  }

  test("mixtureAudit: copy counts equal the materialized mix; shares sum to 1") {
    val weights = Seq("src0" -> 2300L, "src1" -> 500L, "src2" -> 0L)
    val audit = Sampling.mixtureAudit(docs, weights).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    // the audit's arithmetic copy count must equal what epochUpsample
    // actually materializes, source by source
    val materialized = Sampling.epochUpsample(docs, weights).collect()
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    audit.foreach { case (src, (_, nCopies, _, _, _)) =>
      assert(nCopies === materialized.getOrElse(src, 0L), s"copy drift for $src")
    }
    // dropped source reports 0 copies and 0 target share
    assert(audit("src2")._2 === 0L && audit("src2")._3 === 0.0)
    // shares each sum to ~1 (round-6 residue only)
    val tShare = audit.values.map(_._3).sum
    val aShare = audit.values.map(_._4).sum
    assert(math.abs(tShare - 1.0) < 1e-4 && math.abs(aShare - 1.0) < 1e-4)
    // dev is the share difference as reported
    audit.values.foreach { case (_, _, t, a, dev) =>
      assert(math.abs(dev - (a - t)) < 1e-6 + 1e-9)
    }
  }

  test("epochUpsample is stable under re-partitioning") {
    val weights = Seq("src0" -> 1500L)
    val a = Sampling.epochUpsample(docs, weights)
      .orderBy("doc_id", "copy").collect().toSeq
    val b = Sampling.epochUpsample(docs.repartition(17), weights)
      .orderBy("doc_id", "copy").collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("hashSplit: assignment is exhaustive, deterministic, and roughly proportional") {
    val s1 = Sampling.hashSplit(docs)
    val bySplit = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = bySplit.values.sum
    assert(total === docs.count())
    assert(bySplit.keySet === Set("train", "val", "test"))
    // 90/5/5 within generous tolerance at 500 docs (hash, not rand)
    assert(bySplit("train").toDouble / total > 0.8)
    assert(bySplit("val").toDouble / total < 0.15)
    // determinism: identical assignment on re-run
    assert(Sampling.hashSplit(docs).collect().toSet === s1.collect().toSet)
  }

  test("hashSplit: assignment is stable under input re-partitioning") {
    val a = Sampling.hashSplit(docs).collect().toSet
    val b = Sampling.hashSplit(docs.repartition(7)).collect().toSet
    assert(a === b, "split must be id-derived, not partition-derived")
  }

  test("quotaPerKey: at most quota rows per stratum, ranks contiguous from 1") {
    val q = Sampling.quotaPerKey(docs, quota = 5).collect()
    val byKey = q.groupBy(_.getString(1))
    byKey.foreach { case (lang, rows) =>
      assert(rows.length <= 5, s"stratum $lang over quota")
      assert(rows.map(_.getInt(2)).sorted.toSeq === (1 to rows.length),
        s"ranks not contiguous for $lang")
    }
    // every stratum present in the corpus is represented
    assert(byKey.keySet === docs.select("lang").distinct().collect()
      .map(_.getString(0)).toSet)
  }

  test("packSequences: offsets are contiguous per shard and bins respect the budget") {
    val p = Sampling.packSequences(docs, budget = 256, shards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(p.nonEmpty)
    p.groupBy(_._2).foreach { case (shard, rows) =>
      val ordered = rows.sortBy(_._1) // ascending doc_id = stream order
      var expectedOff = 0L
      ordered.foreach { case (id, _, bin, off, n) =>
        assert(off === expectedOff, s"gap in shard $shard stream at doc $id")
        assert(bin === off / 256, s"bin must be the offset's budget quotient")
        expectedOff += n
      }
    }
  }

  test("packBinsWholeDoc: whole docs, budget respected, contiguous fills") {
    val budget = 256L
    val p = Sampling.packBinsWholeDoc(docs, budget = 256, shards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(p.nonEmpty)
    assert(p.length === docs.count(), "every doc placed exactly once")
    p.groupBy(r => (r._2, r._3)).foreach { case ((shard, bin), rows) =>
      val total = rows.map(_._5).sum
      // a bin only exceeds budget when a single over-budget doc owns it
      assert(total <= budget || rows.length === 1,
        s"shard $shard bin $bin over budget with ${rows.length} docs")
      // offsets tile the bin contiguously in placement (id) order
      val ordered = rows.sortBy(_._1)
      var off = 0L
      ordered.foreach { case (id, _, _, o, n) =>
        assert(o === off, s"doc $id offset $o != running fill $off")
        off += n
      }
    }
    // bins are consumed in order within a shard: no index gaps
    p.groupBy(_._2).foreach { case (shard, rows) =>
      val bins = rows.map(_._3).distinct.sorted
      assert(bins === (0L until bins.length).toArray.toSeq.toArray,
        s"shard $shard bin ids not contiguous: ${bins.mkString(",")}")
    }
    // determinism under re-partitioning (id-derived shard + id order)
    val q = Sampling.packBinsWholeDoc(docs.repartition(7), budget = 256, shards = 8)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(q.toSet === p.toSet)
  }

  test("packBinsFirstFit: capacity kept, never looser than whole-doc next-fit") {
    val budget = 256L
    val ff = Sampling.packBinsFirstFit(docs, budget = 256, shards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(ff.length === docs.count())
    ff.groupBy(r => (r._2, r._3)).foreach { case ((shard, bin), rows) =>
      val total = rows.map(_._5).sum
      assert(total <= budget || rows.length === 1,
        s"shard $shard bin $bin over budget")
    }
    // first-fit on the SAME (descending) order can only place earlier
    // than next-fit would — replay next-fit on that order and compare
    val nfDesc = ff.map(r => (r._1, r._2, r._5)).groupBy(_._2)
      .map { case (_, rows) =>
        var bins = 1L; var fill = 0L
        rows.sortBy(r => (-r._3, r._1)).foreach { case (_, _, n) =>
          if (fill > 0 && fill + n > budget) { bins += 1; fill = 0 }
          fill += n
        }
        bins
      }.sum
    val ffBins = ff.map(r => (r._2, r._3)).distinct.length
    assert(ffBins <= nfDesc, s"first-fit used $ffBins bins vs next-fit $nfDesc")
    // and on this organic fixture it should genuinely pack tighter than
    // the id-order packing (the refinement has to buy something)
    val nfId = Sampling.packBinsWholeDoc(docs, budget = 256, shards = 8)
      .select("shard", "bin").distinct().count()
    assert(ffBins <= nfId,
      s"first-fit-decreasing used $ffBins bins vs id-order next-fit $nfId")
  }

  test("sampleN: deterministic, hash-ordered, TakeOrdered plan (no full sort)") {
    val a = Sampling.sampleN(docs, 137).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.length === 137)
    // deterministic across runs and input partitioning
    val b = Sampling.sampleN(docs.repartition(7), 137).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq === b.toSeq)
    // ordered by (rk, id): the first n of the global hash order
    assert(a.toSeq === a.sortBy(r => (r._2, r._1)).toSeq)
    // growing n only APPENDS (prefix stability — the property that lets
    // a pinned sample grow without resampling)
    val bigger = Sampling.sampleN(docs, 200).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(bigger.take(137).toSeq === a.toSeq)
    // plan: TakeOrdered, not a global Sort exchange
    val plan = Sampling.sampleN(docs, 137).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
  }

  test("releaseDiff: added/removed/changed statuses with md5 evidence") {
    import spark.implicits._
    val oldR = Seq((1L, "same"), (2L, "dropped"), (3L, "before")).toDF("doc_id", "text")
    val newR = Seq((1L, "same"), (3L, "after"), (4L, "fresh")).toDF("doc_id", "text")
    val d = graft.operators.TrainingPipeline.releaseDiff(oldR, newR).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(2L -> "removed", 3L -> "changed", 4L -> "added"))
    // unchanged docs are absent, both digests present on changes
    val full = graft.operators.TrainingPipeline.releaseDiff(oldR, newR).collect()
    assert(!full.exists(_.getLong(0) == 1L))
    val ch = full.find(_.getLong(0) == 3L).get
    assert(ch.getString(2) != null && ch.getString(3) != null && ch.getString(2) != ch.getString(3))
  }

  test("packSequences: total tokens are conserved across shards") {
    val p = Sampling.packSequences(docs, budget = 256, shards = 8)
    val packed = p.agg(sum("n_tokens")).head().getLong(0)
    val direct = docs
      .select(size(graft.operators.Dedup.tokens(col("text"))).cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(packed === direct)
  }

  test("temperatureSample: smallest domain kept whole, larger thinned at the alpha ratio") {
    import spark.implicits._
    // planted domains: a=100 docs, b=400, c=10000 -> at alpha=0.5 the
    // keep probs are 1, sqrt(1/4)=0.5, sqrt(1/100)=0.1
    val rows = (1 to 100).map(i => (i.toLong, "a")) ++
      (1000 to 1399).map(i => (i.toLong, "b")) ++
      (10000 until 20000).map(i => (i.toLong, "c"))
    val docs = rows.toDF("doc_id", "lang")
    val out = Sampling.temperatureSample(docs)
    val thr = out.select("lang", "thr").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(thr("a") === 1000000L)
    assert(thr("b") === 500000L)
    assert(thr("c") === 100000L)
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // smallest domain whole; others hash-approximate their rate
    assert(kept("a") === 100L)
    assert(math.abs(kept("b") - 200L) < 60, s"b kept ${kept("b")}")
    assert(math.abs(kept("c") - 1000L) < 150, s"c kept ${kept("c")}")
    // determinism under re-partitioning (id-derived, not partition)
    assert(Sampling.temperatureSample(docs.repartition(7)).collect().toSet
      === out.collect().toSet)
    // general-alpha path (pow): higher temperature flattens less —
    // alpha near 1 approaches proportional (keeps nearly everything)
    val nearOne = Sampling.temperatureSample(docs, alpha = 0.999)
    assert(nearOne.count() > out.count() && nearOne.count() >=
      (docs.count() * 0.98).toLong, s"kept ${nearOne.count()}")
  }

  test("weightedDownsample: decision is hash-deterministic and weight-consistent") {
    val kept = Sampling.weightedDownsample(docs).collect()
    assert(kept.nonEmpty)
    // every kept row satisfies its own inclusion predicate
    assert(kept.forall(r => r.getLong(2) < r.getLong(1)),
      "kept row with bucket >= weight")
    // deterministic: same input -> identical kept set, also after
    // re-partitioning (id-derived hash, not partition-derived)
    val again = Sampling.weightedDownsample(docs.repartition(7)).collect()
    assert(kept.map(_.getLong(0)).toSet === again.map(_.getLong(0)).toSet)
    // survival tracks weight: docs at/above the cap always survive
    val total = docs.count()
    val capped = docs.filter(col("n_chars") >= 2000).count()
    val keptCapped = Sampling.weightedDownsample(docs)
      .join(docs.filter(col("n_chars") >= 2000).select("doc_id"), "doc_id").count()
    assert(keptCapped === capped, "weight >= cap must always survive")
    assert(kept.length < total, "downsampling must drop below-cap docs")
  }

  test("chunkDocuments: spans cover every token, overlap is exact, md5 checks content") {
    import spark.implicits._
    // 10 tokens, chunk 4, overlap 1 -> step 3, chunks = ceil(9/3) = 3:
    // [0,4) [3,7) [6,10)
    val df = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2L, "a b")).toDF("doc_id", "text")
    val out = Sampling.chunkDocuments(df, chunkTokens = 4, overlap = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getString(4)))
    def md5(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.map(c => (c._3, c._4)).toSeq === Seq((0L, 4L), (3L, 4L), (6L, 4L)))
    assert(doc1(1)._5 === md5("t3 t4 t5 t6"))
    // short doc: one chunk, truncated to its length
    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, 0, 0L, 2L, md5("a b"))))
    // no tail chunk fully contained in its predecessor, all tokens covered
    assert(doc1.last._3 + doc1.last._4 === 10L)
  }

  test("stratifiedSample: per-stratum rates engage, default stratum untouched") {
    val rates = Seq("en" -> 0.5, "zh" -> 0.1)
    val kept = Sampling.stratifiedSample(docs, rates).collect()
    assert(kept.forall(r => r.getLong(2) < r.getLong(3)),
      "kept row violates its own threshold predicate")
    val byLang = kept.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // default (unlisted) strata keep EVERYTHING
    assert(byLang("de").toLong === total("de"))
    // rated strata drop a share consistent with the rate (hash-uniform,
    // generous slack at this sample size)
    assert(byLang("en") < total("en"), "en must be downsampled")
    assert(byLang("zh") < total("zh") / 2, "zh at 10% must lose most docs")
    // deterministic under re-partitioning (id-derived hash)
    val again = Sampling.stratifiedSample(docs.repartition(5), rates).collect()
    assert(kept.map(_.getLong(0)).toSet === again.map(_.getLong(0)).toSet)
  }

  test("stratifiedSample: duplicate stratum keys are rejected") {
    // engine foldLeft would let the LAST duplicate win while a SQL
    // CASE mirror takes the FIRST — refuse the ambiguous input
    val ex = intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(docs, Seq("en" -> 0.5, "en" -> 0.1))
    }
    assert(ex.getMessage.contains("duplicate stratum keys"))
  }

  test("domainMixture: output proportions track the weights, untargeted domains drop") {
    val weights = Seq("src0" -> 3L, "src1" -> 1L)
    val out = Sampling.domainMixture(docs, weights, keyCol = "source")
    val byDomain = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // only the targeted domains survive
    assert(byDomain.keySet === Set("src0", "src1"))
    // uniform per-source counts -> src0 keeps ~everything, src1 ~1/3;
    // the realized ratio is hash-approximate, so generous slack
    val ratio = byDomain("src0").toDouble / byDomain("src1")
    assert(ratio > 2.0 && ratio < 4.5, s"mixture ratio $ratio should be ~3")
    // deterministic under re-partitioning (id-derived hash)
    val again = Sampling.domainMixture(docs.repartition(5), weights, keyCol = "source")
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ===
      again.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("domainMixture: threshold math is the exact integer formula") {
    val spark2 = spark
    import spark2.implicits._
    // 60 'a' docs, 20 'b' docs, weights 1:1 -> smin = min(60*2/1, 20*2/1)
    // = 40; thr_a = 1*40*1e6/(2*60) = 333333, thr_b = 1*40*1e6/(2*20)
    // = 1000000 (b kept whole, a downsampled to match)
    val df = (0 until 60).map(i => (i.toLong, "a")) ++
      (100 until 120).map(i => (i.toLong, "b"))
    val out = Sampling.domainMixture(df.toDF("doc_id", "source"),
      Seq("a" -> 1L, "b" -> 1L), keyCol = "source")
    val thr = out.select("source", "thr").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(thr("a") === 333333L)
    assert(thr("b") === 1000000L)
    // every b row survives at threshold 1e6 (hash bucket < 1e6 always)
    assert(out.filter(col("source") === "b").count() === 20L)
  }

  test("domainMixture: invalid inputs are rejected loudly") {
    assert(intercept[IllegalArgumentException] {
      Sampling.domainMixture(docs, Seq.empty, keyCol = "source")
    }.getMessage.contains("at least one"))
    assert(intercept[IllegalArgumentException] {
      Sampling.domainMixture(docs, Seq("src0" -> 0L), keyCol = "source")
    }.getMessage.contains("positive"))
    assert(intercept[IllegalArgumentException] {
      Sampling.domainMixture(docs, Seq("src0" -> 1L, "src0" -> 2L), keyCol = "source")
    }.getMessage.contains("duplicate"))
    // a targeted domain with zero rows would force the whole mixture to
    // zero — refuse instead of silently emptying the corpus
    assert(intercept[IllegalArgumentException] {
      Sampling.domainMixture(docs, Seq("src0" -> 1L, "no_such_source" -> 1L),
        keyCol = "source")
    }.getMessage.contains("no rows"))
  }

  test("tokenBudgetPerKey: inclusive cumsum respects budget; kept set is a hash-order prefix") {
    val out = Sampling.tokenBudgetPerKey(docs, budget = 600L, keyCol = "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.groupBy(_._2).foreach { case (src, rows) =>
      assert(rows.forall(_._4 <= 600L), s"over budget in $src")
      // cum must equal the running sum of n_tokens in cum order (prefix, no gaps)
      val ordered = rows.sortBy(_._4)
      var run = 0L
      ordered.foreach { case (_, _, n, cum) =>
        run += n
        assert(cum === run, s"non-contiguous prefix in $src")
      }
    }
    // stability under re-partitioning
    val b = Sampling.tokenBudgetPerKey(docs.repartition(7), budget = 600L, keyCol = "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(b.toSet === out.toSet)
    assert(intercept[IllegalArgumentException] {
      Sampling.tokenBudgetPerKey(docs, budget = 0L)
    }.getMessage.contains("budget"))
  }

  test("fimTransform: cuts in bounds, PSM segments reassemble the document, edges reachable") {
    import spark.implicits._
    val out = Sampling.fimTransform(docs).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(out.length === docs.count())
    out.foreach { case (id, _, n, lo, hi, _) =>
      assert(0 <= lo && lo <= hi && hi <= n, s"cuts out of order for doc $id")
    }
    assert(out.exists(_._2) && out.exists(!_._2), "both branches must occur")
    // content check: recompute the expected md5 from the raw text + cuts
    val raw = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s0: String): String =
      md.digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    out.foreach { case (id, fim, _, lo, hi, got) =>
      val ws = raw(id).split(" ").filter(_.nonEmpty)
      val expected =
        if (fim)
          "<PRE>" + ws.take(lo.toInt).mkString(" ") +
            "<SUF>" + ws.drop(hi.toInt).mkString(" ") +
            "<MID>" + ws.slice(lo.toInt, hi.toInt).mkString(" ")
        else ws.mkString(" ")
      assert(got === md5hex(expected), s"PSM content mismatch for doc $id")
    }
    // fimPct edges: 0 transforms nothing, 100 transforms everything
    assert(Sampling.fimTransform(docs, fimPct = 0).filter(col("fim")).count() === 0L)
    assert(Sampling.fimTransform(docs, fimPct = 100).filter(!col("fim")).count() === 0L)
  }

  test("curriculum: anneal only above quality floor, hash-stable, independent order key") {
    val out = Sampling.curriculum(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3)))
    assert(out.length === docs.count())
    // anneal ⊆ high-quality slice, and never the whole slice (annealPct < 100)
    val anneal = out.filter(_._3 == "anneal")
    val highQ = out.filter(_._2 >= 0.5)
    assert(anneal.nonEmpty && anneal.length < highQ.length)
    anneal.foreach { case (id, q, _, _) => assert(q >= 0.5, s"doc $id") }
    // below the floor NOTHING anneals regardless of hash bucket
    out.filter(_._2 < 0.5).foreach { case (id, _, p, _) =>
      assert(p === "pretrain", s"doc $id")
    }
    // determinism under re-partition
    val again = Sampling.curriculum(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSet
    assert(again === out.map(r => (r._1, r._3, r._4)).toSet)
    // the order key is a different avalanche than the phase-decision
    // hash (mix32 of the raw id) — scalar twin of IvfSearch.mix32
    def mix32(x: Long): Long = {
      val h0 = ((x % 4294967296L) + 4294967296L) % 4294967296L
      val m2 = ((h0 ^ (h0 >>> 16)) * 40503L) % 4294967296L
      m2 ^ (m2 >>> 13)
    }
    assert(out.exists { case (id, _, _, key) => key != mix32(id) })
    // textCol threading: a renamed text column gives identical output
    val renamed = Sampling.curriculum(
      docs.withColumnRenamed("text", "body"), textCol = "body").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3)))
    assert(renamed.toSet === out.toSet, "curriculum must honor textCol")
    out.foreach { case (id, _, _, key) =>
      assert(key === mix32(id + 1000003L), s"order_key mismatch for doc $id")
    }
  }
}
