package graft

import org.apache.spark.sql.functions._
import graft.functions.Bpe
import graft.operators.{Sampling, TextAnalysis}

class BpeSpec extends SparkSpec {

  test("segment: left-to-right non-overlapping pass per merge") {
    // "aaaa" under (a,a): positions (0,1) and (2,3) merge -> [aa, aa];
    // "aaa": (0,1) merges, the consumed middle 'a' is not reconsidered
    assert(Bpe.segment("aaaa", Seq(("a", "a"))).toSeq === Seq("aa", "aa"))
    assert(Bpe.segment("aaa", Seq(("a", "a"))).toSeq === Seq("aa", "a"))
    assert(Bpe.segment("", Seq(("a", "a"))).toSeq === Seq.empty)
  }

  test("segment: merges apply in rank order") {
    // (a,b) then (ab,c) chains to one token...
    assert(Bpe.segment("abc", Seq(("a", "b"), ("ab", "c"))).toSeq === Seq("abc"))
    // ...but reversed ranks can't: (ab,c) runs before any 'ab' symbol
    // exists, then (a,b) produces it too late
    assert(Bpe.segment("abc", Seq(("ab", "c"), ("a", "b"))).toSeq === Seq("ab", "c"))
    // a pattern must match whole symbols, never a symbol's edge:
    // after (a,b), the 'b' inside "ab" cannot merge with the next 'c'
    assert(Bpe.segment("abc", Seq(("a", "b"), ("b", "c"))).toSeq === Seq("ab", "c"))
  }

  test("segment: codepoint symbols (astral-safe)") {
    assert(Bpe.splitCodepoints("a😀b").toSeq === Seq("a", "😀", "b"))
    assert(Bpe.segment("😀😀", Seq(("😀", "😀"))).toSeq === Seq("😀😀"))
  }

  test("maxMatchSegment: leftmost-longest wins; unknown chars consume one codepoint") {
    val pieces = Set("batch", "atch", "at", "ba")
    def mm(w: String) = Bpe.maxMatchSegment(w, pieces, 5).toSeq
    // longest piece at pos 0 beats shorter prefixes
    assert(mm("batched") === Seq("batch", "e", "d"))
    // leftmost first: pos 0 has "ba" even though "atch" starts at pos 1
    assert(mm("batch") === Seq("batch"))
    assert(mm("batxch") === Seq("ba", "t", "x", "c", "h"))
    // fallback consumes single chars, astral-safe
    assert(mm("xatchy") === Seq("x", "atch", "y"))
    assert(Bpe.maxMatchSegment("😀at", Set("at"), 2).toSeq === Seq("😀", "at"))
    assert(mm("") === Seq.empty)
  }

  test("maxMatchTokenize: totals and stream md5 agree with direct segmentation") {
    import spark.implicits._
    val merges = Seq(("a", "t"), ("b", "at"), ("bat", "ch"))
    val pieces = merges.map { case (a, b) => a + b }.toSet // at, bat, batch
    val docs = Seq((0L, "batch the batter"), (1L, ""), (2L, "at bat"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.maxMatchTokenize(docs, merges)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    def md5(s: String) = graft.functions.TextHashing.md5Hex(s)
    val d0 = Seq("batch", "t", "h", "e", "bat", "t", "e", "r") // maxLen 5
    assert(out(0) === ((0L, 3L, 8L, md5(d0.mkString(" ")))))
    assert(out(1) === ((1L, 0L, 0L, md5(""))))
    assert(out(2) === ((2L, 2L, 2L, md5("at bat"))))
    assert(pieces === Set("at", "bat", "batch")) // fixture sanity
  }

  test("poly32 folds codepoints, matching the SQL mirror's per-character ascii()") {
    // independent reference fold over codePoints (the semantics
    // string_split('') + ascii() has in DuckDB)
    def ref(s: String, seed: Long): Long = {
      var h = seed
      s.codePoints().toArray.foreach(cp => h = (h * 131 + cp) & 0xffffffffL)
      h ^= h >>> 16
      h = (h * 40503L) & 0xffffffffL
      h ^ (h >>> 13)
    }
    Seq("plain", "a😀b", "😀😀", "𝕊upplementary").foreach { s =>
      assert(graft.functions.TextHashing.poly32(s, 97L) === ref(s, 97L), s)
    }
  }

  test("train: hand-computed merges on the Sennrich-style corpus") {
    // low x5, lower x2, newest x6, widest x3 (no </w> marker — see
    // Bpe's documented deviations). Pair counts: (e,s)=9 (s,t)=9
    // (w,e)=8 (l,o)=7 (o,w)=7 ... -> tie at 9 breaks lexicographic to
    // (e,s); after merging, (es,t)=9 wins; then the 7-tie breaks to
    // (l,o).
    val dict = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.train(dict, 3)
    assert(merges === Seq(("e", "s"), ("es", "t"), ("l", "o")), merges)
    // training stops early when nothing is left to merge
    val tiny = Bpe.train(Seq(("ab", 1L)), 10)
    assert(tiny === Seq(("a", "b")))
  }

  test("train then segment compresses the training words") {
    val dict = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.train(dict, 8)
    dict.foreach { case (w, _) =>
      val segs = Bpe.segment(w, merges)
      assert(segs.mkString === w, "segmentation must be lossless")
      assert(segs.length < w.length, s"$w should compress under 8 merges")
    }
  }

  test("bpeTrain + bpeTokenize: distributed dict agrees with driver-side training") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low low low low low newest newest"),
      (2L, "newest newest newest newest lower lower widest"),
      (3L, "widest widest"),
      (4L, "")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, numMerges = 3)
    // same word frequencies as the hand corpus -> same merges
    assert(merges === Seq(("e", "s"), ("es", "t"), ("l", "o")), merges)
    val out = TextAnalysis.bpeTokenize(docs, merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // doc 3: widest -> [w,i,d,est] (4 tokens) x2
    val widest = Bpe.segment("widest", merges)
    assert(widest.toSeq === Seq("w", "i", "d", "est"))
    assert(out(3L)._1 === 2L && out(3L)._2 === 8L)
    assert(out(3L)._3 ===
      graft.functions.TextHashing.md5Hex((widest ++ widest).mkString(" ")))
    // empty doc: zero words, zero tokens, md5 of empty stream
    assert(out(4L) === ((0L, 0L, graft.functions.TextHashing.md5Hex(""))))
  }

  test("scale: ~1k merges on a realistic vocabulary; memo hit-rate > 90%") {
    // realistic-vocab shape: the sf documents table has a 31-word
    // vocabulary (merge space exhausts at ~89), so this spec builds a
    // deterministic Zipf corpus with a few thousand distinct words and
    // trains an order more merges than the fixture table — then proves
    // the per-partition memo carries the segmentation cost (a miss
    // runs the O(merges x len) loop; Zipf frequencies must make hits
    // dominate or tokenization cannot hold at 100 TB)
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val letters = "abcdefghijklmnopqrstuvwxyz"
    val vocab = Vector.fill(3000)(
      (0 until (4 + rnd.nextInt(7))).map(_ => letters(rnd.nextInt(26))).mkString)
    val docs = (0 until 1500).map { d =>
      val words = (0 until 200).map { _ =>
        val u = rnd.nextDouble()
        vocab(((u * u * u) * vocab.size).toInt.min(vocab.size - 1))
      }
      (d.toLong, words.mkString(" "))
    }.toDF("doc_id", "text").repartition(4)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = TextAnalysis.bpeTrain(docs, numMerges = 1000)
    assert(merges.size === 1000, s"corpus supports ${merges.size} merges")
    assert(merges.distinct.size === 1000, "merges must be unique pairs")
    val (df, hits, misses) =
      TextAnalysis.bpeTokenizeObserved(docs, merges)
    val n = df.count()
    assert(n === docs.count())
    val total = hits.value + misses.value
    assert(total > 0)
    val hitRate = hits.value.toDouble / total
    assert(hitRate > 0.9,
      f"memo hit rate $hitRate%.3f (hits=${hits.value} misses=${misses.value})")
  }

  test("maxDictWords cap engages: truncated dict excludes rare-word merges") {
    import spark.implicits._
    // 'aaaa' and 'bbbb' dominate; 'cccc' is the rare tail word
    val docs = (Seq.fill(10)("aaaa") ++ Seq.fill(9)("bbbb") ++ Seq("cccc"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val uncapped = TextAnalysis.bpeTrain(docs, numMerges = 6, maxDictWords = 100)
    assert(uncapped.exists { case (a, b) => a.contains("c") || b.contains("c") },
      s"uncapped dict must reach the tail word: $uncapped")
    // cap 2 -> dict = the two most frequent words only; the tail word
    // contributes no pairs, and training stops when a/b pairs exhaust
    val capped = TextAnalysis.bpeTrain(docs, numMerges = 6, maxDictWords = 2)
    assert(capped.forall { case (a, b) => !a.contains("c") && !b.contains("c") },
      s"capped dict leaked the tail word: $capped")
    assert(capped.size < 6, "a/b pairs exhaust before the merge budget")
  }

  test("tokenizer persists with the release and round-trips exactly") {
    import graft.operators.TrainingPipeline
    // hostile symbols on purpose: tokens() splits on ' ' only, so a
    // word (hence a merge symbol) can contain tab, newline or astral
    // codepoints — the reason the format is writeUTF, not merges.txt
    val merges = Seq(("a", "b"), ("ab", "c"), ("x\ty", "z\n"), ("😀", "😀"))
    val dir = java.nio.file.Files.createTempDirectory("graft-tok").toString
    TrainingPipeline.writeTokenizer(merges, dir)
    assert(TrainingPipeline.loadTokenizer(dir) === merges, "rank order + symbols intact")
    // loaded table segments identically to the in-memory one
    val trained = TextAnalysis.bpeTrain(
      graft.sources.Tables.documents(spark, sf), numMerges = 24)
    TrainingPipeline.writeTokenizer(trained, dir)
    val loaded = TrainingPipeline.loadTokenizer(dir)
    assert(loaded === trained)
    val word = "considerable"
    assert(Bpe.segment(word, loaded).toSeq === Bpe.segment(word, trained).toSeq)
  }

  test("viterbiSegment: max-likelihood cover with the documented tie order") {
    def costs(kv: (String, Long)*): java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long]()
      kv.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
      m
    }
    // cheaper two-piece cover beats the expensive whole-word piece
    assert(Bpe.viterbiSegment("ab", costs("ab" -> 5L, "a" -> 1L, "b" -> 1L), 2)
      .toSeq === Seq("a", "b"))
    // cheaper whole-word piece wins
    assert(Bpe.viterbiSegment("ab", costs("ab" -> 1L, "a" -> 1L, "b" -> 1L), 2)
      .toSeq === Seq("ab"))
    // cost tie -> fewer pieces
    assert(Bpe.viterbiSegment("ab", costs("ab" -> 2L, "a" -> 1L, "b" -> 1L), 2)
      .toSeq === Seq("ab"))
    // cost AND piece-count tie -> lexicographically smallest stream:
    // "a ab" < "aa b" (space sorts below 'a')
    assert(Bpe.viterbiSegment("aab",
      costs("aa" -> 2L, "ab" -> 2L, "a" -> 1L, "b" -> 1L), 2)
      .toSeq === Seq("a", "ab"))
    // no cover -> fail fast, not a wrong segmentation
    intercept[IllegalArgumentException] {
      Bpe.viterbiSegment("xy", costs("a" -> 1L), 1)
    }
  }

  test("unigramTokenize: coverage, determinism, and the bootstrap-cover guarantee") {
    import spark.implicits._
    val merges = Seq(("a", "b"), ("ab", "c"))
    val df = Seq(
      (0L, "abc ab junk"),
      (1L, "abc abc"),
      (2L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramTokenize(df, merges)
      .orderBy("doc_id").collect()
    // every word re-segments (bootstrap cover exists for all, incl.
    // chars outside the merge alphabet), empty doc -> md5("")
    assert(out.length === 3)
    assert(out(0).getLong(1) === 3L && out(0).getLong(2) >= 3L)
    assert(out(2).getLong(2) === 0L &&
      out(2).getString(3) === graft.functions.TextHashing.md5Hex(""))
    val again = TextAnalysis.unigramTokenize(df, merges)
      .orderBy("doc_id").collect()
    assert(out.toSeq === again.toSeq)
    // Zipf fixture: the dominant word's whole-word piece is cheap, so
    // Viterbi keeps it atomic while MaxMatch already did — and the
    // stream hash differs from MaxMatch only if likelihoods reorder a
    // boundary (both are valid segmentations of the same text)
    val uni = out(1)
    assert(uni.getLong(2) > 0L)
  }

  test("unigramTokenizeEm1: the M-step recount actually flips a segmentation") {
    import spark.implicits._
    // Planted EM-sensitivity fixture (searched): pieces {ab, bc, ca},
    // occurrences bab x2, cbc x4, cbba x6.
    //   Bootstrap (MaxMatch): bab->[b,ab], cbc->[c,bc], cbba->[c,b,b,a]
    //     counts: b:16, ab:2, c:10, bc:4, a:6  (tot 38)
    //   Viterbi-1: bab->[b,a,b] (singles beat rare ab), cbc->[c,bc],
    //     cbba unchanged -> counts shift: ab drops out, bc thins
    //   Viterbi-2: cbc->[c,b,c] — the re-estimated LM undercuts bc.
    // tok4 (V1) and tok5 (V2) must therefore DISAGREE on doc 2.
    val merges = Seq(("a", "b"), ("b", "c"), ("c", "a"))
    val df = Seq(
      (1L, "bab bab"),
      (2L, "cbc cbc cbc cbc"),
      (3L, "cbba cbba cbba cbba cbba cbba")).toDF("doc_id", "text")
    def md5(s: String) = graft.functions.TextHashing.md5Hex(s)
    val v1 = TextAnalysis.unigramTokenize(df, merges)
      .orderBy("doc_id").collect()
    val v2 = TextAnalysis.unigramTokenizeEm1(df, merges)
      .orderBy("doc_id").collect()
    // doc 2: V1 keeps bc (8 tokens), V2 splits it (12 tokens)
    assert(v1(1).getLong(2) === 8L && v1(1).getString(3) ===
      md5("c bc c bc c bc c bc"))
    assert(v2(1).getLong(2) === 12L && v2(1).getString(3) ===
      md5("c b c c b c c b c c b c"))
    // docs 1 and 3 are EM-stable across the iteration
    assert(v1(0).getString(3) === v2(0).getString(3))
    assert(v1(2).getString(3) === v2(2).getString(3))
    assert(v2(0).getString(3) === md5("b a b b a b"))
    assert(v2(2).getString(3) === md5(Seq.fill(6)("c b b a").mkString(" ")))
  }

  test("unigramTokenizeEm: a SECOND EM round flips again; cap vs convergence agree") {
    import spark.implicits._
    // Searched 2-round fixture: pieces {aa, ba, ca}, occurrences
    // bccb x1, ccba x2, acbb x6, aaca x2. The word aaca re-segments
    // THREE distinct ways:
    //   bootstrap/V1: [aa][ca]   (its own MaxMatch cover is cheapest)
    //   V2 (em1):     [aa][c][a] (ca thins out of the round-1 counts)
    //   V3+:          [a][a][c][a] (aa follows in round 2; fixed point
    //                 from round 3 on — the search verified V3=V4=V5)
    // so tok5 (one round) and tok6 (to convergence) MUST disagree, and
    // a higher cap must not change the converged answer (early stop).
    val merges = Seq(("a", "a"), ("b", "a"), ("c", "a"))
    val df = Seq(
      (1L, "bccb"),
      (2L, "ccba ccba"),
      (3L, Seq.fill(6)("acbb").mkString(" ")),
      (4L, "aaca aaca")).toDF("doc_id", "text")
    def md5(s: String) = graft.functions.TextHashing.md5Hex(s)
    val v2 = TextAnalysis.unigramTokenizeEm1(df, merges)
      .orderBy("doc_id").collect()
    val em3 = TextAnalysis.unigramTokenizeEm(df, merges, rounds = 3)
      .orderBy("doc_id").collect()
    val em5 = TextAnalysis.unigramTokenizeEm(df, merges, rounds = 5)
      .orderBy("doc_id").collect()
    assert(v2(3).getLong(2) === 6L &&
      v2(3).getString(3) === md5("aa c a aa c a"))
    assert(em3(3).getLong(2) === 8L &&
      em3(3).getString(3) === md5("a a c a a a c a"))
    // the other words settle after round 1 and must agree across caps
    assert(em3.map(_.getString(3)).toSeq === em5.map(_.getString(3)).toSeq)
    assert(em3(0).getString(3) === md5("b c c b"))
    assert(em3(1).getString(3) === md5("c c b a c c b a"))
  }

  test("unigram EM: driver dict fast path == distributed dict loop (r19 parity pin)") {
    import spark.implicits._
    // the dd8/gr1 strategy-split discipline on the EM recount loop:
    // smallDictMaxWords = 0 forces the distributed dict passes; the
    // default collects the word-freq dict once and runs every round
    // driver-side. Results must be identical across tok4/tok5/tok6/tok7
    // on the 3-way re-segmentation fixture above, and on testdata docs.
    val merges = Seq(("a", "a"), ("b", "a"), ("c", "a"))
    val df = Seq(
      (1L, "bccb"),
      (2L, "ccba ccba"),
      (3L, Seq.fill(6)("acbb").mkString(" ")),
      (4L, "aaca aaca")).toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) = d.orderBy("doc_id").collect().toSeq
    assert(rows(TextAnalysis.unigramTokenize(df, merges)) ===
      rows(TextAnalysis.unigramTokenize(df, merges, smallDictMaxWords = 0)))
    assert(rows(TextAnalysis.unigramTokenizeEm1(df, merges)) ===
      rows(TextAnalysis.unigramTokenizeEm1(df, merges, smallDictMaxWords = 0)))
    assert(rows(TextAnalysis.unigramTokenizeEm(df, merges, rounds = 3)) ===
      rows(TextAnalysis.unigramTokenizeEm(df, merges, rounds = 3,
        smallDictMaxWords = 0)))
    val pf = TextAnalysis.unigramVocabPrune(df, merges, rounds = 3)
      .orderBy("piece").collect().toSeq
    val pl = TextAnalysis.unigramVocabPrune(df, merges, rounds = 3,
      smallDictMaxWords = 0).orderBy("piece").collect().toSeq
    assert(pf === pl)
    // organic corpus slice: the gate probe + driver loop must agree
    // with the distributed loop on real text too
    val docs = graft.sources.Tables.documents(spark, sf).limit(80)
    val merges2 = TextAnalysis.bpeTrain(docs, numMerges = 30)
    assert(rows(TextAnalysis.unigramTokenizeEm1(docs, merges2)) ===
      rows(TextAnalysis.unigramTokenizeEm1(docs, merges2, smallDictMaxWords = 0)))
  }

  test("unigramVocabPrune: all three bootstrap merges fall out of the converged LM") {
    import spark.implicits._
    val merges = Seq(("a", "a"), ("b", "a"), ("c", "a"))
    val df = Seq(
      (1L, "bccb"),
      (2L, "ccba ccba"),
      (3L, Seq.fill(6)("acbb").mkString(" ")),
      (4L, "aaca aaca")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramVocabPrune(df, merges, rounds = 3)
      .orderBy("piece").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // bootstrap counts: a 6, aa 2, b 14, ba 2, c 12, ca 2 (tot 38);
    // converged counts: a 14, b 16, c 14 (tot 44) — every merge pruned
    def cost(cnt: Long): Long =
      math.floor((math.log(44.0) - math.log(cnt.toDouble)) * 1e6 + 0.5).toLong
    assert(out.keySet === Set("a", "aa", "b", "ba", "c", "ca"))
    assert(out("a") === ((6L, 14L, cost(14), true)))
    assert(out("b") === ((14L, 16L, cost(16), true)))
    assert(out("c") === ((12L, 14L, cost(14), true)))
    assert(out("aa") === ((2L, 0L, -1L, false)))
    assert(out("ba") === ((2L, 0L, -1L, false)))
    assert(out("ca") === ((2L, 0L, -1L, false)))
  }

  test("tokenBudgetPerKey/packSequences honor a supplied token-count column") {
    import spark.implicits._
    val df = Seq(
      (1L, "k", "one two", 100L),
      (2L, "k", "three four", 100L),
      (3L, "k", "five six", 100L)).toDF("doc_id", "source", "text", "n_bpe")
    // whitespace counts (2 each) would keep all 3 under budget 250;
    // the supplied column (100 each) must truncate to 2
    val kept = Sampling.tokenBudgetPerKey(df, budget = 250L,
      tokenCol = Some("n_bpe"))
    assert(kept.count() === 2L)
    assert(kept.select("n_tokens").collect().forall(_.getLong(0) === 100L))
    val packed = Sampling.packSequences(df, budget = 150,
      tokenCol = Some("n_bpe"))
    // 3 docs x 100 tokens in hash shards; every n_tokens is the
    // supplied one
    assert(packed.select("n_tokens").collect().forall(_.getLong(0) === 100L))
  }
}
