package graft

import org.apache.spark.sql.functions._
import graft.operators.{Decontamination, Multimodal, TextAnalysis}
import graft.sources.Tables

class TextAnalysisSpec extends SparkSpec {

  lazy val docs = Tables.documents(spark, sf).cache()

  test("signalCorrelations: perfect and inverted correlations on a planted frame") {
    import spark.implicits._
    // t = b = 1,2,3 (perfectly correlated); n_chars = 3,2,1 (inverted);
    // q is linear in t (all-stopword docs: 0.5 + nw/100*0.5)
    val df = Seq(
      (1L, "a", 3L), (2L, "a a", 2L), (3L, "a a a", 1L))
      .toDF("doc_id", "text", "n_chars")
    val r = TextAnalysis.signalCorrelations(df).collect().head
    assert(r.getLong(0) === 3L)
    assert(r.getDouble(1) === 1.0)
    assert(r.getDouble(2) === -1.0)
    assert(r.getDouble(3) === 1.0)
  }

  test("tokenizerFertility: per-group BPE/word ratio, hand-computed; empty group is 0") {
    import spark.implicits._
    val merges = Seq(("a", "b"))
    val df = Seq(
      (1L, "x", "ab ab c"), // 3 words -> [ab][ab][c] = 3 BPE tokens
      (2L, "y", "abc"),     // 1 word  -> [ab, c]    = 2 BPE tokens
      (3L, "z", "")).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.tokenizerFertility(df, merges).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out("x") === ((1L, 3L, 3L, 1.0)))
    assert(out("y") === ((1L, 1L, 2L, 2.0)))
    assert(out("z") === ((1L, 0L, 0L, 0.0)))
  }

  test("lengthQuantiles: linear interpolation at rank p*(n-1), hand-computed") {
    import spark.implicits._
    // group g: token counts 1,2,3,4,5 -> p10 = 1 + 0.4*(2-1) = 1.4,
    // p50 = 3, p90 = 4 + 0.6*(5-4) = 4.6; group h: single doc of 7
    val df = Seq(
      (1L, "g", "w"), (2L, "g", "w w"), (3L, "g", "w w w"),
      (4L, "g", "w w w w"), (5L, "g", "w w w w w"),
      (6L, "h", "a b c d e f g")).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.lengthQuantiles(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("g") === ((5L, 1.4, 3.0, 4.6)))
    assert(out("h") === ((1L, 7.0, 7.0, 7.0)))
  }

  test("lengthQuantilesApprox: sketch values land inside the exact ±0.05 band") {
    val probs = Seq(0.1, 0.5, 0.9)
    val approx = TextAnalysis.lengthQuantilesApprox(docs, probs = probs).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // exact quantiles at p ± 0.05 bracket the sketch's rank-error bound
    val lo = TextAnalysis.lengthQuantiles(docs,
        probs = probs.map(p => math.max(0.0, p - 0.05))).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val hi = TextAnalysis.lengthQuantiles(docs,
        probs = probs.map(p => math.min(1.0, p + 0.05))).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(approx.nonEmpty)
    approx.foreach { case (g, vs) =>
      vs.indices.foreach { i =>
        assert(lo(g)(i) <= vs(i) && vs(i) <= hi(g)(i),
          s"group $g p${probs(i)}: approx ${vs(i)} outside [${lo(g)(i)}, ${hi(g)(i)}]")
      }
    }
  }

  test("repetition: duplicate 3-gram ratio matches hand count; short docs are 0") {
    import spark.implicits._
    // "a b c" repeated 3x: 7 3-grams, 3 distinct -> ratio 1 - 3/7
    val df = Seq((1L, "a b c a b c a b c"), (2L, "just two")).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(df).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((7, 3, math.floor((1.0 - 3.0 / 7) * 1e4 + 0.5) / 1e4)))
    assert(out(2L) === ((0, 0, 0.0)))
  }

  test("decontamination overlapWith: explicit eval corpus flags the duplicate") {
    import spark.implicits._
    val train = Seq(
      (1L, "one two three four five"),
      (2L, "alpha beta gamma delta eps")).toDF("doc_id", "text")
    val evalDocs = Seq((100L, "one two three four five")).toDF("doc_id", "text")
    val out = Decontamination.overlapWith(train, evalDocs).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ===
      ((1L, 2L, 2L, 1.0)))
  }

  test("gopherRules: each rule flips the pass flag on a planted violator") {
    import spark.implicits._
    val good = ("the quick brown fox jumps over the lazy dog and then " * 3).trim
    val docs = Seq(
      (1L, good),                                       // all rules pass
      (2L, "too few words here"),                       // word-count floor
      (3L, good + " " + Seq.fill(8)("#").mkString(" ")),  // symbol ratio 8/41 > 0.1
      (4L, (1 to 30).map(i => s"- bullet $i").mkString("\n")), // all-bullet doc
      (5L, good + "\nto be continued...\nmore dots follow..."), // 2/3 ellipsis
      (6L, ("zz yy xx ww vv " * 6).trim))               // zero stopword kinds
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, minWords = 10).collect()
      .map(r => r.getLong(0) -> r.getBoolean(7)).toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> false,
      4L -> false, 5L -> false, 6L -> false))
    val sig = TextAnalysis.gopherRules(docs, minWords = 10).collect()
      .map(r => r.getLong(0) -> r).toMap
    // hand-checked signals: doc 1 repeats an 11-word sentence 3x,
    // bullet doc 4 is 30/30 bullet lines, doc 5 is 2 of 3 ellipsis
    assert(sig(1L).getInt(1) === 33)
    assert(sig(4L).getDouble(4) === 1.0)
    assert(sig(5L).getDouble(5) === 0.6667)
    assert(sig(6L).getInt(6) === 0)
  }

  test("TextHashing.normalize is the exact twin of normalizedText") {
    import spark.implicits._
    // planted mess: every whitespace kind the widened class covers,
    // non-ASCII to exercise lower()'s slow path, empties, no-op input
    val messy = Seq(
      "  Foo\tBAR\r\nbaz  ",
      "\n\nA  B\t\tC\r",
      "ünÏçØdé MIXED Case",
      "already clean",
      "",
      " \t\r\n ",
      "trailingvtab stays")  // \v is NOT in the class: must survive
    val planted = messy.toDF("text")
    val viaColumn = planted
      .select(TextAnalysis.normalizedText(col("text"))).as[String].collect()
    val viaScala = messy.map(graft.functions.TextHashing.normalize)
    assert(viaColumn.toSeq === viaScala)
    // organic cross-check: byte-identical on every gate-SF document
    val diff = docs.select(
      TextAnalysis.normalizedText(col("text")).as("a"), col("text"))
      .as[(String, String)]
      .filter { case (a, t) => a != graft.functions.TextHashing.normalize(t) }
      .count()
    assert(diff === 0L)
  }

  test("decontamination contaminatedIds matches overlapWith's drop set") {
    import spark.implicits._
    // doc 1 overlaps fully, doc 3 shares exactly one 4-gram spanning a
    // boundary, docs 2/4 are clean — the id form must flag exactly the
    // docs the ratio form reports, on organic data too
    val train = Seq(
      (1L, "one two three four five"),
      (2L, "alpha beta gamma delta eps"),
      (3L, "zz one two three four qq"),
      (4L, "one two three only")).toDF("doc_id", "text")
    val evalDocs = Seq((100L, "one two three four five")).toDF("doc_id", "text")
    val ids = Decontamination.contaminatedIds(train, evalDocs)
      .collect().map(_.getLong(0)).toSet
    val ratioIds = Decontamination.overlapWith(train, evalDocs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === ratioIds)
    assert(ids === Set(1L, 3L))
    // organic cross-check at the gate SF: same drop set on real docs
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val ev = docs.filter(pmod(col("doc_id"), lit(100L)) < 3)
    val tr = docs.filter(pmod(col("doc_id"), lit(100L)) >= 3)
    val a = Decontamination.contaminatedIds(tr, ev).collect().map(_.getLong(0)).toSet
    val b = Decontamination.overlapWith(tr, ev)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    assert(a.nonEmpty, "fixture should produce at least one organic contamination")
  }

  test("evalLeakReport: per-eval-doc leak counts on a planted leak") {
    import spark.implicits._
    val train = Seq(
      (10L, "one two three four five"),        // leaks eval 100 fully
      (11L, "zz one two three four qq"),       // leaks 1 gram of eval 100
      (12L, "alpha beta gamma delta eps")).toDF("doc_id", "text") // clean
    val evalDocs = Seq(
      (100L, "one two three four five"),       // 2 grams, both leaked
      (101L, "untouched words stay here safe") // never leaked -> absent
    ).toDF("doc_id", "text")
    val out = Decontamination.evalLeakReport(train, evalDocs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.keySet === Set(100L))
    // 2 of 2 grams leaked, carried by 2 distinct train docs
    assert(out(100L) === ((2L, 2L, 2L, 1.0)))
  }

  test("decontamination flags a train doc that duplicates an eval doc") {
    import spark.implicits._
    // mix32(0) = 0 -> doc 0 lands in the eval split (0 % 19 == 0);
    // mix32(1)/mix32(2) do not
    val df = Seq(
      (0L, "one two three four five"),   // eval
      (1L, "one two three four five"),   // train, contaminated (2/2 grams)
      (2L, "alpha beta gamma delta eps") // train, clean -> not in output
    ).toDF("doc_id", "text")
    val out = Decontamination.overlap(df).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ===
      ((1L, 2L, 2L, 1.0)))
  }

  test("language id emits a known code per doc, deterministically") {
    val out = TextAnalysis.languageId(docs)
    val preds = out.select("predicted_lang").distinct().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(Set("en", "de", "es", "fr", "zh", "und")))
    assert(out.count() === docs.count())
  }

  test("fingerprint matches the hand-computed rolling hash") {
    import spark.implicits._
    val df = Seq((7L, "ab cde")).toDF("doc_id", "text")
    // atoms: len*31 + ascii(first): "ab" -> 2*31+97 = 159; "cde" -> 3*31+99 = 192
    // fold: ((0*131+159)%p)*131 + 192 = 159*131+192 = 21021
    val fp = TextAnalysis.fingerprint(df).head.getLong(1)
    assert(fp === 159L * 131 + 192)
  }

  test("quality score is bounded and ratios are consistent") {
    val q = TextAnalysis.quality(docs)
    val bad = q.filter(col("quality_score") < 0 || col("quality_score") > 1).count()
    assert(bad === 0)
    assert(q.filter(col("n_stop") > col("n_words")).count() === 0)
  }

  test("normalize: lowercases, collapses whitespace (tab/CR/LF too), trims") {
    implicit val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "  Mixed   CASE  text "),
      (2L, "already clean text"),
      // real-corpus whitespace: tabs, CRLF line breaks, bare LF runs
      (3L, "\tLine one\r\nline\ttwo\n\n end\r")).toDF("doc_id", "text")
    val out = TextAnalysis.normalize(df).collect().map(r => r.getLong(0) -> r).toMap
    def md5(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(out(1L).getString(1) === md5("mixed case text"))
    assert(out(1L).getBoolean(2) === true)
    assert(out(1L).getInt(3) === "  Mixed   CASE  text ".length - "mixed case text".length)
    assert(out(2L).getString(1) === md5("already clean text"))
    assert(out(2L).getBoolean(2) === false)
    assert(out(2L).getInt(3) === 0)
    assert(out(3L).getString(1) === md5("line one line two end"))
    assert(out(3L).getBoolean(2) === true)
    assert(out(3L).getInt(3) ===
      "\tLine one\r\nline\ttwo\n\n end\r".length - "line one line two end".length)
  }

  test("urlDomains: extracts hosts, counts urls vs distinct docs") {
    implicit val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "see https://a.org/x and https://a.org/y plus https://b.net/z"),
      (2L, "only https://a.org/w here"),
      (3L, "no urls at all")).toDF("doc_id", "text")
    val out = TextAnalysis.urlDomains(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map("a.org" -> ((3L, 2L)), "b.net" -> ((1L, 1L))))
  }

  test("topBigrams matches a hand-computed fixture, ordered and limited") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b c"), // bigrams: "a b" x2, "b a", "b c"
      (2L, "a b x"))     // bigrams: "a b", "b x"
      .toDF("doc_id", "text")
    val out = TextAnalysis.topBigrams(df, topK = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // "a b": 3 occurrences across 2 docs; then ties at 1 break by text
    assert(out.toSeq === Seq(("a b", 3L, 2L), ("b a", 1L, 1L), ("b c", 1L, 1L)))
  }

  test("tf-idf matches a hand-computed fixture") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a"),   // tf(a)=2, tf(b)=1
      (2L, "a c"),     // tf(a)=1, tf(c)=1
      (3L, "c c d"))   // tf(c)=2, tf(d)=1
      .toDF("doc_id", "text")
    val out = TextAnalysis.tfIdf(df).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    def e(tf: Long, dfq: Long) = math.rint(tf * math.log(3.0 / dfq) * 1e4) / 1e4
    assert(out((1L, "a")) === ((2L, 2L, e(2, 2))))
    assert(out((1L, "b")) === ((1L, 1L, e(1, 1))))
    assert(out((2L, "c")) === ((1L, 2L, e(1, 2))))
    assert(out((3L, "c")) === ((2L, 2L, e(2, 2))))
    assert(out((3L, "d")) === ((1L, 1L, e(1, 1))))
    assert(out.size === 6)
    // a term present in every doc has idf 0
    assert(TextAnalysis.tfIdf(Seq((1L, "x"), (2L, "x")).toDF("doc_id", "text"))
      .filter(col("term") === "x").collect().forall(_.getDouble(4) === 0.0))
  }

  test("frame sampling: stride covers the payload, md5 identifies frames") {
    implicit val s = spark
    import s.implicits._
    // 600 chars -> 3 frames of 256/256/88; nF=3 <= 8 target -> stride 1
    val text = ("ab" * 300)
    val df = Seq((5L, text)).toDF("doc_id", "text")
    val frames = Multimodal.frameSample(df).collect().sortBy(_.frame_idx)
    assert(frames.length === 3)
    assert(frames.map(_.frame_off).toSeq === Seq(0, 256, 512))
    assert(frames.map(_.frame_len).toSeq === Seq(256, 256, 88))
    val md5head = java.security.MessageDigest.getInstance("MD5")
      .digest(text.substring(0, 256).getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(frames.head.frame_md5 === md5head)
    // long payload: 40 frames -> stride 5 -> 8 sampled frames
    val long = Seq((6L, "x" * (256 * 40))).toDF("doc_id", "text")
    val sampled = Multimodal.frameSample(long).collect()
    assert(sampled.length === 8)
    assert(sampled.map(_.frame_idx).sorted.toSeq === Seq(0, 5, 10, 15, 20, 25, 30, 35))
  }

  test("byte resize: cells are mean byte values of contiguous slices") {
    implicit val s = spark
    import s.implicits._
    // 32 chars over 16 segments -> 2 bytes each; 'a'=97, 'b'=98
    val df = Seq((9L, "ab" * 16)).toDF("doc_id", "text")
    val cells = Multimodal.resizeBytes(df).collect().sortBy(_.seg)
    assert(cells.length === 16)
    assert(cells.forall(_.value === 97.5))
  }

  test("redactPii: planted emails/URLs are counted and replaced, clean text untouched") {
    implicit val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "reach me at jo.doe+spam@mail.example.org or https://a.example/x?q=1 thanks"),
      (2L, "two mails a@b.io c.d@e.co.uk and plain text"),
      (3L, "no pii here at all")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.redactPii(df)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) === 1 && out(1L).getInt(2) === 1)
    assert(out(2L).getInt(1) === 2 && out(2L).getInt(2) === 0)
    assert(out(3L).getInt(1) === 0 && out(3L).getInt(2) === 0)
    // the redacted hash equals the hand-redacted text's md5
    def md5(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(out(1L).getString(3) === md5("reach me at <EMAIL> or <URL> thanks"))
    assert(out(2L).getString(3) === md5("two mails <EMAIL> <EMAIL> and plain text"))
    assert(out(3L).getString(3) === md5("no pii here at all"))
  }

  test("multimodal stub pipeline: features derive from payload bytes") {
    implicit val s = spark
    import s.implicits._
    val df = Seq((1L, "abc")).toDF("doc_id", "text")
    val f = Multimodal.extractFeatures(df).head()
    assert(f.n_bytes === 3)
    assert(f.n_chunks === 1)
    assert(f.head_hex === "616263".toUpperCase)
    assert(f.feature_vec.length === 4)
    assert(math.abs(f.feature_vec.sum - 1.0f) < 1e-6) // 'a','b','c' all in bucket 3
  }

  test("c4LineFilter: each rule branch drops exactly its line, keepers survive in order") {
    import spark.implicits._
    val text = Seq(
      "this first line ends with a period.",   // kept
      "enable javascript to continue",          // dropped: phrase + no punct
      "home about contact",                     // dropped: no terminal punct
      "var cfg = { a: 1 }",                     // dropped: braces
      "no!",                                    // dropped: < 3 words
      "is this a question?",                    // kept (ends '?')
      "   ",                                    // blank after trim: not a line
      "they said \"stop\"")                     // kept (ends '"')
      .mkString("\n")
    val out = TextAnalysis.c4LineFilter(Seq((7L, text)).toDF("doc_id", "text"))
      .as[(Long, String, Long, Long)].head()
    assert(out._3 === 7L, "blank line must not count")
    assert(out._4 === 4L)
    assert(out._2 === Seq(
      "this first line ends with a period.",
      "is this a question?",
      "they said \"stop\"").mkString("\n"))
  }

  test("c4LineFilter: minWords and custom blocklist are honored; empty doc safe") {
    import spark.implicits._
    val df = Seq(
      (1L, "one two three four all kept here okay."),
      (2L, "tiny line here."),
      (3L, "this mentions cookies policy terms.")).toDF("doc_id", "text")
    val out = TextAnalysis.c4LineFilter(df, minWords = 4,
        badPhrases = Seq("cookies policy"))
      .select("doc_id", "n_removed").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 0L)
    assert(out(2L) === 1L, "three words < minWords=4 must drop")
    assert(out(3L) === 1L, "custom blocklist phrase must drop")
  }

  test("encodingQuality: clean ASCII scores zero; each damage class is counted") {
    import spark.implicits._
    val df = Seq(
      (1L, "perfectly clean ascii text."),
      (2L, "lossy \uFFFD decode \uFFFD here"),
      (3L, "binary\u0007junk\u0001"),            // C0 controls (not \t\n\r)
      (4L, "tabs\tand\nnewlines are fine"),
      (5L, "caf\u00C3\u00A9 mojibake don\u00E2\u20AC\u2122t"),
      (6L, "legit accents caf\u00E9 na\u00EFve")) // non-ascii but NOT flagged
      .toDF("doc_id", "text")
    val out = TextAnalysis.encodingQuality(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(out(1L) === ((0L, 0L, 0L, 0L, false)))
    assert(out(2L) === ((2L, 0L, 0L, 2L, true)))
    assert(out(3L) === ((0L, 2L, 0L, 0L, true)))
    assert(out(4L) === ((0L, 0L, 0L, 0L, false)), "tab/newline are not contamination")
    assert(out(5L)._3 === 2L)
    assert(out(5L)._5 === true)
    assert(out(6L) === ((0L, 0L, 0L, 2L, false)),
      "legitimate non-ASCII must be reported but never flagged")
  }

  test("unigramLogProb: hand-computed Laplace bits on a 3-doc corpus") {
    import spark.implicits._
    // corpus: N=6 tokens, V=3 vocab {a:3, b:2, c:1}
    val df = Seq((1L, "a a b"), (2L, "a b c"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // Spark's round() is BigDecimal HALF_UP — mirror it exactly
    def bits(ps: Seq[Double]) =
      BigDecimal(ps.map(p => -math.log(p) / math.log(2)).sum / ps.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (pa, pb, pc) = (4.0 / 9, 3.0 / 9, 2.0 / 9) // (c+1)/(N+V)
    assert(out(1L)._1 === 3L)
    assert(math.abs(out(1L)._2 - bits(Seq(pa, pa, pb))) < 1e-9)
    assert(math.abs(out(2L)._2 - bits(Seq(pa, pb, pc))) < 1e-9)
    // rare-token docs score strictly more bits than common-token docs
    assert(out(2L)._2 > out(1L)._2)
    assert(!out.contains(3L), "empty docs have no tokens and no LM score")
  }

  test("linearQualityScore: deterministic margins, keep rule, empty-doc zero") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, ""), (4L, "delta")).toDF("doc_id", "text")
    val out = TextAnalysis.linearQualityScore(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val m = out.map(r => r._1 -> r).toMap
    assert(m(1L)._3 === m(2L)._3, "same text -> same margin")
    assert(m(1L)._4 === (m(1L)._3 > 0.0))
    assert(m(3L) === ((3L, 0L, 0.0, false)), "empty doc: zero margin, dropped")
    // single-token margin equals that token's bucket weight
    val bucket = graft.functions.TextHashing.poly32("delta", 97L) % 1024
    val w = ((bucket * 1103515245L + 12345L) % 2048L).toDouble / 1024 - 1.0
    assert(math.abs(m(4L)._3 - math.floor(math.abs(w) * 1e4 + 0.5) / 1e4 * math.signum(w)) < 1e-9)
  }

  test("linearQualityScore: trained weights swap in; LCG parity; plan unchanged") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
    val d = 1024
    // a weights table replaying the LCG formula must be BIT-IDENTICAL
    // to the default path — proving "swap weightOf for a broadcast
    // lookup and nothing else changes"
    val lcg = (0 until d).map(b =>
      (b.toLong, ((b * 1103515245L + 12345L) % (2L * d)).toDouble / d - 1.0))
      .toDF("bucket", "weight")
    def dump(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toSet
    val base = dump(TextAnalysis.linearQualityScore(docs))
    assert(dump(TextAnalysis.linearQualityScore(docs, weights = Some(lcg)))
      === base)
    // an all-ones table gives margin exactly 1.0 on every non-empty doc
    val ones = (0 until d).map(b => (b.toLong, 1.0)).toDF("bucket", "weight")
    val swapped = TextAnalysis.linearQualityScore(docs, weights = Some(ones))
    assert(swapped.collect().forall(r =>
      r.getLong(1) == 0L || (r.getDouble(2) == 1.0 && r.getBoolean(3))))
    // the trained path stays a zero-shuffle narrow pass: the lookup is
    // a broadcast read, never a join
    val p = swapped.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange hashpartitioning") && !p.contains("Join"),
      s"weights path must not add a shuffle or join:\n$p")
  }

  test("bigramLogProb: hand-computed Laplace bigram surprisal; short docs zero") {
    import spark.implicits._
    // corpus "a b a b" + "x": c2(a,b)=2, c2(b,a)=1; c1 a=2 b=2 x=1; V=3
    // p(b|a)=3/5, p(a|b)=2/5 -> bits = -(2 ln .6 + ln .4)/3/ln 2 = 0.932
    val df = Seq((1L, "a b a b"), (2L, "x"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) === ((3L, 0.932)))
    assert(out(2L) === ((0L, 0.0)), "single-token doc has no transitions")
    assert(out(3L) === ((0L, 0.0)), "empty doc has no transitions")
  }

  test("bigramLogProb: broadcast history fold == keyed-join fallback, row for row") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val folded = TextAnalysis.bigramLogProb(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val keyed = TextAnalysis.bigramLogProb(docs, maxBroadcastVocab = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(folded === keyed)
    assert(folded.nonEmpty)
    spark.catalog.clearCache() // fallback path leaves c1 persisted by contract
  }

  test("trainQualityWeightsBatched: identical 6-dp trajectory, O(1) jobs in iters") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
    val labeled = docs.select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .withColumn("label", (col("doc_id") % 3 === 0).cast("double"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // numerics contract: the batched Gram walk reproduces the iterative
    // trajectory exactly at the 6-dp rounding discipline
    (Seq(1, 2, 5)).foreach { k =>
      assert(asMap(TextAnalysis.trainQualityWeightsBatched(labeled, iters = k))
        === asMap(TextAnalysis.trainQualityWeights(labeled, iters = k)),
        s"trajectories diverged at iters=$k")
    }
    // job economics: batched job count must not grow with iters (the
    // sufficient statistics are collected once; steps are driver-side)
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
    }
    def countJobs(body: => Unit): Int = {
      spark.sparkContext.addSparkListener(listener)
      jobs.set(0)
      try { body; Thread.sleep(300); jobs.get() }
      finally spark.sparkContext.removeSparkListener(listener)
    }
    val b2 = countJobs(TextAnalysis.trainQualityWeightsBatched(labeled, iters = 2)
      .collect(): Unit)
    val b8 = countJobs(TextAnalysis.trainQualityWeightsBatched(labeled, iters = 8)
      .collect(): Unit)
    val i8 = countJobs(TextAnalysis.trainQualityWeights(labeled, iters = 8)
      .collect(): Unit)
    assert(b8 === b2, s"batched jobs grew with iters: $b2 -> $b8")
    assert(b8 < i8, s"batched ($b8 jobs) must undercut iterative ($i8 jobs) at iters=8")
    labeled.unpersist()
  }

  test("trainQualityWeights: hand-walked gradient steps, determinism, zero-drop") {
    import spark.implicits._
    // two single-token docs in distinct buckets: doc1 "aa aa" (x=1,
    // y=1), doc2 "bb" (x=1, y=0). N=2.
    val b1 = (graft.functions.TextHashing.poly32("aa", 97L) % 1024).toInt
    val b2 = (graft.functions.TextHashing.poly32("bb", 97L) % 1024).toInt
    assert(b1 !== b2, "fixture tokens must not collide")
    val docs = Seq((1L, "aa aa", 1.0), (2L, "bb", 0.0))
      .toDF("doc_id", "text", "label")
    // iter 1: w=0 -> err=-y -> grad_b1 = (1*(0-1))/2 = -0.5 -> w_b1 = 0.25;
    // grad_b2 = 0 -> b2 stays 0 and is dropped from the output
    val w1 = TextAnalysis.trainQualityWeights(docs, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w1 === Map(b1.toLong -> 0.25), w1)
    // iter 2: margin1 = 0.25 -> err1 = -0.75 -> grad_b1 = -0.375 ->
    // w_b1 = 0.25 + 0.1875 = 0.4375
    val w2 = TextAnalysis.trainQualityWeights(docs, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w2 === Map(b1.toLong -> 0.4375), w2)
    // determinism under re-partition (the 6-dp rounding discipline)
    val again = TextAnalysis.trainQualityWeights(docs.repartition(5), iters = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again === w2)
  }

  test("trainQualityWeights feeds linearQualityScore: trained margins separate labels") {
    import spark.implicits._
    // quality-labeled corpus slice: train, swap the table in, score —
    // trained margins must be higher on label-1 docs than label-0 docs
    // (the probe moves toward its targets even in 3 steps)
    val docs = graft.sources.Tables.documents(spark, sf)
    val r4 = graft.functions.GraftFunctions.round4 _
    val words = graft.operators.Dedup.tokens(col("text"))
    val score = r4(size(filter(words, w =>
      w.isin("the", "a", "of", "and", "in", "to", "is"))).cast("double")
      / size(words) * 0.5 + least(size(words), lit(100)).cast("double") / 100 * 0.5)
    val labeled = docs.select(col("doc_id").cast("long").as("doc_id"),
      col("text"), (score >= 0.5).cast("double").as("label"))
    val weights = TextAnalysis.trainQualityWeights(labeled, iters = 3)
    val scored = TextAnalysis.linearQualityScore(docs, weights = Some(weights))
      .select(col("doc_id").cast("long").as("doc_id"), col("margin"))
      .join(labeled.select(col("doc_id"), col("label")), "doc_id")
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val pos = scored.filter(_._2 == 1.0).map(_._1)
    val neg = scored.filter(_._2 == 0.0).map(_._1)
    assert(pos.nonEmpty && neg.nonEmpty, "both label classes must exist at this SF")
    assert(pos.sum / pos.length > neg.sum / neg.length,
      s"trained margins must separate: pos=${pos.sum / pos.length} neg=${neg.sum / neg.length}")
  }

  test("charStats: hand-computed entropy and 4-gram ratio, degenerate edges") {
    import spark.implicits._
    val df = Seq(
      (1L, "aaaa"),      // one symbol: entropy 0; one gram, ratio 1
      (2L, "abababab"),  // two symbols 50/50: entropy 1; grams cycle with period 2
      (3L, ""),          // empty: entropy 0, no grams, ratio 1 by convention
      (4L, "abcd"),
      // astral-plane: each emoji is ONE codepoint (2 UTF-16 units) —
      // counts must follow the oracle's codepoint semantics
      (5L, "😀😀😀😀"), // 😀×4
      (6L, "a😀b😀")).toDF("doc_id", "text")
    val out = TextAnalysis.charStats(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(out(1L) === ((4L, 0.0, 1L, 1L, 1.0)))
    // "abababab": grams at 5 starts = {abab, baba, abab, baba, abab} -> 2 distinct
    assert(out(2L) === ((8L, 1.0, 5L, 2L, 0.4)))
    assert(out(3L) === ((0L, 0.0, 0L, 0L, 1.0)))
    assert(out(4L) === ((4L, 2.0, 1L, 1L, 1.0)))
    // 😀×4 = 4 codepoints of one symbol (UTF-16 would see 8 units of 2
    // alternating surrogates: entropy 1, 5 grams — the r9 advice bug)
    assert(out(5L) === ((4L, 0.0, 1L, 1L, 1.0)))
    // a😀b😀: p = {1/4, 2/4, 1/4} -> entropy 1.5; one 4-codepoint gram
    assert(out(6L) === ((4L, 1.5, 1L, 1L, 1.0)))
  }

  test("corpusCard: hand-checked per-source volume, vocab, langs, short-doc count") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps", "en", "web", 25L),
      (2L, "the quick red fox", "en", "web", 17L),
      (3L, "der schnelle fuchs", "de", "web", 18L),
      (4L, "a b c d e f g h i j k l m n o p q r s t u v w x y z", "en", "books", 51L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.corpusCard(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(6))))
      .toMap
    // web: 3 docs, 5+4+3=12 tokens, vocab {the,quick,brown,fox,jumps,red,
    // der,schnelle,fuchs}=9, 2 langs, all 3 under 25 words
    assert(out("web") === ((3L, 12L, 9L, 2L, 3L)))
    assert(out("books") === ((1L, 26L, 26L, 1L, 0L)))
  }

  test("bm25TopK: hand-computed micro scores on a 2-doc corpus") {
    import spark.implicits._
    val docs = Seq((1L, "x x y"), (2L, "x z")).toDF("doc_id", "text")
    // fixture = top-1 term by df = "x" (df 2); N=2, avgdl=2.5,
    // idf=ln(0.5/2.5+1)=ln(1.2):
    //   d1 tf=2 dl=3: ln(1.2)*4.4/(2+1.2*(0.25+0.9))  -> 237342 micro
    //   d2 tf=1 dl=2: ln(1.2)*2.2/(1+1.2*(0.25+0.6))  -> 198568 micro
    val out = TextAnalysis.bm25TopK(docs,
        rankLo = 1, nQueries = 1, termsPerQuery = 1)
      .orderBy("rnk").as[(Long, Int, Long, Long)].collect()
    assert(out === Array((0L, 1, 1L, 237342L), (0L, 2, 2L, 198568L)))
  }

  test("qlTopK: hand-computed Dirichlet micro-nats on a 2-doc corpus") {
    import spark.implicits._
    val docs = Seq((1L, "x x y"), (2L, "x z")).toDF("doc_id", "text")
    // fixture = top-1 term by df = "x"; |C|=5 tokens, cf(x)=3, mu=2000:
    //   d1 tf=2 dl=3: floor(ln(1+10/6000)*1e6+.5)=1665,
    //                 floor(ln(2000/2003)*1e6+.5)=-1499 -> 166
    //   d2 tf=1 dl=2: 833 + floor(ln(2000/2002)*1e6+.5)=-1000 -> -167
    // (the smoothing term exercises the NEGATIVE floor(x+0.5) path the
    // round() form would get wrong)
    val out = TextAnalysis.qlTopK(docs,
        rankLo = 1, nQueries = 1, termsPerQuery = 1)
      .orderBy("rnk").as[(Long, Int, Long, Long)].collect()
    assert(out === Array((0L, 1, 1L, 166L), (0L, 2, 2L, -167L)))
  }

  test("qlTopK: integer micro sums are repartition-invariant; cache releases") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val (a0, release) = TextAnalysis.qlTopKManaged(docs)
    val a = a0.orderBy("qid", "rnk").collect().toSeq
    release()
    val b = TextAnalysis.qlTopK(docs.repartition(7))
      .orderBy("qid", "rnk").collect().toSeq
    assert(a === b && a.size === 40)
  }

  test("bm25TopK: integer micro sums are repartition-invariant") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val a = TextAnalysis.bm25TopK(docs)
      .orderBy("qid", "rnk").collect().toSeq
    val b = TextAnalysis.bm25TopK(docs.repartition(7))
      .orderBy("qid", "rnk").collect().toSeq
    assert(a === b && a.size === 40)
    // ranks strictly ordered by (score desc, doc_id) within each qid
    a.groupBy(_.getLong(0)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(1))
      sorted.sliding(2).foreach {
        case Seq(x, y) =>
          val ok = x.getLong(3) > y.getLong(3) ||
            (x.getLong(3) == y.getLong(3) && x.getLong(2) < y.getLong(2))
          assert(ok, s"rank order violated: $x vs $y")
        case _ =>
      }
    }
  }

  test("knBigramLogProb: exact replay of the interpolated-KN estimator; screen orders correctly") {
    import spark.implicits._
    val df = Seq(
      (1L, "x y x y x y"), // one dominant transition pattern
      (2L, "x q z y w"),   // four one-off transitions
      (3L, "z")).toDF("doc_id", "text") // no transitions -> (0, 0.0)
    val out = TextAnalysis.knBigramLogProb(df).orderBy("doc_id").collect()
    // replay the contract: bigram counts over the whole fixture, history
    // mass + distinct continuations, continuation distribution, D=0.75,
    // micro-nat rounding per (doc, a, b) row before the per-doc sum
    val docs = Seq(1L -> "x y x y x y", 2L -> "x q z y w", 3L -> "z")
    val pairs = docs.flatMap { case (id, t) =>
      val w = t.split(' '); w.sliding(2).filter(_.length == 2).map(p => (id, p(0), p(1)))
    }
    val dt = pairs.groupBy(identity).map { case ((id, a, b), g) => (id, a, b, g.size.toLong) }
    val c2 = pairs.groupBy(p => (p._2, p._3)).map { case ((a, b), g) => ((a, b), g.size.toLong) }
    val ca = c2.groupBy(_._1._1).map { case (a, g) => (a, (g.values.sum, g.size.toLong)) }
    val nb = c2.groupBy(_._1._2).map { case (b, g) => (b, g.size.toLong) }
    val nt = c2.size.toLong
    def bits(id: Long): (Long, Double) = {
      val rows = dt.filter(_._1 == id)
      val n = rows.map(_._4).sum
      val mic = rows.map { case (_, a, b, k) =>
        val (cam, n1a) = ca(a)
        val p = math.max(c2((a, b)) - 0.75, 0.0) / cam +
          0.75 * n1a / cam * (nb(b).toDouble / nt)
        math.floor(k * (-math.log(p)) * 1e6 + 0.5).toLong
      }.sum
      (n, BigDecimal(mic / 1e6 / n / math.log(2.0))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val (n1, b1) = bits(1L)
    val (n2, b2) = bits(2L)
    assert(out(0).getLong(1) === n1 && out(0).getDouble(2) === b1)
    assert(out(1).getLong(1) === n2 && out(1).getDouble(2) === b2)
    assert(out(2).getLong(1) === 0L && out(2).getDouble(2) === 0.0)
    // the screen's purpose: one-off word salad reads higher surprisal
    assert(b2 > b1, s"expected salad $b2 > patterned $b1")
  }

  test("knBigramLogProb: repartition-invariant; managed release drops the cache") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val a = TextAnalysis.knBigramLogProb(docs).orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.knBigramLogProb(docs.repartition(7))
      .orderBy("doc_id").collect().toSeq
    assert(a === b && a.nonEmpty)
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.size
    val (df, release) = TextAnalysis.knBigramLogProbManaged(docs)
    assert(df.count() > 0)
    release()
    assert(spark.sparkContext.getPersistentRDDs.size === before,
      "release() must unpersist the bigram-type frame")
  }

  test("topKByGroup: bit-identical to the rank-window form, ties included") {
    import spark.implicits._
    // seeded congruential scores with heavy collisions (mod 7) so the
    // (score desc, id asc) tie-break is genuinely exercised; 3 groups,
    // 200 candidates each, k smaller than the candidate count
    val rows = (0 until 600).map { i =>
      (i % 3L, ((i * 2654435761L) % 7L).abs, i.toLong)
    }
    val scores = rows.toDF("qid", "s", "doc_id").repartition(11)
    val got = TextAnalysis.topKByGroup(scores, "qid", "s", "doc_id", 5)
      .orderBy("qid", "rnk").as[(Long, Int, Long, Long)].collect().toSeq
    val want = rows.groupBy(_._1).toSeq.flatMap { case (q, g) =>
      g.sortBy { case (_, s, id) => (-s, id) }.take(5).zipWithIndex
        .map { case ((_, s, id), i) => (q, i + 1, id, s) }
    }.sortBy(r => (r._1, r._2))
    assert(got === want)
  }

  test("bm25TopKManaged: release thunk unpersists the chain's tf cache") {
    // pristine cache state: CacheManager dedups identical plans, so a
    // tf frame leaked by an earlier (unmanaged) bm25 call in this suite
    // would absorb this call's persist and mask the release
    spark.catalog.clearCache()
    val docs = graft.sources.Tables.documents(spark, sf)
    def cachedRdds(): Int = spark.sparkContext.getPersistentRDDs.size
    val before = cachedRdds()
    val (df, release) = TextAnalysis.bm25TopKManaged(docs)
    assert(df.count() === 40)
    assert(cachedRdds() > before,
      "the chain should have persisted its tf frame")
    release()
    assert(cachedRdds() === before,
      "release() must unpersist the tf frame — looped callers leak otherwise")
  }

  test("rrfFusionTopK: hand-computed fusion on a 3-doc corpus") {
    import spark.implicits._
    val docs = Seq((1L, "x x y"), (2L, "x z"), (3L, "y z w"))
      .toDF("doc_id", "text")
    // query = top-1 df term = x (df 2; ties y/z broken lexically).
    // BM25 micro: d1 624307 > d2 523548 -> r1 = 1, 2.
    // cosine: m=floor(tf*ln(3/2)*1e4+.5) -> d1 dot 8109 norm²=8109²+4055²
    // -> 894405 micro; d2 dot 4055 norm²=2·4055² -> 707107 -> r2 = 1, 2.
    // rrf: 1e6//61·2 = 32786, 1e6//62·2 = 32258.
    val out = TextAnalysis.rrfFusionTopK(docs,
        rankLo = 1, nQueries = 1, termsPerQuery = 1)
      .orderBy("rnk").as[(Long, Int, Long, Long, Int, Int)].collect()
    assert(out === Array(
      (0L, 1, 1L, 32786L, 1, 1),
      (0L, 2, 2L, 32258L, 2, 2)))
  }

  test("rrfFusionTopK: fused credit recomputes from the emitted ranks; repartition-invariant") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val a = TextAnalysis.rrfFusionTopK(docs)
      .orderBy("qid", "rnk").collect().toSeq
    assert(a.size === 40)
    a.foreach { r =>
      // rank 0 = outside that list's cutoff = zero credit from it
      def credit(rnk: Int): Long = if (rnk > 0) 1000000L / (60 + rnk) else 0L
      val expect = credit(r.getInt(4)) + credit(r.getInt(5))
      assert(r.getLong(3) === expect, s"rrf credit drifted: $r")
    }
    val b = TextAnalysis.rrfFusionTopK(docs.repartition(7))
      .orderBy("qid", "rnk").collect().toSeq
    assert(a === b)
  }

  test("rrfFusionTopK: rank cutoff bites — outside-list docs carry rank 0, zero credit") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val out = TextAnalysis.rrfFusionTopK(docs, topK = 10, rankCutoff = 10)
      .orderBy("qid", "rnk").collect().toSeq
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getInt(4) >= 0 && r.getInt(4) <= 10, s"bm25_rnk out of cutoff: $r")
      assert(r.getInt(5) >= 0 && r.getInt(5) <= 10, s"cos_rnk out of cutoff: $r")
    }
    // the two lists disagree enough at the fixture that some fused
    // doc sits outside one list's top-10 — the cutoff must actually
    // bite (rank 0), not silently fall back to full ranks
    assert(out.exists(r => r.getInt(4) == 0 || r.getInt(5) == 0),
      s"expected at least one single-list doc at cutoff 10:\n${out.mkString("\n")}")
  }

  test("bm25 index round-trip: loaded artifact probes identically to the live postings") {
    import spark.implicits._
    val corpus = graft.sources.Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("bm25-release").toString
    graft.operators.TrainingPipeline.writeBm25Index(corpus, dir)
    val loaded = graft.operators.TrainingPipeline.loadBm25Index(spark, dir)
    val queries = Seq((0L, "the"), (0L, "a"), (1L, "data")).toDF("qid", "term")
    val live = TextAnalysis.probeBm25(TextAnalysis.bm25Postings(corpus), queries)
      .orderBy("qid", "rnk").collect().toSeq
    val art = TextAnalysis.probeBm25(loaded, queries)
      .orderBy("qid", "rnk").collect().toSeq
    assert(art === live && art.nonEmpty)
  }

  test("probeBm25: OOV terms contribute zero; unstamped frame fails fast") {
    import spark.implicits._
    val docs = Seq((1L, "x x y"), (2L, "x z")).toDF("doc_id", "text")
    val post = TextAnalysis.bm25Postings(docs)
    val withOov = TextAnalysis.probeBm25(post,
      Seq((0L, "x"), (0L, "never-seen-term")).toDF("qid", "term"))
      .orderBy("rnk").collect().toSeq
    val without = TextAnalysis.probeBm25(post,
      Seq((0L, "x")).toDF("qid", "term"))
      .orderBy("rnk").collect().toSeq
    assert(withOov === without && withOov.nonEmpty)
    val err = intercept[IllegalArgumentException] {
      TextAnalysis.probeBm25(post.select(col("term"), col("doc_id"),
          col("tf").cast("long").as("tf"), col("df"), col("dl")),
        Seq((0L, "x")).toDF("qid", "term"))
    }
    assert(err.getMessage.contains("stamp"))
  }

  test("bm25TopK: vocabulary smaller than the fixture fails fast") {
    import spark.implicits._
    val docs = Seq((1L, "only two"), (2L, "two words")).toDF("doc_id", "text")
    val err = intercept[IllegalArgumentException] {
      TextAnalysis.bm25TopK(docs, rankLo = 12)
    }
    assert(err.getMessage.contains("vocabulary too small"))
  }
}
