package graft

import org.apache.spark.sql.functions._
import graft.operators.Decontamination

/** The eval-side guard: both physical strategies (collected broadcast
  * set vs distributed Bloom sketch + candidate-only exact confirm) must
  * emit the IDENTICAL result on planted and organic data, and the
  * fallback's plan must keep the corpus out of shingle-keyed shuffles
  * and never force-broadcast the over-cap eval frame.
  */
class DecontaminationGuardSpec extends SparkSpec {
  import spark.implicits._

  private def plantedTrain = Seq(
    (1L, "one two three four five"),
    (2L, "alpha beta gamma delta eps"),
    (3L, "zz one two three four qq"),
    (4L, "one two three only"),
    (5L, "totally unrelated words here now")).toDF("doc_id", "text")
  private def plantedEval =
    Seq((100L, "one two three four five")).toDF("doc_id", "text")

  private def organic = {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    (docs.filter(pmod(col("doc_id"), lit(100L)) >= 3),
      docs.filter(pmod(col("doc_id"), lit(100L)) < 3))
  }

  test("minKProb: hand-computed bottom-20% with a partial boundary take") {
    // corpus: doc0 = "a a a b", doc1 = "b c". counts: a=3, b=2, c=1;
    // N=6, V=3 -> lp(a)=ln(4/9), lp(b)=ln(3/9), lp(c)=ln(2/9).
    // doc0: nt=4, K=ceil(0.8)=1; order lp asc: (a, ln(4/9)<ln(3/9)? no:
    //   4/9>3/9 so lp(a)>lp(b) -> bottom is b) -> take 1 of b.
    //   bits = -ln(3/9)/1/ln2.
    // doc1: nt=2, K=1; bottom is c (2/9 < 3/9) -> take 1 of c;
    //   bits = -ln(2/9)/ln2.
    val docs = Seq((0L, "a a a b"), (1L, "b c")).toDF("doc_id", "text")
    val out = Decontamination.minKProb(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect()
    def r4(x: Double) = math.signum(x) * math.floor(math.abs(x) * 1e4 + 0.5) / 1e4
    assert(out(0) === ((0L, 4L, 1L, r4(-math.log(3.0 / 9) / math.log(2)))))
    assert(out(1) === ((1L, 2L, 1L, r4(-math.log(2.0 / 9) / math.log(2)))))
  }

  test("minKProb: common-word doc scores low (memorized-like), rare-word doc high") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    // plant: 9000 = pure high-frequency words; 9001 = unique tokens
    val planted = Seq(
      (9000L, "the the the and and of to a in is the and of to a"),
      (9001L, "qqxyzzy wwplugh zzfoobar jjqwerty kkasdfgh")).toDF("doc_id", "text")
    val out = Decontamination.minKProb(docs.unionByName(planted))
      .filter(col("doc_id") >= 9000L).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect()
    assert(out(0)._4 < out(1)._4,
      s"common-word doc must score fewer Min-K bits: $out")
  }

  test("contaminatedIds: sketch fallback emits the collect path's exact drop set") {
    val small = Decontamination.contaminatedIds(plantedTrain, plantedEval,
      maxCollectedShingles = Long.MaxValue).collect().map(_.getLong(0)).toSet
    val large = Decontamination.contaminatedIds(plantedTrain, plantedEval,
      maxCollectedShingles = 0L).collect().map(_.getLong(0)).toSet
    assert(small === Set(1L, 3L))
    assert(large === small)

    val (tr, ev) = organic
    val a = Decontamination.contaminatedIds(tr, ev, maxCollectedShingles = Long.MaxValue)
      .collect().map(_.getLong(0)).toSet
    val b = Decontamination.contaminatedIds(tr, ev, maxCollectedShingles = 0L)
      .collect().map(_.getLong(0)).toSet
    assert(a === b)
    assert(a.nonEmpty, "organic fixture should contaminate at least one doc")
  }

  test("overlapWith: sketch fallback emits the narrow path's exact ratio rows") {
    def rows(cap: Long) =
      Decontamination.overlapWith(plantedTrain, plantedEval, maxCollectedShingles = cap)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows(Long.MaxValue) === rows(0L))

    val (tr, ev) = organic
    def orows(cap: Long) =
      Decontamination.overlapWith(tr, ev, maxCollectedShingles = cap)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val a = orows(Long.MaxValue)
    assert(a === orows(0L))
    assert(a.nonEmpty)
  }

  test("decontaminate (keep side): both paths keep the identical survivors") {
    def kept(cap: Long) =
      Decontamination.decontaminate(plantedTrain, plantedEval, maxCollectedShingles = cap)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val a = kept(Long.MaxValue)
    assert(a.map(_._1) === Set(2L, 4L, 5L))
    assert(kept(0L) === a)

    val (tr, ev) = organic
    def okept(cap: Long) =
      Decontamination.decontaminate(tr, ev, maxCollectedShingles = cap)
        .collect().map(_.getLong(0)).toSet
    assert(okept(Long.MaxValue) === okept(0L))
  }

  test("keep side + drop side partition the training corpus exactly") {
    val (tr, ev) = organic
    val all = tr.select("doc_id").collect().map(_.getLong(0)).toSet
    val dropped = Decontamination.contaminatedIds(tr, ev, maxCollectedShingles = 0L)
      .collect().map(_.getLong(0)).toSet
    val kept = Decontamination.decontaminate(tr, ev, maxCollectedShingles = 0L)
      .collect().map(_.getLong(0)).toSet
    assert((kept ++ dropped) === all)
    assert(kept.intersect(dropped) === Set.empty)
  }

  test("fallback plan: exact semi confirm, no cartesian, eval side never force-broadcast") {
    // static plan inspection needs the planner's own size estimates out
    // of the way (a tiny test fixture would legitimately auto-broadcast)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val (tr, ev) = organic
      val p = Decontamination.contaminatedIds(tr, ev, maxCollectedShingles = 0L)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(p.contains("LeftSemi"), s"confirm must be an exact semi-join:\n$p")
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      // the over-cap eval frame must not carry a broadcast hint: with
      // auto-broadcast off, a hint-free plan has zero broadcast joins
      assert(!p.contains("BroadcastHashJoin"),
        s"over-cap eval side was force-broadcast:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("semanticDecontaminate: exact twin flags at 1.0, argmax ties to lower eval id") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Array(1.0, 0.0, 0.0)),
      (1L, Array(0.0, 1.0, 0.0)),
      (2L, Array(0.0, 0.0, 1.0))).toDF("vec_id", "embedding")
    // eval 100 and 101 are BOTH exact twins of corpus 0 — the tie on
    // sim 1.0 must resolve to the lower eval id; eval 102 is orthogonal
    val eval = Seq(
      (101L, Array(1.0, 0.0, 0.0)),
      (100L, Array(1.0, 0.0, 0.0)),
      (102L, Array(0.0, 0.0, -1.0))).toDF("vec_id", "embedding")
    val out = Decontamination.semanticDecontaminate(corpus, eval)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out === Seq((0L, 100L, 1.0)),
      "only the twin flags at the 0.75 default; ties go to the lower eval id")
  }

  test("semanticDecontaminate: default threshold screens weak matches (lossy-drop guard)") {
    import spark.implicits._
    val corpus = Seq((0L, Array(1.0, 1.0))).toDF("vec_id", "embedding")
    val eval = Seq((100L, Array(1.0, 0.0))).toDF("vec_id", "embedding") // cos ~0.707
    assert(Decontamination.semanticDecontaminate(corpus, eval).count() === 0L,
      "a ~0.71 cosine neighbour must NOT enter the default drop list")
    assert(Decontamination.semanticDecontaminate(corpus, eval, threshold = 0.5)
      .count() === 1L, "an explicit lower threshold still flags it")
  }

  test("combinedVerdict: component parity and both-signal intersection live at gate SF") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val docs = graft.sources.Tables.documents(spark, sf)
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val train = docs.filter(pmod(col("doc_id"), lit(100)) >= 3)
    val evalDocs = docs.filter(pmod(col("doc_id"), lit(100)) < 3)
    val evalEmb = emb.filter(col("vec_id") < 40)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    val out = Decontamination.combinedVerdict(
        train, evalDocs, emb, evalEmb,
        ratioThreshold = 0.01, simThreshold = 0.45)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getDouble(3), r.getDouble(4), r.getInt(5))))
      .toMap
    // parity with the components it merges
    val lex = Decontamination.overlapWith(train, evalDocs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).filter(_._2 >= 0.01).toMap
    val sem = Decontamination.semanticDecontaminate(emb, evalEmb, threshold = 0.45)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.keySet === lex.keySet ++ sem.keySet)
    out.foreach { case (id, (l, s, ratio, sim, n)) =>
      assert(l === lex.contains(id) && s === sem.contains(id))
      assert(ratio === lex.getOrElse(id, 0.0) && sim === sem.getOrElse(id, 0.0))
      assert(n === (if (l) 1 else 0) + (if (s) 1 else 0))
    }
    // single-signal branches live organically
    assert(out.values.exists(v => v._1 && !v._2))
    assert(out.values.exists(v => v._2 && !v._1))
  }

  test("combinedVerdict: planted doc carrying both signals reports n_signals = 2") {
    val train = Seq(
      (7L, "one two three four five"), // verbatim eval leak
      (8L, "one two three four five extra"), // 2/3 shingles leak: lexical-only
      (9L, "totally unrelated text here")).toDF("doc_id", "text")
    val evalDocs = Seq((100L, "one two three four five")).toDF("doc_id", "text")
    val v7 = Array(1.0, 0.0); val v9 = Array(0.0, 1.0)
    val corpusEmb = Seq((7L, v7), (8L, Array(0.7, -0.7)), (9L, v9))
      .toDF("vec_id", "embedding")
    val evalEmb = Seq((10007L, v7), (10009L, v9)).toDF("vec_id", "embedding")
    val out = Decontamination.combinedVerdict(
        train, evalDocs, corpusEmb, evalEmb,
        ratioThreshold = 0.5, simThreshold = 0.9)
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2), r.getInt(5))))
      .toMap
    assert(out(7L) === ((true, true, 2)), "verbatim + exact-twin = both signals")
    assert(out(8L) === ((true, false, 1)))
    assert(out(9L) === ((false, true, 1)))
  }

  test("evalLeakReport: over-cap eval side degrades to a keyed shuffle, same rows") {
    val (tr, ev) = organic
    def rows(cap: Long) =
      Decontamination.evalLeakReport(tr, ev, maxBroadcastShingleRows = cap)
        .orderBy("eval_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSeq
    val a = rows(Long.MaxValue)
    assert(a === rows(0L))
    assert(a.nonEmpty)
  }
}

/** The one-job eval-side aggregation's exactness contract, pinned
  * directly: under cap+1 the bounded set IS the complete distinct set
  * regardless of partitioning; at saturation the caller sees exactly
  * cap+1 (the over-cap trigger), never a silently truncated "set".
  */
class BoundedSetAggSpec extends SparkSpec {
  import spark.implicits._

  test("bounded set equals the exact distinct set while under cap, across partitionings") {
    val rnd = new scala.util.Random(7)
    (1 to 25).foreach { _ =>
      val nVals = 1 + rnd.nextInt(400)
      val vocab = 1 + rnd.nextInt(60)
      val data = Vector.fill(nVals)(s"s${rnd.nextInt(vocab)}")
      val parts = 1 + rnd.nextInt(8)
      val cap = 1 + rnd.nextInt(80)
      val ds = spark.createDataset(data).repartition(parts)
      val got = ds
        .select(udaf(new graft.functions.BoundedSetAgg(cap + 1)).apply(col("value")))
        .as[Array[String]].head()
      val exact = data.distinct.toSet
      if (exact.size <= cap) {
        assert(got.toSet === exact,
          s"under-cap result must be the complete distinct set (cap=$cap, parts=$parts)")
        assert(got.length === exact.size, "no duplicates in the bounded set")
      } else {
        assert(got.length === cap + 1,
          s"over-cap must saturate at exactly cap+1 (cap=$cap, distinct=${exact.size})")
        assert(got.toSet.subsetOf(exact), "saturated set holds only real elements")
        assert(got.toSet.size === got.length, "no duplicates even at saturation")
      }
    }
  }

  test("empty input yields the empty set, not a null buffer") {
    val ds = spark.createDataset(Seq.empty[String])
    val got = ds
      .select(udaf(new graft.functions.BoundedSetAgg(8)).apply(col("value")))
      .as[Array[String]].head()
    assert(got.length === 0)
  }

  test("canaryScan: counts hits per canary, keeps the zero row, rejects an empty registry") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean text"),
      (2L, "leak CANARY-x here"),
      (3L, "CANARY-x and CANARY-y both"),   // one hit row per canary
      (4L, "also CANARY-y")).toDF("doc_id", "text")
    val out = graft.operators.Decontamination.canaryScan(docs,
        Seq((10L, "CANARY-x"), (20L, "CANARY-y"), (30L, "CANARY-z")))
      .orderBy("canary_id").as[(Long, String, Long, Long)].collect()
    assert(out === Array(
      (10L, "CANARY-x", 2L, 2L),
      (20L, "CANARY-y", 2L, 3L),
      (30L, "CANARY-z", 0L, -1L)))
    intercept[IllegalArgumentException] {
      graft.operators.Decontamination.canaryScan(docs, Seq.empty)
    }
  }

  test("exactSubstringLeaks: exact spans, island split, zero-leak docs absent") {
    val ev = Seq((100L, "p q r s t")).toDF("doc_id", "text")
    val tr = Seq(
      (1L, "a b p q r s t c d"), // one 5-token verbatim run at 3..7
      (2L, "x y z w"),           // clean -> absent
      (3L, "p q r k k k r s t")  // two separated 3-token runs
    ).toDF("doc_id", "text")
    val out = Decontamination.exactSubstringLeaks(tr, ev, k = 3)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect()
    assert(out === Array(
      (1L, 3L, 7L, 5L),
      (3L, 1L, 3L, 3L),
      (3L, 7L, 9L, 3L)))
  }

  test("exactSubstringLeaks: adjacent runs merge into one maximal span") {
    val ev = Seq((100L, "p q r"), (101L, "r s t")).toDF("doc_id", "text")
    // p q r s t: grams p-q-r (i=1, hit), q-r-s (i=2, miss), r-s-t (i=3,
    // hit) - gap 2 > 1 would split, but with k=3 the spans (1,3) and
    // (3,5) touch... the island rule splits on start-gap > 1, so this
    // pins the DOCUMENTED start-gap semantics, not span overlap
    val tr = Seq((1L, "p q r s t")).toDF("doc_id", "text")
    val out = Decontamination.exactSubstringLeaks(tr, ev, k = 3)
      .orderBy("span_start").as[(Long, Long, Long, Long)].collect()
    assert(out === Array((1L, 1L, 3L, 3L), (1L, 3L, 5L, 3L)))
  }

  test("fuzzyContaminated catches the near-paraphrase the exact 13-gram rule misses") {
    // a 30-token eval doc and a train doc differing in two scattered
    // tokens (positions 8 and 20 -> intact runs of 7, 11, 10 tokens,
    // all under dc8's k=13): the exact-substring rule sees nothing,
    // but trigram-shingle Jaccard stays well over 0.5 — the layering
    // argument for carrying BOTH rules
    val evalText = (1 to 30).map(i => s"ev$i").mkString(" ")
    val trainNear = (1 to 30)
      .map(i => if (i == 8 || i == 20) s"sub$i" else s"ev$i").mkString(" ")
    val evalDocs = Seq((900L, evalText)).toDF("doc_id", "text")
    val train = Seq(
      (10L, trainNear),
      (11L, "completely different text with no overlap at all in sight"))
      .toDF("doc_id", "text")
    val fuzzy = Decontamination.fuzzyContaminated(train, evalDocs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(fuzzy.map(p => (p._1, p._2)).toSeq === Seq((900L, 10L)),
      s"near-paraphrase must be flagged, clean doc must not: ${fuzzy.toSeq}")
    assert(fuzzy.head._3 >= 0.5 && fuzzy.head._3 < 1.0)
    // dc8's exact-substring rule misses it entirely: the longest
    // intact run is 11 tokens < k=13
    val exact = Decontamination.exactSubstringLeaks(train, evalDocs)
      .collect()
    assert(exact.isEmpty,
      s"exact-substring rule unexpectedly caught the paraphrase: ${exact.toSeq}")
  }
}
