package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, GraphRank, TextAnalysis}

/** Shared helper: run labelPropagation and index the result by node. */
object EventsGraphHelpers {
  def lpa(edges: org.apache.spark.sql.DataFrame, rounds: Int)
      : Map[String, (String, Long)] =
    GraphRank.labelPropagation(edges, rounds)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
}

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  /** (user, epoch_sec, type, value, event_id) fixture -> events frame. */
  private def ev(rows: (Long, Long, String, Double, Long)*): DataFrame =
    rows.toSeq.toDF("user_id", "sec", "event_type", "value", "event_id")
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        timestamp_seconds(col("sec")).as("ts"))

  test("sessionize: 30-min gap splits sessions, stats are exact") {
    val events = ev(
      (1L, 0L, "view", 1.0, 10L),
      (1L, 600L, "click", 2.5, 11L),        // +10 min: same session
      (1L, 600L + 1801L, "view", 0.5, 12L), // gap 1801 s > 1800 s: new session
      (2L, 50L, "view", 4.0, 20L))
    val out = EventAnalytics.sessionize(events, gapMinutes = 30)
      .orderBy("user_id", "session_idx")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(out === Array(
      (1L, 1L, 2L, 0L, 600000000L, 3.5),
      (1L, 2L, 1L, 2401000000L, 0L, 0.5),
      (2L, 1L, 1L, 50000000L, 0L, 4.0)))
  }

  test("sessionize: gap exactly at the threshold does NOT split") {
    val events = ev((1L, 0L, "view", 1.0, 1L), (1L, 1800L, "view", 1.0, 2L))
    val out = EventAnalytics.sessionize(events, 30).collect()
    assert(out.length === 1 && out(0).getAs[Long]("n_events") === 2L)
  }

  test("funnel: strict-after ordering, partial depths, pre-step noise ignored") {
    val events = ev(
      // u1 completes: view@10, click@20, purchase@30 (earlier click@5 ignored)
      (1L, 5L, "click", 0, 1L), (1L, 10L, "view", 0, 2L),
      (1L, 20L, "click", 0, 3L), (1L, 30L, "purchase", 0, 4L),
      // u2: view then purchase but NO click after view -> reached 1
      (2L, 10L, "view", 0, 5L), (2L, 20L, "purchase", 0, 6L),
      // u3: click at the SAME second as view -> strict after fails -> reached 1
      (3L, 10L, "view", 0, 7L), (3L, 10L, "click", 0, 8L),
      // u4: never views -> absent from the funnel
      (4L, 10L, "click", 0, 9L), (4L, 20L, "purchase", 0, 10L))
    val out = EventAnalytics.funnel(events, ("view", "click", "purchase"))
      .orderBy("user_id")
      .select("user_id", "reached").as[(Long, Int)].collect()
    assert(out === Array((1L, 3), (2L, 1), (3L, 1)))
  }

  test("funnel: step times are the first qualifying events") {
    val events = ev(
      (1L, 10L, "view", 0, 1L), (1L, 40L, "view", 0, 2L),
      (1L, 20L, "click", 0, 3L), (1L, 25L, "click", 0, 4L),
      (1L, 22L, "purchase", 0, 5L))
    val r = EventAnalytics.funnel(events, ("view", "click", "purchase")).collect()(0)
    assert(r.getAs[Long]("t1_us") === 10000000L)
    assert(r.getAs[Long]("t2_us") === 20000000L)   // first click after first view
    assert(r.getAs[Long]("t3_us") === 22000000L)   // purchase after the click
  }

  test("dailyRates: UTC day floor, counts and 2-dp sums") {
    val day = 86400L
    val events = ev(
      (1L, 10L, "view", 1.25, 1L),
      (2L, day - 1L, "view", 2.50, 2L),   // same UTC day
      (1L, day + 5L, "view", 4.00, 3L),   // next day
      (1L, day + 6L, "click", 0.75, 4L))
    val out = EventAnalytics.dailyRates(events)
      .orderBy("day_start_us", "event_type")
      .as[(Long, String, Long, Double)].collect()
    assert(out === Array(
      (0L, "view", 2L, 3.75),
      (day * 1000000L, "click", 1L, 0.75),
      (day * 1000000L, "view", 1L, 4.0)))
  }

  test("rfmScores: hand-computed quintiles, composed score") {
    val day = 86400L
    // user u: u purchase events on day u, value 10 each ->
    // recency_d = u, frequency = u, monetary = 10u -> all buckets = u
    val rows = for {
      u <- 1L to 5L
      j <- 0L until u
    } yield (u, u * day + j, "purchase", 10.0, u * 10 + j)
    val out = EventAnalytics.rfmScores(ev(rows: _*))
      .orderBy("user_id")
      .select("user_id", "r", "f", "m", "rfm")
      .as[(Long, Int, Int, Int, Int)].collect()
    assert(out === (1 to 5).map(u => (u.toLong, u, u, u, 111 * u)).toArray)
  }

  test("errorAnomalies: planted all-error user is the only flag") {
    // 12 users with 1 error in 10 events; user 99 errors every time
    val rows = (1L to 12L).flatMap { u =>
      (0L until 10L).map(j =>
        (u, u * 1000 + j, if (j == 0) "error" else "view", 1.0, u * 100 + j))
    } ++ (0L until 10L).map(j => (99L, 99000 + j, "error", 1.0, 9900 + j))
    val out = EventAnalytics.errorAnomalies(ev(rows: _*))
      .select("user_id", "flagged").as[(Long, Boolean)].collect().toMap
    assert(out(99L) === true)
    (1L to 12L).foreach(u => assert(out(u) === false, s"user $u"))
  }

  test("retentionCohorts: integer week arithmetic") {
    val day = 86400L
    val events = ev(
      (1L, 0L, "view", 0, 1L),            // cohort day 0 -> week 0
      (1L, 8L * day, "view", 0, 2L),      // offset (8-0)/7 = 1
      (1L, 13L * day, "view", 0, 3L),     // offset 1
      (2L, 7L * day, "view", 0, 4L),      // cohort week 1
      (2L, 7L * day + 1, "view", 0, 5L))  // same day -> offset 0
    val out = EventAnalytics.retentionCohorts(events)
      .orderBy("cohort_week", "week_offset")
      .as[(Long, Long, Long, Long)].collect()
    assert(out === Array((0L, 0L, 1L, 1L), (0L, 1L, 1L, 2L), (1L, 0L, 1L, 2L)))
  }

  test("transitionMatrix: hand-computed pairs and exact micro-shares") {
    val events = ev(
      (1L, 1L, "view", 0, 1L),
      (1L, 2L, "click", 0, 2L),
      (1L, 3L, "view", 0, 3L),
      (2L, 1L, "view", 0, 4L),
      (2L, 2L, "purchase", 0, 5L))
    // u1: view->click, click->view; u2: view->purchase.
    // from 'view' total 2 -> each 500000; from 'click' total 1 -> 1000000.
    val out = EventAnalytics.transitionMatrix(events)
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Long, Long)].collect()
    assert(out === Array(
      ("click", "view", 1L, 1L, 1000000L),
      ("view", "click", 1L, 2L, 500000L),
      ("view", "purchase", 1L, 2L, 500000L)))
  }

  // ------------------------------------------------------------ GraphRank

  private def edges(rows: (String, String, Long)*): DataFrame =
    rows.toSeq.toDF("src", "dst", "w")

  test("pageRank: symmetric 2-cycle is the uniform fixed point (both strategies)") {
    Seq(0L, 100L).foreach { cap =>
      val out = GraphRank.pageRankFixedPoint(
        edges(("a", "b", 1L), ("b", "a", 1L)), iters = 7, smallGraphMaxEdges = cap)
        .orderBy("node").as[(String, Long)].collect()
      assert(out === Array(("a", 500000000L), ("b", 500000000L)), s"cap=$cap")
    }
  }

  test("pageRank: one hand-computed iteration on the 3-node graph, loop pinned") {
    // A->B, A->C, B->C, C->A; n=3, r0=333333333, base=50000000
    val e = edges(("a", "b", 1L), ("a", "c", 1L), ("b", "c", 1L), ("c", "a", 1L))
    val out = GraphRank.pageRankFixedPoint(e, iters = 1, smallGraphMaxEdges = 0)
      .orderBy("node").as[(String, Long)].collect().toMap
    assert(out("a") === 50000000L + 85L * 333333333L / 100L)
    assert(out("b") === 50000000L + 85L * (333333333L / 2L) / 100L)
    assert(out("c") === 50000000L + 85L * (333333333L / 2L + 333333333L) / 100L)
  }

  test("pageRank: distributed loop is repartition-invariant and equals the fast path") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val e = GraphRank.documentLinkEdges(docs)
    val loop = GraphRank.pageRankFixedPoint(e, 5, smallGraphMaxEdges = 0)
      .orderBy("node").as[(String, Long)].collect()
    val loopRepart = GraphRank.pageRankFixedPoint(
      e.repartition(7), 5, smallGraphMaxEdges = 0)
      .orderBy("node").as[(String, Long)].collect()
    val fast = GraphRank.pageRankFixedPoint(e, 5).orderBy("node")
      .as[(String, Long)].collect()
    assert(loop === loopRepart)
    assert(loop === fast) // strategy choice never changes the trajectory
    // total mass within truncation loss of the full unit
    val total = loop.map(_._2).sum
    assert(total <= GraphRank.MassUnits && total > GraphRank.MassUnits * 97 / 100)
  }

  test("pageRank: dangling sink keeps base mass, feeder decays (both strategies)") {
    Seq(0L, 100L).foreach { cap =>
      // a -> b, b has no out-edges: b's in-mass arrives, a only keeps base
      val out = GraphRank.pageRankFixedPoint(
        edges(("a", "b", 1L)), iters = 3, smallGraphMaxEdges = cap)
        .orderBy("node").as[(String, Long)].collect().toMap
      val base = (GraphRank.MassUnits - 85L * GraphRank.MassUnits / 100L) / 2
      assert(out("a") === base, s"cap=$cap")
      assert(out("b") === base + 85L * base / 100L, s"cap=$cap")
    }
  }

  test("hits: symmetric 2-cycle is the uniform fixed point (both strategies)") {
    Seq(0L, 100L).foreach { cap =>
      val out = GraphRank.hitsFixedPoint(
        edges(("a", "b", 1L), ("b", "a", 1L)), iters = 5, smallGraphMaxEdges = cap)
        .orderBy("node").as[(String, Long, Long)].collect()
      assert(out === Array(("a", 500000000L, 500000000L),
        ("b", 500000000L, 500000000L)), s"cap=$cap")
    }
  }

  test("hits: one hand-computed round on the 3-node graph (both strategies)") {
    // a->b, a->c, b->c; h0 = 333333333 each.
    // authority raw: b=333333333, c=666666666, total 999999999 ->
    //   a(b)=333333333, a(c)=666666666 (exact integral shares), a(a)=0.
    // hub raw: a=a(b)+a(c)=999999999, b=a(c)=666666666, total 1666666665
    //   -> 1666666665*0.6 and *0.4 are EXACT: h(a)=600000000, h(b)=400000000.
    Seq(0L, 100L).foreach { cap =>
      val out = GraphRank.hitsFixedPoint(
        edges(("a", "b", 1L), ("a", "c", 1L), ("b", "c", 1L)),
        iters = 1, smallGraphMaxEdges = cap)
        .orderBy("node").as[(String, Long, Long)].collect()
      assert(out === Array(
        ("a", 600000000L, 0L),
        ("b", 400000000L, 333333333L),
        ("c", 0L, 666666666L)), s"cap=$cap")
    }
  }

  test("hits: distributed loop is repartition-invariant and equals the fast path") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val e = GraphRank.documentLinkEdges(docs)
    val loop = GraphRank.hitsFixedPoint(e, 3, smallGraphMaxEdges = 0)
      .orderBy("node").as[(String, Long, Long)].collect()
    val loopRepart = GraphRank.hitsFixedPoint(
      e.repartition(7), 3, smallGraphMaxEdges = 0)
      .orderBy("node").as[(String, Long, Long)].collect()
    val fast = GraphRank.hitsFixedPoint(e, 3).orderBy("node")
      .as[(String, Long, Long)].collect()
    assert(loop === loopRepart)
    assert(loop === fast)
    // each side's mass within truncation loss of its normalized unit
    Seq(loop.map(_._2).sum, loop.map(_._3).sum).foreach { total =>
      assert(total <= GraphRank.MassUnits && total > GraphRank.MassUnits * 97 / 100)
    }
  }

  test("authoritySample: thresholds are exact rank shares, repartition-stable") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val ranks = GraphRank.pageRankFixedPoint(GraphRank.documentLinkEdges(docs), 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = ranks.values.sum
    val out = GraphRank.authoritySample(docs).orderBy("doc_id").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("thr") ===
        ranks(r.getAs[String]("source")) * 1000000L / total)
    }
    val again = GraphRank.authoritySample(docs.repartition(7))
      .orderBy("doc_id").collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  // ------------------------------------------- pplBuckets / topicTag

  test("pplBuckets: per-lang terciles are balanced and ordered") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val out = TextAnalysis.pplBuckets(docs)
    val sizes = out.groupBy("lang", "bucket").count()
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3)).toMap
    sizes.foreach { case (lang, ns) =>
      assert(ns.max - ns.min <= 1, s"$lang tercile sizes $ns")
    }
    // every head doc scores <= every tail doc within its language
    val byLang = out.select("lang", "bucket", "bits_per_token")
      .as[(String, String, Double)].collect().groupBy(_._1)
    byLang.foreach { case (lang, rows) =>
      val head = rows.filter(_._2 == "head").map(_._3)
      val tail = rows.filter(_._2 == "tail").map(_._3)
      assert(head.max <= tail.min, s"$lang head ${head.max} > tail ${tail.min}")
    }
  }

  test("pplBucketsApprox agrees with the exact form away from boundaries") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val exact = TextAnalysis.pplBuckets(docs)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    val approx = TextAnalysis.pplBucketsApprox(docs)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(exact.keySet === approx.keySet)
    val agree = exact.count { case (id, b) => approx(id) == b }
    assert(agree.toDouble / exact.size >= 0.8,
      s"only $agree/${exact.size} bucket assignments agree")
  }

  test("filterStack: fused signals equal the individual operators") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val fused = TextAnalysis.filterStack(docs)
      .select("doc_id", "quality_score", "rep_ratio", "entropy_bits", "predicted_lang")
      .as[(Long, Double, Double, Double, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val q = TextAnalysis.quality(docs).select("doc_id", "quality_score")
      .as[(Long, Double)].collect().toMap
    val rep = TextAnalysis.repetition(docs).select("doc_id", "rep_ratio")
      .as[(Long, Double)].collect().toMap
    val ent = TextAnalysis.charStats(docs).select("doc_id", "entropy_bits")
      .as[(Long, Double)].collect().toMap
    val lang = TextAnalysis.languageId(docs).select("doc_id", "predicted_lang")
      .as[(Long, String)].collect().toMap
    assert(fused.size === q.size)
    fused.foreach { case (id, (fq, fr, fe, fl)) =>
      assert(fq === q(id), s"quality drift at $id")
      assert(fr === rep(id), s"repetition drift at $id")
      assert(fe === ent(id), s"entropy drift at $id")
      assert(fl === lang(id), s"langid drift at $id")
    }
  }

  test("filterStack: verdict is the conjunction of its own flags") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val rows = TextAnalysis.filterStack(docs)
      .select("keep_quality", "keep_repetition", "keep_entropy", "keep_lang", "keep")
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
    rows.foreach { case (a, b, c, d, k) => assert(k === (a && b && c && d)) }
  }

  test("curationReport: rollup totals equal the standalone operators") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val rep = graft.operators.TrainingPipeline.curationReport(docs).collect()
    assert(rep.map(_.getAs[Long]("n_docs")).sum === docs.count())
    assert(rep.map(_.getAs[Long]("n_keep")).sum ===
      TextAnalysis.filterStack(docs).filter(col("keep")).count())
    assert(rep.map(_.getAs[Long]("n_head")).sum ===
      TextAnalysis.pplBuckets(docs).filter(col("bucket") === "head").count())
    assert(rep.map(_.getAs[Long]("n_template")).sum ===
      graft.operators.Dedup.templateSpam(docs).filter(col("is_template")).count())
    // modal topic per source matches a direct argmax
    val direct = TextAnalysis.topicTag(docs)
      .join(docs.select(col("doc_id").cast("long").as("doc_id"), col("source")), "doc_id")
      .groupBy("source", "topic").count()
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view
      .mapValues(rows => rows.sortBy(r => (-r._3, r._2)).head._2)
    rep.foreach { r =>
      val src = r.getAs[String]("source")
      val expected = direct(src)
      assert(r.getAs[String]("top_topic") === expected, s"modal topic for $src")
    }
  }

  test("topicTag: hit counts, argmax, first-declared tie-break, other") {
    val docs = Seq(
      (1L, "table row table"),          // storage 3
      (2L, "join sort stream batch"),   // compute 2 ties streaming 2 -> compute
      (3L, "quartz quartz"),            // no hits -> other
      (4L, "stream stream join"))       // streaming 2 beats compute 1
      .toDF("doc_id", "text")
    val out = TextAnalysis.topicTag(docs).orderBy("doc_id")
      .select("doc_id", "h_storage", "h_compute", "h_streaming", "topic")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(out === Array(
      (1L, 3L, 0L, 0L, "storage"),
      (2L, 0L, 2L, 2L, "compute"),
      (3L, 0L, 0L, 0L, "other"),
      (4L, 0L, 1L, 2L, "streaming")))
  }

  test("regularityScreen: metronome flags, bursty human passes, sparse gets the sentinel") {
    val events = ev(
      // u1 metronome: 6 events exactly 100 s apart -> CV 0 -> bot
      (1L, 0L, "view", 0, 1L), (1L, 100L, "view", 0, 2L),
      (1L, 200L, "view", 0, 3L), (1L, 300L, "view", 0, 4L),
      (1L, 400L, "view", 0, 5L), (1L, 500L, "view", 0, 6L),
      // u2 bursty: gaps 1, 1, 1, 1, 996 s -> CV >> 0.85 -> human
      (2L, 0L, "view", 0, 10L), (2L, 1L, "view", 0, 11L),
      (2L, 2L, "view", 0, 12L), (2L, 3L, "view", 0, 13L),
      (2L, 4L, "view", 0, 14L), (2L, 1000L, "view", 0, 15L),
      // u3 sparse: one event -> no gaps -> absent (no lag row survives)
      (3L, 0L, "view", 0, 20L),
      // u4 two events -> one gap -> CV undefined -> -1 sentinel, not bot
      (4L, 0L, "view", 0, 30L), (4L, 50L, "view", 0, 31L))
    val out = EventAnalytics.regularityScreen(events)
      .orderBy("user_id").as[(Long, Long, Long, Long, Int)].collect()
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 4L))
    val m = out.map(r => r._1 -> r).toMap
    assert(m(1L) === ((1L, 5L, 500000000L, 0L, 1)))          // CV exactly 0
    assert(m(2L)._5 === 0 && m(2L)._4 > 850000L)             // bursty, unflagged
    assert(m(4L) === ((4L, 1L, 50000000L, -1L, 0)))          // sentinel
    // hand-check u2's CV: gaps (1,1,1,1,996) s, mean 200 s,
    // var = (4*199^2 + 796^2)/4 = 198006.25 -> sd 444.978..., cv 2.224888
    assert(m(2L)._4 === 2224888L)
  }

  // lookback = 7 days = 604800 s in the seconds fixture
  private val Lb = 604800L

  test("attribution: window boundaries, last-touch tie by id, integer linear credits") {
    val events = ev(
      // u1 purchase @1000000 (p_id 100); in-window touches:
      (1L, 500000L, "view", 0, 1L),             //   view
      (1L, 900000L, "click", 0, 2L),            //   click — latest -> last touch
      (1L, 1000000L, "click", 0, 3L),           //   t_us == p_us -> EXCLUDED
      (1L, 1000000L - Lb, "view", 0, 4L),       //   exactly p_us - lookback -> included
      (1L, 1000000L - Lb - 1L, "view", 0, 5L),  //   one sec earlier -> excluded
      (1L, 1000000L, "purchase", 0, 100L),
      // u2 purchase with nothing in window -> the (none) bucket
      (2L, 100L, "view", 0, 6L),
      (2L, 2000000L, "purchase", 0, 200L),
      // u3: two touches at the SAME instant -> tie broken by max event_id
      (3L, 10L, "view", 0, 7L),
      (3L, 10L, "click", 0, 8L),                //   id 8 > 7 -> click is last
      (3L, 20L, "purchase", 0, 300L))
    val out = EventAnalytics.attribution(events).orderBy("channel")
      .as[(String, Long, Long, Long)].collect()
    // u1: n=3 -> 333333 micro each (view c=2, click c=1)
    // u3: n=2 -> 500000 micro each
    assert(out === Array(
      ("(none)", 1L, 0L, 0L),
      ("click", 2L, 2L, 333333L + 500000L),
      ("view", 0L, 3L, 666666L + 500000L)))
  }

  test("attribution: no in-window touches anywhere still yields the (none) row") {
    val events = ev(
      (1L, 5000000L, "view", 0, 1L), // AFTER the purchase -> not a touch
      (1L, 1000L, "purchase", 0, 2L),
      (2L, 2000L, "purchase", 0, 3L))
    val out = EventAnalytics.attribution(events)
      .as[(String, Long, Long, Long)].collect()
    assert(out === Array(("(none)", 2L, 0L, 0L)))
  }

  test("attribution: credits are conserved — linear micro sums to n_conv * (n div) totals") {
    val events = ev(
      (1L, 100L, "view", 0, 1L), (1L, 200L, "click", 0, 2L),
      (1L, 300L, "click", 0, 3L), (1L, 400L, "purchase", 0, 4L),
      (2L, 100L, "view", 0, 5L), (2L, 500L, "purchase", 0, 6L))
    val rows = EventAnalytics.attribution(events).collect()
    // u1: n=3 -> 3*333333 = 999999; u2: n=1 -> 1000000
    val totalLinear = rows.map(_.getAs[Long]("linear_micro")).sum
    assert(totalLinear === 999999L + 1000000L)
    val totalLast = rows.map(_.getAs[Long]("n_last")).sum
    assert(totalLast === 2L) // one last-touch credit per attributed conversion
  }

  test("labelPropagation: two weakly-bridged triangles resolve to two communities") {
    import spark.implicits._
    // triangles {a1,a2,a3} and {b1,b2,b3} with w=5 internal edges, one
    // w=1 bridge a3-b1, one self-loop c1. Hand-traced 3 synchronous
    // rounds: labels converge to a1 and b1 (ties to the smallest
    // label); the bridge never outweighs the internal votes; c1 keeps
    // its own label.
    val edges = Seq(
      ("a1", "a2", 5L), ("a1", "a3", 5L), ("a2", "a3", 5L),
      ("b1", "b2", 5L), ("b1", "b3", 5L), ("b2", "b3", 5L),
      ("a3", "b1", 1L), ("c1", "c1", 2L)).toDF("src", "dst", "w")
    val out = EventsGraphHelpers.lpa(edges, 3)
    assert(out === Map(
      "a1" -> (("a1", 3L)), "a2" -> (("a1", 3L)), "a3" -> (("a1", 3L)),
      "b1" -> (("b1", 3L)), "b2" -> (("b1", 3L)), "b3" -> (("b1", 3L)),
      "c1" -> (("c1", 1L))))
    // driver fast path and the distributed loop walk the same trajectory
    val loop = GraphRank.labelPropagation(edges, 3, smallGraphMaxEdges = 0)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(loop === out)
  }

  test("labelPropagation: supplementary-character label ties break by code point on BOTH paths") {
    import spark.implicits._
    // U+10000 (a surrogate pair, UTF-16 units 0xD800 0xDC00) vs U+E000
    // (one unit): UTF-16 code-unit order says U+10000 < U+E000, but
    // code points / UTF-8 bytes — what Spark's min(struct) compares —
    // say U+E000 < U+10000. A tied vote between the two labels is the
    // divergence the driver fast path's cpOrd comparator exists for.
    val hi = "𐀀" // U+10000
    val lo = ""
    val edges = Seq((lo, "n", 5L), (hi, "n", 5L)).toDF("src", "dst", "w")
    val fast = EventsGraphHelpers.lpa(edges, 1)
    val loop = GraphRank.labelPropagation(edges, 1, smallGraphMaxEdges = 0)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(fast("n")._1 === lo, s"tie must break to U+E000 by code point: $fast")
    assert(fast === loop)
  }

  test("labelPropagation: rounds=0 is the identity labelling; repartition-invariant") {
    import spark.implicits._
    val edges = Seq(("x", "y", 1L), ("y", "z", 3L)).toDF("src", "dst", "w")
    val id0 = EventsGraphHelpers.lpa(edges, 0)
    assert(id0.forall { case (n, (l, _)) => n == l })
    val docs = graft.sources.Tables.documents(spark, sf)
    val e = GraphRank.documentLinkEdges(docs)
    val a = GraphRank.labelPropagation(e, 3).orderBy("node").collect().toSeq
    val b = GraphRank.labelPropagation(
      GraphRank.documentLinkEdges(docs.repartition(7)), 3)
      .orderBy("node").collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("survivalCurve: hand-computed lifetable — churned vs censored, suffix at-risk") {
    val day = 86400L
    // corpus end = u4's last event at day 10.
    //  u1: one event day 0          -> life 0, obs 10 -> churned at 0
    //  u2: days 0..3                -> life 3, obs 10 -> churned at 3
    //  u3: days 7..10 (last at end) -> life 3, obs 3  -> CENSORED at 3
    //  u4: days 0..10 (last at end) -> life 10, obs 10 -> censored at 10
    val events = ev(
      (1L, 0L, "view", 0, 1L),
      (2L, 0L, "view", 0, 2L), (2L, 3 * day, "view", 0, 3L),
      (3L, 7 * day, "view", 0, 4L), (3L, 10 * day, "view", 0, 5L),
      (4L, 0L, "view", 0, 6L), (4L, 10 * day, "view", 0, 7L))
    val out = EventAnalytics.survivalCurve(events)
      .orderBy("period").as[(Int, Long, Long, Long, Long)].collect()
    assert(out === Array(
      // period, at_risk, churned, censored, hazard_bp
      (0, 4L, 1L, 0L, 2500L),  // 1/4 = 25.00%
      (3, 3L, 1L, 1L, 3333L),  // u2 churns, u3 censored; 1*10000 div 3
      (10, 1L, 0L, 1L, 0L)))
    // conservation: every user ends exactly once
    assert(out.map(r => r._3 + r._4).sum === 4L)
  }

  test("survivalCurve: at-risk is monotone non-increasing; repartition-invariant") {
    val events = graft.sources.Tables.events(spark, sf)
    val a = EventAnalytics.survivalCurve(events).orderBy("period").collect().toSeq
    val b = EventAnalytics.survivalCurve(events.repartition(7))
      .orderBy("period").collect().toSeq
    assert(a === b && a.nonEmpty)
    a.map(_.getAs[Long]("at_risk")).sliding(2).foreach {
      case Seq(x, y) => assert(x >= y, s"at_risk must not increase: $x -> $y")
      case _ =>
    }
  }

  test("triangleStats: hand-computed triangles, lcc, self-loop/direction cleanup") {
    // two triangles sharing edge b-c, plus a pendant pair e-f; inputs
    // arrive directed, duplicated, and with a self-loop to prove the
    // symmetrize/distinct/loop-drop front end
    val edges = Seq(
      ("a", "b"), ("b", "a"),       // duplicate reverse
      ("b", "c"), ("a", "c"),
      ("c", "d"), ("d", "b"),
      ("e", "f"), ("e", "e"))       // self-loop must drop
      .toDF("src", "dst")
    val out = GraphRank.triangleStats(edges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // deg: a2 b3 c3 d2 e1 f1; tri: a1 b2 c2 d1; lcc_micro = 2t*1e6 div d(d-1)
    assert(out("a") === ((2L, 1L, 1000000L)))
    assert(out("b") === ((3L, 2L, 666666L)))
    assert(out("c") === ((3L, 2L, 666666L)))
    assert(out("d") === ((2L, 1L, 1000000L)))
    assert(out("e") === ((1L, 0L, 0L)))
    assert(out("f") === ((1L, 0L, 0L)))
  }

  test("triangleStatsManaged: release thunk unpersists the canonical edge cache") {
    // pristine cache state: CacheManager dedups identical plans, so a
    // canon frame leaked by an earlier (unmanaged) call in this suite
    // would absorb this call's persist and mask the release
    spark.catalog.clearCache()
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("src", "dst")
    def cachedRdds(): Int = spark.sparkContext.getPersistentRDDs.size
    val before = cachedRdds()
    val (df, release) = GraphRank.triangleStatsManaged(edges)
    // collect(), not count(): Catalyst ELIMINATES the left join to the
    // (key-distinct) triangle side under count(), and with it the only
    // consumers of canon — the cache would never materialize
    assert(df.collect().map(_.getAs[Long]("triangles")).sum === 3L)
    assert(cachedRdds() > before,
      "triangleStats should have persisted its canonical edge frame")
    release()
    assert(cachedRdds() === before,
      "release() must unpersist canon — looped callers leak otherwise")
  }

  test("triangleStats: orientation form equals brute-force triples on a dense graph") {
    // deterministic pseudo-random graph dense enough for shared hubs:
    // the apex-orientation count must equal the naive all-triples scan
    val n = 24
    def mix(x: Long): Long = { var v = x * 6364136223846793005L + 1442695040888963407L; v ^= v >>> 33; v }
    val pairs = for {
      i <- 0 until n; j <- (i + 1) until n
      if Math.floorMod(mix(i.toLong * 131 + j * 7919), 4L) == 0L
    } yield (f"n$i%02d", f"n$j%02d")
    val got = GraphRank.triangleStats(pairs.toDF("src", "dst")).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val adj = pairs.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val names = adj.keys.toSeq.sorted
    val brute = scala.collection.mutable.HashMap.empty[String, Long]
    for {
      a <- names; b <- names if a < b && adj(a)(b)
      c <- names if b < c && adj(a)(c) && adj(b)(c)
    } { Seq(a, b, c).foreach(x => brute(x) = brute.getOrElse(x, 0L) + 1) }
    names.foreach { v =>
      assert(got.getOrElse(v, 0L) === brute.getOrElse(v, 0L),
        s"triangle count mismatch at $v")
    }
    assert(brute.values.sum / 3 > 10, "fixture too sparse to be a real check")
  }

  test("triangleStats: repartition-invariant on the doc link graph") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val a = GraphRank.triangleStats(GraphRank.documentLinkEdges(docs))
      .orderBy("node").collect().toSeq
    val b = GraphRank.triangleStats(
        GraphRank.documentLinkEdges(docs.repartition(7)))
      .orderBy("node").collect().toSeq
    assert(a === b && a.nonEmpty)
  }
}
