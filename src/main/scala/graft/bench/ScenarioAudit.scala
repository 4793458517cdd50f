package graft.bench

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.model.{EntityRef, TestEntities}
import graft.runtime.{Client, EventTransport}
import graft.runtime.local.LocalRuntime
import graft.streaming.{DrainingEntityRuntime, StreamingEntityRuntime}

/** Committable evidence for the Layer-A scenario gate: replays the
  * S1-S6d entity scenarios (expected values = the reference's own E2E
  * asserts, /root/reference/tests/stateflow_test.py:74-269) on ALL
  * FOUR lowerings — LocalRuntime, flatMapGroupsWithState, Spark 4
  * transformWithState, and the in-batch DRAINING runtime — plus the S7-S10 Structured Streaming window
  * scenarios and the distributed-egress hop/reply counters, and writes
  * one JSON artifact (`SCENARIOS_r{N}.json`) with expected vs actual
  * per check. The test suite asserts the same values; this main makes
  * them auditable without running sbt test.
  *
  * Usage: `runMain graft.bench.ScenarioAudit [outPath]`
  * (default `SCENARIOS.json`). Exit code 1 if any check fails.
  */
object ScenarioAudit {

  final case class Check(scenario: String, check: String, expected: String, actual: String) {
    def pass: Boolean = expected == actual
  }

  private def s(v: Any): String = v match {
    case null => "null"
    case seq: Seq[_] => seq.mkString("[", ",", "]")
    case other => other.toString
  }

  private def chk(scenario: String, name: String, expected: Any, actual: Any): Check =
    Check(scenario, name, s(expected), s(actual))

  /** Replay one scenario against a fresh client; any thrown error
    * becomes a failing check rather than aborting the audit.
    */
  private type Scenario = (String, Client => Seq[Check])

  /** The S1-S6d + YCSB-transfer scenario scripts — the exact call
    * sequences of EntityScenarios (test suite) and the reference's
    * stateflow_test.py, expressed as data.
    */
  private val scenarios: Seq[Scenario] = Seq(
    "S1_create_find" -> { c =>
      val u = c.create("User", Map("username" -> "u1"))
      val dup = c.create("User", Map("username" -> "u1"))
      Seq(
        chk("S1", "create", Right(EntityRef("User", "u1")), u),
        chk("S1", "duplicate_create_fails", true, dup.isLeft),
        chk("S1", "find_hit", true, c.find(EntityRef("User", "u1"))),
        chk("S1", "find_miss", false, c.find(EntityRef("User", "nope"))))
    },
    "S2_get_set" -> { c =>
      val Right(u) = c.create("User", Map("username" -> "u1"))
      val before = c.getAttr(u, "balance")
      c.setAttr(u, "balance", 5)
      Seq(
        chk("S2", "initial_balance", 0, before),
        chk("S2", "after_set", 5, c.getAttr(u, "balance")))
    },
    "S3_invoke" -> { c =>
      val Right(u) = c.create("User", Map("username" -> "u1"))
      val Right(it) = c.create("Item", Map("item_name" -> "i1", "price" -> 5))
      c.call(u, "update_balance", Map("x" -> 20))
      c.call(it, "update_stock", Map("amount" -> 4))
      Seq(
        chk("S3", "balance", 20, c.getAttr(u, "balance")),
        chk("S3", "stock", 4, c.getAttr(it, "stock")))
    },
    "S4_buy_item_split_flow" -> { c =>
      val Right(u) = c.create("User", Map("username" -> "u1"))
      val Right(it) = c.create("Item", Map("item_name" -> "i1", "price" -> 5))
      c.call(u, "update_balance", Map("x" -> 20))
      c.call(it, "update_stock", Map("amount" -> 4))
      val buy = c.call(u, "buy_item", Map("amount" -> 3, "item" -> it))
      val r1 = Seq(
        chk("S4", "buy_ok", true, buy),
        chk("S4", "balance_after", 5, c.getAttr(u, "balance")),
        chk("S4", "stock_after", 1, c.getAttr(it, "stock")))
      val buy2 = c.call(u, "buy_item", Map("amount" -> 3, "item" -> it))
      val r2 = Seq(
        chk("S4", "insufficient_balance", false, buy2),
        chk("S4", "balance_untouched", 5, c.getAttr(u, "balance")),
        chk("S4", "stock_untouched", 1, c.getAttr(it, "stock")))
      c.call(u, "update_balance", Map("x" -> 100))
      val buy3 = c.call(u, "buy_item", Map("amount" -> 3, "item" -> it))
      r1 ++ r2 ++ Seq(
        chk("S4", "insufficient_stock", false, buy3),
        chk("S4", "stock_still", 1, c.getAttr(it, "stock")))
    },
    "S4b_complex_method" -> { c =>
      val Right(b) = c.create("ExperimentalB", Map("name" -> "b"))
      val Right(a) = c.create("ExperimentalA", Map("name" -> "a"))
      val outcome = c.call(a, "complex_method", Map("balance" -> 10, "other" -> b))
      val r1 = Seq(
        chk("S4b", "outcome", true, outcome),
        chk("S4b", "b_balance", 10, c.getAttr(b, "balance")),
        chk("S4b", "a_balance", 0, c.getAttr(a, "balance")))
      c.call(a, "work_with_list", Map("x" -> 1, "others" -> Seq(b)))
      val r2 = Seq(chk("S4b", "list_x1", 30, c.getAttr(b, "balance")))
      c.call(a, "work_with_list", Map("x" -> 0, "others" -> Seq(b)))
      r1 ++ r2 :+ chk("S4b", "list_x0_noop", 30, c.getAttr(b, "balance"))
    },
    "S5_conditional_flows" -> { c =>
      val Right(b) = c.create("ExperimentalB", Map("name" -> "b"))
      val Right(a) = c.create("ExperimentalA", Map("name" -> "a"))
      val buf = Seq.newBuilder[Check]
      buf += chk("S5", "complex_if_0",
        0, c.call(a, "complex_if", Map("balance" -> 11, "b_ins" -> b)))
      buf += chk("S5", "b_after_0", 11, c.getAttr(b, "balance"))
      c.setAttr(b, "balance", 5)
      buf += chk("S5", "complex_if_1",
        1, c.call(a, "complex_if", Map("balance" -> 9, "b_ins" -> b)))
      buf += chk("S5", "b_after_1", 5, c.getAttr(b, "balance"))
      c.setAttr(b, "balance", 0)
      buf += chk("S5", "complex_if_2",
        2, c.call(a, "complex_if", Map("balance" -> 9, "b_ins" -> b)))
      buf += chk("S5", "b_after_2", 0, c.getAttr(b, "balance"))
      c.setAttr(b, "balance", 0)
      buf += chk("S5", "more_complex_if_neg",
        -3, c.call(a, "more_complex_if", Map("balance" -> -3, "b_ins" -> b)))
      c.setAttr(b, "balance", 4)
      buf += chk("S5", "more_complex_if_1",
        1, c.call(a, "more_complex_if", Map("balance" -> 2, "b_ins" -> b)))
      c.setAttr(b, "balance", 4)
      buf += chk("S5", "more_complex_if_-1",
        -1, c.call(a, "more_complex_if", Map("balance" -> 3, "b_ins" -> b)))
      buf += chk("S5", "b_after_-1", 4, c.getAttr(b, "balance"))
      c.setAttr(b, "balance", 0)
      c.setAttr(a, "balance", 0)
      buf += chk("S5", "test_no_return",
        null, c.call(a, "test_no_return", Map("balance" -> 6, "b_ins" -> b)))
      buf += chk("S5", "b_after_no_return", 6, c.getAttr(b, "balance"))
      buf += chk("S5", "a_after_no_return", 0, c.getAttr(a, "balance"))
      buf.result()
    },
    "S6_for_loops" -> { c =>
      val Right(b) = c.create("ExperimentalB", Map("name" -> "b"))
      val Right(b2) = c.create("ExperimentalB", Map("name" -> "b2"))
      val Right(a) = c.create("ExperimentalA", Map("name" -> "a"))
      val r0 = c.call(a, "for_loops", Map("x" -> 0, "others" -> Seq(b, b2)))
      val r1 = Seq(
        chk("S6", "x0_returns", -1, r0),
        chk("S6", "b_5", 5, c.getAttr(b, "balance")),
        chk("S6", "b2_5", 5, c.getAttr(b2, "balance")))
      val r4 = c.call(a, "for_loops", Map("x" -> 4, "others" -> Seq(b, b2)))
      r1 ++ Seq(
        chk("S6", "x4_returns", 4, r4),
        chk("S6", "b_10", 10, c.getAttr(b, "balance")),
        chk("S6", "b2_10", 10, c.getAttr(b2, "balance")))
    },
    "S6b_simple_for_loops" -> { c =>
      val users = (1 to 4).map(i => c.create("User", Map("username" -> s"u$i")).toOption.get)
      val u1 = users.head
      val ret = c.call(u1, "simple_for_loops", Map("users" -> users))
      Seq(chk("S6b", "returns_4", 4, ret),
        chk("S6b", "first_user_4", 4, c.getAttr(u1, "balance"))) ++
        users.tail.zipWithIndex.map { case (u, i) =>
          chk("S6b", s"user${i + 2}_9", 9, c.getAttr(u, "balance"))
        }
    },
    "S6c_state_requests" -> { c =>
      val Right(b) = c.create("ExperimentalB", Map("name" -> "b"))
      val Right(b2) = c.create("ExperimentalB", Map("name" -> "b2"))
      val Right(a) = c.create("ExperimentalA", Map("name" -> "a"))
      Seq(chk("S6c", "state_requests_26",
        26, c.call(a, "state_requests", Map("items" -> Seq(b, b2)))))
    },
    "S11_async_pipeline" -> { c =>
      // AsyncClassRef parity (class_ref.py:228-258 + future.py:31-124):
      // pipelined create -> two calls -> get, fired before any pump;
      // same-key batching (O14) preserves arrival order, so the get
      // observes both updates
      val u = c.createAsync("User", Map("username" -> "async_u"))
        .result().asInstanceOf[EntityRef]
      val f1 = c.callAsync(u, "update_balance", Map("x" -> 7))
      val f2 = c.callAsync(u, "update_balance", Map("x" -> 5))
      val g = c.getAttrAsync(u, "balance")
      val miss = c.findAsync(EntityRef("User", "async_missing"))
      val bal = g.result()
      Seq(
        chk("S11", "async_create_ref", EntityRef("User", "async_u"), u),
        chk("S11", "pipelined_updates_ordered_balance", 12, bal),
        chk("S11", "call_futures_complete", true,
          f1.isCompleted && f2.isCompleted),
        chk("S11", "async_find_miss", false, miss.result()),
        chk("S11", "async_find_hit", true, c.findAsync(u).result()))
    },
    "S6d_nested_splits" -> { c =>
      val Right(no) = c.create("OtherNestClass", Map("id" -> "o1", "x" -> 11))
      val Right(n) = c.create("NestClass", Map("id" -> "n1", "x" -> 3))
      Seq(
        chk("S6d", "nest_call", Seq(11, 3, 3), c.call(n, "nest_call", Map("other" -> no))),
        chk("S6d", "nest_calll", true, c.call(no, "nest_calll", Map("other" -> no))))
    },
    "YCSB_transfer" -> { c =>
      val Right(e1) = c.create("YCSBEntity", Map("key" -> "k1", "value" -> 100))
      val Right(e2) = c.create("YCSBEntity", Map("key" -> "k2", "value" -> 100))
      val ok = c.call(e1, "transfer", Map("transfer_amount" -> 30, "other_entity" -> e2))
      val r1 = Seq(
        chk("YCSB", "transfer_ok", true, ok),
        chk("YCSB", "src_70", 70, c.getAttr(e1, "value")),
        chk("YCSB", "dst_130", 130, c.getAttr(e2, "value")))
      val over = c.call(e1, "transfer", Map("transfer_amount" -> 1000, "other_entity" -> e2))
      r1 ++ Seq(
        chk("YCSB", "overdraw_rejected", false, over),
        chk("YCSB", "src_unchanged", 70, c.getAttr(e1, "value")))
    })

  private def runEntityScenarios(
      runtime: String, mkTransport: () => EventTransport): Seq[(String, Check)] =
    scenarios.flatMap { case (name, script) =>
      val transport = mkTransport()
      try {
        val checks =
          try script(new Client(TestEntities.registry, transport))
          catch {
            case e: Throwable =>
              Seq(Check(name, "scenario_error", "no exception",
                s"${e.getClass.getSimpleName}: ${e.getMessage}"))
          }
        checks.map(runtime -> _)
      } finally transport match {
        case s: AutoCloseable => s.close()
        case _ => ()
      }
    }

  /** Distributed-egress counters on the fMGWS lowering: a two-entity
    * split flow's hops traverse the executor-side loopback; exactly one
    * client reply crosses the driver (StreamingEntitySpec's assert).
    */
  private def egressCounters(spark: SparkSession): Seq[(String, Check)] = {
    val rt = new StreamingEntityRuntime(TestEntities.registry, spark)
    try {
      val c = new Client(TestEntities.registry, rt)
      val Right(u) = c.create("User", Map("username" -> "hopper"))
      val Right(it) = c.create("Item", Map("item_name" -> "hop-item", "price" -> 5))
      c.call(u, "update_balance", Map("x" -> 20))
      c.call(it, "update_stock", Map("amount" -> 4))
      val repliesBefore = rt.driverCollectedCount
      val hopsBefore = rt.loopbackWrittenCount
      val ok = c.call(u, "buy_item", Map("amount" -> 3, "item" -> it))
      Seq(
        "fmgws" -> chk("egress", "buy_ok", true, ok),
        "fmgws" -> chk("egress", "hops_use_loopback",
          true, rt.loopbackWrittenCount > hopsBefore),
        "fmgws" -> chk("egress", "driver_sees_one_reply",
          1, rt.driverCollectedCount - repliesBefore))
    } finally rt.close()
  }

  /** The draining lowering's defining property, as auditable counters:
    * a two-entity split flow drains its inter-key hops IN-batch (hop
    * counter moves, drain rounds >= 2) and completes in exactly ONE
    * non-empty micro-batch — where the loopback lowering needs one
    * batch per hop.
    */
  private def drainCounters(spark: SparkSession): Seq[(String, Check)] = {
    val rt = new DrainingEntityRuntime(TestEntities.registry, spark)
    try {
      val c = new Client(TestEntities.registry, rt)
      val Right(u) = c.create("User", Map("username" -> "drainer"))
      val Right(it) = c.create("Item", Map("item_name" -> "drain-item", "price" -> 5))
      c.call(u, "update_balance", Map("x" -> 20))
      c.call(it, "update_stock", Map("amount" -> 4))
      val batchesBefore = rt.busyBatches.size
      val hopsBefore = rt.drainedHopCount
      val ok = c.call(u, "buy_item", Map("amount" -> 3, "item" -> it))
      Seq(
        "drain" -> chk("drain", "buy_ok", true, ok),
        "drain" -> chk("drain", "hops_drained_in_batch",
          true, rt.drainedHopCount > hopsBefore),
        "drain" -> chk("drain", "flow_is_one_batch",
          1, rt.busyBatches.size - batchesBefore),
        "drain" -> chk("drain", "drain_rounds_cover_hops",
          true, rt.maxDrainRoundsSeen >= 2))
    } finally rt.close()
  }

  /** Durable draining runtime: committed state (and tombstones) survive
    * a cold restart via the parquet changelog; compaction folds the
    * changelog to one delta without changing the restored state.
    */
  private def drainDurabilityChecks(spark: SparkSession): Seq[(String, Check)] = {
    val dir = java.nio.file.Files.createTempDirectory("drain-audit-state").toString
    val rt1 = new DrainingEntityRuntime(TestEntities.registry, spark,
      stateDir = Some(dir))
    val (uRef, goneRef) = try {
      val c = new Client(TestEntities.registry, rt1)
      val Right(u) = c.create("User", Map("username" -> "audit-durable"))
      c.call(u, "update_balance", Map("x" -> 37))
      val Right(g) = c.create("User", Map("username" -> "audit-deleted"))
      c.deleteState(g)
      (u, g)
    } finally rt1.close()
    val rt2 = new DrainingEntityRuntime(TestEntities.registry, spark,
      stateDir = Some(dir))
    try {
      val c2 = new Client(TestEntities.registry, rt2)
      val restored = c2.getAttr(uRef, "balance")
      val tombstoned = !c2.find(goneRef)
      rt2.advance()
      rt2.compactChangelog()
      val oneDelta = new java.io.File(dir).list()
        .count(n => n.startsWith("delta-") && n.endsWith(".parquet")) == 1
      val postCompact = c2.getAttr(uRef, "balance")
      Seq(
        "drain" -> chk("drain_durable", "state_survives_restart", 37, restored),
        "drain" -> chk("drain_durable", "tombstone_survives_restart", true, tombstoned),
        "drain" -> chk("drain_durable", "compaction_folds_to_one_delta", true, oneDelta),
        "drain" -> chk("drain_durable", "state_survives_compaction", 37, postCompact))
    } finally rt2.close()
  }

  /** S12: the future-parked gateway over the streaming runtime —
    * concurrent multi-hop HTTP calls must share micro-batches (fewer
    * busy batches than flows = pigeonhole proof of >1 in-flight flow
    * per batch), complete >1 parked exchange per pump drain, and lose
    * no updates (every account sends and receives the same amount).
    */
  private def gatewaySharingChecks(spark: SparkSession): Seq[(String, Check)] = {
    val rt = new StreamingEntityRuntime(TestEntities.registry, spark)
    val gw = new graft.serving.HttpGateway(TestEntities.registry, rt)
    gw.start()
    try {
      val http = java.net.http.HttpClient.newHttpClient()
      val base = s"http://127.0.0.1:${gw.boundPort}"
      def post(path: String, body: String) =
        http.send(java.net.http.HttpRequest.newBuilder(java.net.URI.create(base + path))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
      def get(path: String) =
        http.send(java.net.http.HttpRequest.newBuilder(java.net.URI.create(base + path))
          .GET().build(), java.net.http.HttpResponse.BodyHandlers.ofString())
      val n = 6
      (0 until n).foreach { i =>
        post("/YCSBEntity/create", s"""{"key":"s12_$i","value":100}""")
      }
      val batchesBefore = rt.busyBatches.size
      val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
      val futs = (0 until n).map { i =>
        pool.submit(new java.util.concurrent.Callable[String] {
          override def call(): String =
            java.net.http.HttpClient.newHttpClient().send(
              java.net.http.HttpRequest.newBuilder(
                java.net.URI.create(s"$base/YCSBEntity/s12_$i/call/transfer"))
                .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
                  s"""{"transfer_amount":5,"other_entity":{"$$ref":["YCSBEntity","s12_${(i + 1) % n}"]}}"""))
                .build(),
              java.net.http.HttpResponse.BodyHandlers.ofString()).body()
        })
      }
      val bodies = futs.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      pool.shutdown()
      val batchesUsed = rt.busyBatches.size - batchesBefore
      val balances = (0 until n).map(i => get(s"/YCSBEntity/s12_$i/attr/value").body())
      Seq(
        "gateway" -> chk("S12", "all_transfers_true",
          Seq.fill(n)("""{"value":true}"""), bodies.toSeq),
        "gateway" -> chk("S12", "flows_share_batches",
          true, batchesUsed < n),
        "gateway" -> chk("S12", "multi_completion_per_drain",
          true, gw.advanceCompletions.exists(_ > 1)),
        "gateway" -> chk("S12", "balances_conserved",
          Seq.fill(n)("""{"value":100}"""), balances))
    } finally {
      gw.stop()
      rt.close()
    }
  }

  private def t(str: String): Timestamp = Timestamp.valueOf(str)

  /** S7-S10: the StreamingWindowsSpec scenarios (tumbling+watermark
    * late-drop, sliding, session, stateful dedup, stream-stream
    * time-range join), driven batch-by-batch so watermark progression
    * is deterministic.
    */
  private def streamingWindowChecks(spark: SparkSession): Seq[(String, Check)] = {
    import spark.implicits._
    val out = Seq.newBuilder[(String, Check)]
    def add(c: Check): Unit = { out += ("streaming" -> c); () }

    // S7 tumbling + watermark late-drop
    locally {
      val input = MemoryStream[(Timestamp, String)](spark, numPartitions = 1)
      val agg = input.toDF().toDF("ts", "k")
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("k")).count()
        .select(col("window.start").as("ws"), col("k"), col("count"))
      val q = agg.writeStream.outputMode("append").format("memory").queryName("sa_s7").start()
      try {
        input.addData((t("2024-01-01 10:00:00"), "a"), (t("2024-01-01 10:30:00"), "a"))
        q.processAllAvailable()
        input.addData((t("2024-01-01 11:30:00"), "a"))
        q.processAllAvailable()
        input.addData((t("2024-01-01 10:15:00"), "a")) // late -> dropped
        q.processAllAvailable()
        input.addData((t("2024-01-01 12:30:00"), "a"))
        q.processAllAvailable()
        val rows = spark.table("sa_s7").collect()
          .map(r => (r.getTimestamp(0).toString, r.getLong(2))).toMap
        add(chk("S7", "window_10_counts_2_late_dropped", 2L, rows("2024-01-01 10:00:00.0")))
        add(chk("S7", "window_11_counts_1", 1L, rows("2024-01-01 11:00:00.0")))
      } finally q.stop()
    }
    // S8 sliding + session windows
    locally {
      val input = MemoryStream[(Timestamp, String)](spark, numPartitions = 1)
      val agg = input.toDF().toDF("ts", "k")
        .withWatermark("ts", "1 minute")
        .groupBy(window(col("ts"), "10 minutes", "5 minutes")).count()
      val q = agg.writeStream.outputMode("append").format("memory").queryName("sa_s8a").start()
      try {
        input.addData((t("2024-01-01 10:02:00"), "a"), (t("2024-01-01 10:04:00"), "a"))
        q.processAllAvailable()
        input.addData((t("2024-01-01 11:00:00"), "a"))
        q.processAllAvailable()
        val rows = spark.table("sa_s8a").collect()
          .map(r => (r.getStruct(0).getTimestamp(0).toString, r.getLong(1))).toMap
        add(chk("S8", "sliding_0955", 2L, rows("2024-01-01 09:55:00.0")))
        add(chk("S8", "sliding_1000", 2L, rows("2024-01-01 10:00:00.0")))
      } finally q.stop()
      val in2 = MemoryStream[(Timestamp, String)](spark, numPartitions = 1)
      val agg2 = in2.toDF().toDF("ts", "k")
        .withWatermark("ts", "1 minute")
        .groupBy(session_window(col("ts"), "30 minutes"), col("k")).count()
      val q2 = agg2.writeStream.outputMode("append").format("memory").queryName("sa_s8b").start()
      try {
        in2.addData((t("2024-01-01 10:00:00"), "a"), (t("2024-01-01 10:20:00"), "a"),
          (t("2024-01-01 12:00:00"), "a"))
        q2.processAllAvailable()
        in2.addData((t("2024-01-01 14:00:00"), "a"))
        q2.processAllAvailable()
        val counts = spark.table("sa_s8b").collect().map(_.getLong(2)).sorted.toSeq
        add(chk("S8", "session_counts", Seq(1L, 2L), counts))
      } finally q2.stop()
    }
    // S9 stateful dedup
    locally {
      val input = MemoryStream[(Timestamp, Long)](spark, numPartitions = 1)
      val dedup = input.toDF().toDF("ts", "event_id")
        .withWatermark("ts", "10 minutes")
        .dropDuplicates("event_id")
      val q = dedup.writeStream.outputMode("append").format("memory").queryName("sa_s9").start()
      try {
        input.addData((t("2024-01-01 10:00:00"), 1L), (t("2024-01-01 10:01:00"), 2L))
        q.processAllAvailable()
        input.addData((t("2024-01-01 10:02:00"), 1L), (t("2024-01-01 10:03:00"), 3L))
        q.processAllAvailable()
        val ids = spark.table("sa_s9").collect().map(_.getLong(1)).sorted.toSeq
        add(chk("S9", "dedup_ids", Seq(1L, 2L, 3L), ids))
      } finally q.stop()
    }
    // S10 stream-stream time-range join
    locally {
      val clicks = MemoryStream[(Timestamp, Long, Double)](spark, numPartitions = 1)
      val purchases = MemoryStream[(Timestamp, Long, Long)](spark, numPartitions = 1)
      val c = clicks.toDF().toDF("cts", "user", "value").withWatermark("cts", "10 minutes")
      val p = purchases.toDF().toDF("pts", "puser", "pid").withWatermark("pts", "10 minutes")
      val joined = p.join(c,
        col("puser") === col("user") &&
          col("cts") <= col("pts") && col("cts") >= col("pts") - expr("INTERVAL 1 HOUR"))
        .select(col("pid"), col("user"), col("value"))
      val q = joined.writeStream.outputMode("append").format("memory").queryName("sa_s10").start()
      try {
        clicks.addData((t("2024-01-01 10:00:00"), 1L, 5.0), (t("2024-01-01 08:00:00"), 2L, 7.0))
        purchases.addData((t("2024-01-01 10:30:00"), 1L, 100L), (t("2024-01-01 10:30:00"), 2L, 200L))
        q.processAllAvailable()
        clicks.addData((t("2024-01-01 13:00:00"), 9L, 0.0))
        purchases.addData((t("2024-01-01 13:00:00"), 9L, 999L))
        q.processAllAvailable()
        val rows = spark.table("sa_s10").collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
        add(chk("S10", "in_range_click_joined", Some(5.0), rows.get(100L)))
        add(chk("S10", "out_of_range_click_excluded", false, rows.contains(200L)))
      } finally q.stop()
    }
    out.result()
  }

  private def jstr(v: String): String =
    "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("SCENARIOS.json")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-scenario-audit")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val twsSession = {
      val s = spark.newSession()
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      s
    }
    val all: Seq[(String, Check)] =
      runEntityScenarios("local", () => new LocalRuntime(TestEntities.registry)) ++
        runEntityScenarios("fmgws",
          () => new StreamingEntityRuntime(TestEntities.registry, spark)) ++
        runEntityScenarios("tws",
          () => new StreamingEntityRuntime(TestEntities.registry, twsSession,
            useTransformWithState = true)) ++
        runEntityScenarios("drain",
          () => new DrainingEntityRuntime(TestEntities.registry, spark)) ++
        egressCounters(spark) ++
        drainCounters(spark) ++
        drainDurabilityChecks(spark) ++
        streamingWindowChecks(spark) ++
        gatewaySharingChecks(spark)
    val nPass = all.count(_._2.pass)
    val nFail = all.size - nPass
    val items = all.map { case (rt, c) =>
      s"""  {"runtime":${jstr(rt)},"scenario":${jstr(c.scenario)},""" +
        s""""check":${jstr(c.check)},"expected":${jstr(c.expected)},""" +
        s""""actual":${jstr(c.actual)},"pass":${c.pass}}"""
    }
    val body = s"""{"pass":$nPass,"fail":$nFail,""" +
      s""""reference":"tests/stateflow_test.py:74-269","checks":[\n""" +
      items.mkString(",\n") + "\n]}\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[scenario-audit] $nPass pass / $nFail fail -> $outPath")
    all.filterNot(_._2.pass).foreach { case (rt, c) =>
      println(s"[scenario-audit] FAIL $rt ${c.scenario}.${c.check}: " +
        s"expected ${c.expected}, got ${c.actual}")
    }
    spark.stop()
    if (nFail > 0) sys.exit(1)
  }
}
