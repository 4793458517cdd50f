package graft.bench

import org.apache.spark.sql.SparkSession
import graft.model._
import graft.flow.FlowRegistry

import graft.streaming.StreamingEntityRuntime

/** YCSB-style parity benchmark reproducing the reference harness
  * (/root/reference/demo_runtime_universalis_ycsb.py:17-100): 100
  * entities, 1000 ops, zipf(0.99) keys, workloads
  *   A = 50% read / 50% update, B = 95% read / 5% update,
  *   T = 100% transfer (two-key split flow).
  * Latency capture follows the reference's CSV method (send-ts,
  * reply-ts per request id;
  * /root/reference/stateflow/client/kafka_client.py:78-91,144-145):
  * requests are pipelined into the stream, replies matched by event id.
  *
  * Two blocks per artifact:
  *   - reference parity: the reference demo's own sizes (100 entities /
  *     1000 ops) on a 1-partition ingress + 4 state partitions —
  *     comparable round over round;
  *   - scale-out: SPARK_GRAFT_YCSB_SCALE sizes (default 10000 entities /
  *     10000 ops) on a multi-partition ingress with state partitions ≈
  *     available cores — the evidence that hop latency is the unit cost
  *     while THROUGHPUT scales with distinct keys (more keys per batch =
  *     more parallel state partitions doing useful work per trigger, so
  *     ops/s rises while per-op latency holds).
  *
  * Prints one JSON line per run with throughput and p50/p99.
  */
object YcsbBench {

  /** YCSB-style zipfian key chooser, θ=0.99, deterministic seed
    * (/root/reference/zipfian_generator.py:1-100; standard Gray et al.
    * algorithm, public).
    */
  final class Zipf(n: Int, theta: Double = 0.99, seed: Long = 42L) {
    private val rnd = new scala.util.Random(seed)
    private val zetan = (1 to n).map(i => 1.0 / math.pow(i, theta)).sum
    private val alpha = 1.0 / (1.0 - theta)
    private val zeta2 = (1 to 2).map(i => 1.0 / math.pow(i, theta)).sum
    private val eta = (1 - math.pow(2.0 / n, 1 - theta)) / (1 - zeta2 / zetan)
    def next(): Int = {
      val u = rnd.nextDouble()
      val uz = u * zetan
      if (uz < 1.0) 0
      else if (uz < 1.0 + math.pow(0.5, theta)) 1
      else (n * math.pow(eta * u - eta + 1, alpha)).toInt.min(n - 1)
    }
  }

  private val STARTING_AMOUNT = 100

  /** One benchmark configuration: entity count, op count, ingress and
    * state partitioning.
    */
  private final case class Config(
      label: String,
      nEntities: Int,
      nTasks: Int,
      statePartitions: Int,
      ingressPartitions: Int)

  def main(args: Array[String]): Unit = {
    // threads must cover the LARGEST state-partition count in the plan;
    // each block then sets spark.sql.shuffle.partitions per session
    // (state partition count is fixed per streaming query at start)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.metricsEnabled", "false")
      // the runtime has no timeouts/watermarks, so no-data batches do
      // nothing except burn scheduler cycles between real batches —
      // with ProcessingTime(0) they'd otherwise fire continuously
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      // the hop stats window by batchId over recentProgress; the
      // default retention (100) would silently truncate long runs
      .config("spark.sql.streaming.numRecentProgressUpdates", "512")
    if (sys.env.get("SPARK_GRAFT_TWS").contains("1"))
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    TestEntities.registerFlows()

    // reference parity: the demo's own sizes on the demo's shape.
    // 100 zipfian keys with sub-KB state saturate ~4 state partitions;
    // more partitions only multiply per-batch state-store commit and
    // task-launch overhead at this key count (measured: 4 > 8 > 16 —
    // hop latency is per-batch overhead, not compute)
    val parity = Config("reference_parity", 100, 1000,
      statePartitions = 4, ingressPartitions = 1)
    // scale-out: 100x keys, state partitions ≈ cores, ingress split
    val scaleEntities =
      sys.env.getOrElse("SPARK_GRAFT_YCSB_SCALE_ENTITIES", "10000").toInt
    val scaleOps = sys.env.getOrElse("SPARK_GRAFT_YCSB_SCALE_OPS", "10000").toInt
    val scale = Config("scale_out", scaleEntities, scaleOps,
      statePartitions = cpus.toInt, ingressPartitions = 4)

    val workloads =
      Seq("A" -> (0.5, 0.5, 0.0), "B" -> (0.95, 0.05, 0.0), "T" -> (0.0, 0.0, 1.0))
    val lines = Seq(parity, scale).flatMap { cfg =>
      // state partition count binds at query start from the session conf
      val session = spark.newSession()
      session.conf.set("spark.sql.shuffle.partitions", cfg.statePartitions)
      workloads.map { case (name, mix) => runWorkload(session, cfg, name, mix) }
    }
    // gateway row: the HTTP serving layer's throughput over the
    // LocalRuntime (the protocol-adapter cost — HTTP + JSON + the
    // runtime lock; the streaming runtime's own throughput is the
    // A/B/T rows' subject). Concurrent clients exercise the threaded
    // executor added for O35.
    val gw = runGateway(
      nRequests = sys.env.getOrElse("SPARK_GRAFT_YCSB_HTTP_OPS", "2000").toInt,
      nThreads = sys.env.getOrElse("SPARK_GRAFT_YCSB_HTTP_THREADS", "8").toInt)
    // HTTP_T row: the future-parked gateway over the STREAMING runtime
    // under pure multi-hop load — concurrent clients' flows must share
    // micro-batches (ops per busy batch > 1), the O35 design gate
    val gwT = runGatewayStreamingT(spark,
      nRequests = sys.env.getOrElse("SPARK_GRAFT_YCSB_HTTP_T_OPS", "200").toInt,
      nThreads = sys.env.getOrElse("SPARK_GRAFT_YCSB_HTTP_THREADS", "8").toInt)
    // HTTP_D row: the same pure multi-hop load over the DRAINING
    // runtime — a flow completes in ONE micro-batch (continuations
    // re-dispatch in-batch), so throughput sheds the batches-per-hop
    // factor HTTP_T pays; more concurrent clients raise in-flight
    // sharing, which is the capacity this row measures
    val gwD = runGatewayStreamingT(spark,
      nRequests = sys.env.getOrElse("SPARK_GRAFT_YCSB_HTTP_D_OPS", "2000").toInt,
      nThreads = sys.env.getOrElse("SPARK_GRAFT_YCSB_HTTP_D_THREADS", "32").toInt,
      workload = "HTTP_D", configLabel = "gateway_draining",
      mkRt = s => new graft.streaming.DrainingEntityRuntime(
        TestEntities.registry, s, statePartitions = 4))
    // machine-readable per-round artifact (judge/driver diffable)
    val out = sys.env.getOrElse("SPARK_GRAFT_YCSB_OUT", "YCSB.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      (lines :+ gw :+ gwT :+ gwD).mkString("[\n", ",\n", "\n]\n"))
    spark.stop()
  }

  /** YCSB-A-shaped mix (50% attr read / 50% update call) through the
    * HTTP gateway with `nThreads` concurrent java.net.http clients.
    * Latency = per-request wall at the client, the reference FastAPI
    * layer's own measurement point.
    */
  private def runGateway(nRequests: Int, nThreads: Int): String = {
    val registry = TestEntities.registry
    val gw = new graft.serving.HttpGateway(registry,
      new graft.runtime.local.LocalRuntime(registry))
    gw.start()
    try {
      val base = s"http://127.0.0.1:${gw.boundPort}"
      val nEntities = 100
      val http = java.net.http.HttpClient.newHttpClient()
      def post(path: String, body: String) =
        http.send(java.net.http.HttpRequest.newBuilder(java.net.URI.create(base + path))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
      def get(path: String) =
        http.send(java.net.http.HttpRequest.newBuilder(java.net.URI.create(base + path))
          .GET().build(), java.net.http.HttpResponse.BodyHandlers.ofString())
      (0 until nEntities).foreach { i =>
        require(post(s"/YCSBEntity/create",
          s"""{"key":"g$i","value":$STARTING_AMOUNT}""").statusCode() == 200)
      }
      // unmeasured warmup (JIT + HTTP keep-alive establishment)
      (0 until 50).foreach { i => get(s"/YCSBEntity/g${i % nEntities}/attr/value") }
      val zipf = new Zipf(nEntities)
      val perThread = nRequests / nThreads
      val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
      val lats = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
      val errs = new java.util.concurrent.atomic.AtomicInteger()
      // pre-draw keys on the driver thread: Zipf is not thread-safe
      val keys = Vector.fill(nRequests)(zipf.next())
      val t0 = System.nanoTime()
      val futs = (0 until nThreads).map { t =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            val cl = java.net.http.HttpClient.newHttpClient()
            val rnd = new scala.util.Random(100 + t)
            var i = 0
            while (i < perThread) {
              val k = s"g${keys(t * perThread + i)}"
              val s0 = System.nanoTime()
              val r =
                if (rnd.nextDouble() < 0.5)
                  cl.send(java.net.http.HttpRequest.newBuilder(
                    java.net.URI.create(s"$base/YCSBEntity/$k/attr/value")).GET().build(),
                    java.net.http.HttpResponse.BodyHandlers.ofString())
                else
                  cl.send(java.net.http.HttpRequest.newBuilder(
                    java.net.URI.create(s"$base/YCSBEntity/$k/call/update"))
                    .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
                      s"""{"new_value":${rnd.nextInt(1000)}}""")).build(),
                    java.net.http.HttpResponse.BodyHandlers.ofString())
              lats.add((System.nanoTime() - s0) / 1e6)
              if (r.statusCode() != 200) errs.incrementAndGet(): Unit
              i += 1
            }
          }
        })
      }
      futs.foreach(_.get())
      pool.shutdown()
      val wall = (System.nanoTime() - t0) / 1e9
      val ls = lats.toArray(new Array[java.lang.Double](0)).map(_.doubleValue()).sorted
      def pct(p: Double): Double =
        if (ls.isEmpty) -1 else ls(((ls.length - 1) * p).toInt)
      def num(fmt: String, v: Double): String =
        String.format(java.util.Locale.ROOT, fmt, Double.box(v))
      val done = ls.length
      val line = s"""{"workload":"HTTP_A","config":"gateway_local","entities":$nEntities,"threads":$nThreads,"ops":$done,"errors":${errs.get()},"wall_sec":${num("%.3f", wall)},"throughput_ops_sec":${num("%.1f", done / wall)},"p50_ms":${num("%.2f", pct(0.5))},"p99_ms":${num("%.2f", pct(0.99))}}"""
      println(line)
      line
    } finally gw.stop()
  }

  /** HTTP_T: concurrent java.net.http clients drive two-hop transfer
    * flows through the future-parked gateway over the STREAMING
    * runtime. Each request parks its exchange on a StateflowFuture;
    * the pump drains once for every in-flight flow — so throughput is
    * batches-bound, not clients*hops-bound, and `ops_per_busy_batch`
    * (> 1 with any concurrency) is the sharing evidence the row
    * carries.
    */
  private def runGatewayStreamingT(
      spark: SparkSession, nRequests: Int, nThreads: Int,
      workload: String = "HTTP_T",
      configLabel: String = "gateway_streaming",
      mkRt: SparkSession => graft.runtime.AsyncEventTransport with AutoCloseable =
        s => new StreamingEntityRuntime(TestEntities.registry, s)): String = {
    val registry = TestEntities.registry
    val session = spark.newSession()
    session.conf.set("spark.sql.shuffle.partitions", "4")
    val rt = mkRt(session)
    def busyCount: Int = rt match {
      case s: StreamingEntityRuntime => s.busyBatches.size
      case d: graft.streaming.DrainingEntityRuntime => d.busyBatches.size
      case _ => 0
    }
    val gw = new graft.serving.HttpGateway(registry, rt)
    gw.start()
    try {
      val base = s"http://127.0.0.1:${gw.boundPort}"
      val nEntities = 100
      val http = java.net.http.HttpClient.newHttpClient()
      def post(path: String, body: String) =
        http.send(java.net.http.HttpRequest.newBuilder(java.net.URI.create(base + path))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
      (0 until nEntities).foreach { i =>
        require(post("/YCSBEntity/create",
          s"""{"key":"h$i","value":$STARTING_AMOUNT}""").statusCode() == 200)
      }
      // unmeasured warmup: one round of transfers (JIT + state store)
      (0 until 8).foreach { i =>
        post(s"/YCSBEntity/h$i/call/transfer",
          s"""{"transfer_amount":0,"other_entity":{"$$ref":["YCSBEntity","h${i + 1}"]}}""")
      }
      val zipf = new Zipf(nEntities)
      val pairs = Vector.fill(nRequests) {
        val a = zipf.next()
        var b = zipf.next()
        while (b == a) b = zipf.next()
        (a, b)
      }
      val perThread = nRequests / nThreads
      val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
      val lats = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
      val errs = new java.util.concurrent.atomic.AtomicInteger()
      val batchesBefore = busyCount
      val t0 = System.nanoTime()
      val futs = (0 until nThreads).map { t =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            val cl = java.net.http.HttpClient.newHttpClient()
            var i = 0
            while (i < perThread) {
              val (a, b) = pairs(t * perThread + i)
              val s0 = System.nanoTime()
              val r = cl.send(java.net.http.HttpRequest.newBuilder(
                  java.net.URI.create(s"$base/YCSBEntity/h$a/call/transfer"))
                .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
                  s"""{"transfer_amount":1,"other_entity":{"$$ref":["YCSBEntity","h$b"]}}"""))
                .build(), java.net.http.HttpResponse.BodyHandlers.ofString())
              lats.add((System.nanoTime() - s0) / 1e6)
              if (r.statusCode() != 200) errs.incrementAndGet(): Unit
              i += 1
            }
          }
        })
      }
      futs.foreach(_.get())
      pool.shutdown()
      val wall = (System.nanoTime() - t0) / 1e9
      val busy = busyCount - batchesBefore
      val ls = lats.toArray(new Array[java.lang.Double](0)).map(_.doubleValue()).sorted
      def pct(p: Double): Double =
        if (ls.isEmpty) -1 else ls(((ls.length - 1) * p).toInt)
      def num(fmt: String, v: Double): String =
        String.format(java.util.Locale.ROOT, fmt, Double.box(v))
      val done = ls.length
      val opsPerBatch = if (busy == 0) 0.0 else done.toDouble / busy
      val line = s"""{"workload":"$workload","config":"$configLabel","entities":$nEntities,"threads":$nThreads,"ops":$done,"errors":${errs.get()},"wall_sec":${num("%.3f", wall)},"throughput_ops_sec":${num("%.1f", done / wall)},"p50_ms":${num("%.2f", pct(0.5))},"p99_ms":${num("%.2f", pct(0.99))},"busy_batches":$busy,"ops_per_busy_batch":${num("%.2f", opsPerBatch)},"max_completions_per_advance":${(0 +: gw.advanceCompletions).max}}"""
      println(line)
      line
    } finally {
      gw.stop()
      rt.close()
    }
  }

  private def runWorkload(spark: SparkSession, cfg: Config, name: String,
      mix: (Double, Double, Double)): String = {
    // SPARK_GRAFT_TWS=1 -> measure the transformWithState lowering
    // (caller session must carry the RocksDB provider conf; main sets it)
    val useTws = sys.env.get("SPARK_GRAFT_TWS").contains("1")
    val rt = new StreamingEntityRuntime(TestEntities.registry, spark,
      useTransformWithState = useTws, inputPartitions = cfg.ingressPartitions)
    try {
      val keys = (0 until cfg.nEntities).map(i => s"k$i")
      // pipelined setup: all creates in one micro-batch (a synchronous
      // create per entity would cost one batch EACH and pollute the
      // recent-progress hop stats)
      rt.sendAsync(keys.map(k => Event(s"create-$k", "YCSBEntity", k,
        EventType.InitClass,
        Payload.CreateArgs(Map("key" -> k, "value" -> STARTING_AMOUNT)))))
      rt.drain()
      keys.foreach { k =>
        val r = rt.takeReply(s"create-$k")
        require(r.exists(_.eventType == EventType.SuccessfulCreateClass),
          s"create failed for $k: $r")
      }

      // unmeasured warmup: exercise every code path (read, update, and a
      // multi-hop flow) so the measured window is steady-state, not JIT/
      // codegen/state-store cold start — the reference's long-running
      // broker deployment never measures a cold first batch either
      val warm = (0 until 60).flatMap { i =>
        val k = keys(i % cfg.nEntities)
        val ref = EntityRef("YCSBEntity", k)
        val other = keys((i + 1) % cfg.nEntities)
        Seq(
          Event(s"warm-r$i", ref.entity, k, EventType.InvokeStateful,
            Payload.MethodCall("read", Map.empty)),
          Event(s"warm-t$i", ref.entity, k, EventType.EventFlow,
            Payload.FlowPayload(FlowRegistry.instantiate("YCSBEntity.transfer", ref,
              Map("transfer_amount" -> 0,
                "other_entity" -> EntityRef("YCSBEntity", other))))))
      }
      rt.sendAsync(warm)
      rt.drain()
      warm.foreach(ev => rt.takeReply(ev.eventId))

      val zipf = new Zipf(cfg.nEntities)
      val rnd = new scala.util.Random(7)
      val (pRead, pUpdate, _) = mix

      // Build all request events up front (pipelined client), stamping
      // send time per id; replies matched by event id afterwards.
      var i = 0
      val reqs = Vector.newBuilder[(String, Event)]
      while (i < cfg.nTasks) {
        val key = keys(zipf.next())
        val ref = EntityRef("YCSBEntity", key)
        val id = s"op$i"
        val r = rnd.nextDouble()
        val ev =
          if (r < pRead)
            Event(id, ref.entity, ref.key, EventType.InvokeStateful,
              Payload.MethodCall("read", Map.empty))
          else if (r < pRead + pUpdate)
            Event(id, ref.entity, ref.key, EventType.InvokeStateful,
              Payload.MethodCall("update", Map("new_value" -> rnd.nextInt(1000))))
          else {
            var other = keys(zipf.next())
            while (other == key) other = keys(zipf.next())
            Event(id, ref.entity, ref.key, EventType.EventFlow,
              Payload.FlowPayload(FlowRegistry.instantiate("YCSBEntity.transfer", ref,
                Map("transfer_amount" -> (rnd.nextInt(5) + 1),
                  "other_entity" -> EntityRef("YCSBEntity", other)))))
          }
        reqs += ((id, ev))
        i += 1
      }
      val requests = reqs.result()

      val sendTs = new java.util.HashMap[String, Long]()
      val warmupMaxBatch = rt.busyBatches.map(_._1).maxOption.getOrElse(-1L)
      val t0 = System.nanoTime()
      // pipeline in large chunks: micro-batch overhead (state-store
      // commit, egress job scheduling) is per BATCH, so hops amortize
      // best when a batch carries as many flow steps as possible
      val chunkSize = sys.env.getOrElse("SPARK_GRAFT_YCSB_CHUNK", "500").toInt
      requests.grouped(chunkSize).foreach { chunk =>
        val now = System.nanoTime()
        chunk.foreach { case (id, _) => sendTs.put(id, now) }
        rt.sendAsync(chunk.map(_._2))
      }
      // drain everything incl. transfer-hop loopbacks
      var done = 0
      val lat = Array.newBuilder[Double]
      val replyTs = new java.util.HashMap[String, Long]()
      var spins = 0
      while (done < cfg.nTasks && spins < 1000) {
        rt.drain()
        requests.foreach { case (id, _) =>
          if (!replyTs.containsKey(id)) rt.takeReply(id).foreach { _ =>
            replyTs.put(id, System.nanoTime()); done += 1
          }
        }
        spins += 1
      }
      val wall = (System.nanoTime() - t0) / 1e9
      requests.foreach { case (id, _) =>
        if (replyTs.containsKey(id))
          lat += (replyTs.get(id) - sendTs.get(id)) / 1e6
      }
      val ls = lat.result().sorted
      def pct(p: Double): Double =
        if (ls.isEmpty) -1 else ls(((ls.length - 1) * p).toInt)
      // hop observability: every flow hop costs one micro-batch, so the
      // per-batch trigger time IS the hop latency; counters prove the
      // driver saw replies only while hops stayed on the loopback.
      // Warmup batches are excluded by batchId.
      val measured = rt.busyBatches.filter(_._1 > warmupMaxBatch)
      val busyBatches = measured.length
      val avgBatchMs =
        if (measured.isEmpty) 0.0 else measured.map(_._2).sum / measured.length
      // Locale.ROOT: the f-interpolator uses the default locale, and a
      // comma-decimal locale would emit invalid JSON ("wall_sec":1,234)
      def num(fmt: String, v: Double): String =
        String.format(java.util.Locale.ROOT, fmt, Double.box(v))
      val line = s"""{"workload":"$name","config":"${cfg.label}","entities":${cfg.nEntities},"state_partitions":${cfg.statePartitions},"ingress_partitions":${cfg.ingressPartitions},"ops":$done,"wall_sec":${num("%.3f", wall)},"throughput_ops_sec":${num("%.1f", done / wall)},"p50_ms":${num("%.2f", pct(0.5))},"p99_ms":${num("%.2f", pct(0.99))},"hop_events":${rt.loopbackWrittenCount},"driver_replies":${rt.driverCollectedCount},"busy_batches":$busyBatches,"avg_batch_ms":${num("%.1f", avgBatchMs)}}"""
      println(line)
      if (sys.env.contains("SPARK_GRAFT_YCSB_DEBUG"))
        rt.progressJson.foreach(j => println(s"[progress] $j"))
      line
    } finally rt.close()
  }
}
