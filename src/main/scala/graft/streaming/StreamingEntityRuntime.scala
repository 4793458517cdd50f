package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, StreamingQuery, TimeMode, TimerValues, Trigger, TTLConfig, ValueState}
import graft.model._
import graft.model.Types._
import graft.runtime.{EventTransport, StatefulOperator}

/** Structured Streaming lowering of the entity runtime (the one lowering
  * we implement, vs the reference's five; SURVEY O37):
  *
  *   (client MemoryStream UNION loopback file stream)
  *     --groupByKey((entity,key))--> flatMapGroupsWithState(handle)
  *     --> replies  -> driver reply table (the "client_reply topic")
  *     --> continuations -> written EXECUTOR-SIDE to the loopback
  *                          directory (the "internal topic",
  *                          /root/reference/stateflow/client/kafka_client.py:38-39;
  *                          a Kafka topic in production, see
  *                          [[KafkaEventBridge]])
  *
  * Egress is distributed (EgressRouter analog, dataflow.py:52-128): hop
  * traffic never crosses the driver — each executor serializes its own
  * continuations ([[EventBinary]], the pickle-analog internal serde) and
  * appends them to the loopback sink; only client-facing replies are
  * collected. At cluster scale the loopback directory is replaced by a
  * broker topic and the driver reply table by the client reply topic —
  * the micro-batch topology is identical.
  *
  * A flow with H inter-key hops completes in H micro-batches — exactly
  * the reference's one-broker-round-trip-per-hop cost profile
  * (/root/reference/stateflow/dataflow/dataflow.py:96-106).
  *
  * The stateful function is THE SAME `StatefulOperator.handle` the
  * LocalRuntime uses, so scenario semantics are pinned once. State lives
  * in the Spark state store (checkpointed, partitioned by the group key):
  * per-key state is exactly-once across micro-batches and restarts. The
  * loopback egress is replay-IDEMPOTENT (deterministic per-(batch,
  * partition) file names, publish-if-absent — see
  * [[StreamingEntityRuntime.egressPartition]]), which closes the
  * batch-replay / task-retry duplication windows; the residual zombie
  * window degrades to at-least-once, the reference's own guarantee on
  * its internal Kafka topic.
  */
/** @param useTransformWithState lower onto Spark 4's
  *   `transformWithState` (StatefulProcessor + RocksDB state store;
  *   the session must set
  *   `spark.sql.streaming.stateStore.providerClass` to the RocksDB
  *   provider) instead of `flatMapGroupsWithState`. Both lowerings run
  *   the SAME `StatefulOperator.handle`, and both pass the S1-S6
  *   scenario gate — the operator semantics are lowering-independent.
  */
/** @param fileInputDir when set, client events enter through a durable
  *   file source at this path instead of an in-memory stream — the
  *   replayable-source shape a checkpoint RESTART requires (MemoryStream
  *   data dies with the JVM, so recovery can only be tested/deployed
  *   with durable sources; Kafka plays this role in production).
  *   Combined with a stable `checkpointDir`, a new runtime on the same
  *   dirs resumes exactly where the old one stopped, state included.
  */
/** @param inputPartitions partition count of the in-memory client
  *   ingress (the MemoryStream analog of a client topic's partition
  *   count). The reference-parity YCSB runs use 1 (matching the
  *   single-partition `client_request` topic of the reference demo);
  *   the scale-out runs use more so the ingress itself is not the
  *   serialization point. Ignored when `fileInputDir` is set (file
  *   sources split by file).
  */
final class StreamingEntityRuntime(
    registry: EntityRegistry,
    spark: SparkSession,
    checkpointDir: Option[String] = None,
    useTransformWithState: Boolean = false,
    fileInputDir: Option[String] = None,
    inputPartitions: Int = 1)
    extends graft.runtime.AsyncEventTransport with AutoCloseable {

  import spark.implicits._
  private implicit val eventEnc: Encoder[Event] = Encoders.kryo[Event]
  private implicit val stateEnc: Encoder[State] = Encoders.kryo[State]
  private implicit val keyEnc: Encoder[(String, String)] =
    Encoders.tuple(Encoders.STRING, Encoders.STRING)

  private val input = MemoryStream[Event](spark, numPartitions = inputPartitions)
  private val replies = new ConcurrentHashMap[String, Event]()
  // the "internal topic": continuations land here executor-side and the
  // file stream below re-ingests them, partitioned like any other source.
  // Files are staged in a sibling dir and atomically renamed into the
  // watched dir so the source never lists a half-written file. When a
  // durable checkpoint is given the loopback lives NEXT TO it (stable
  // across restarts — the checkpoint's source offsets reference it);
  // otherwise it is a session temp dir.
  private val loopbackBase = checkpointDir match {
    case Some(c) =>
      val p = java.nio.file.Paths.get(c + "-loopback")
      java.nio.file.Files.createDirectories(p); p
    case None =>
      StreamingEntityRuntime.newTempDir("graft-loopback")
  }
  private def ensureDir(p: java.nio.file.Path): String = {
    java.nio.file.Files.createDirectories(p); p.toString
  }
  private val loopbackDir = ensureDir(loopbackBase.resolve("topic"))
  private val loopbackStage = ensureDir(loopbackBase.resolve("stage"))
  private val fileInput: Option[String] = fileInputDir.map { d =>
    ensureDir(java.nio.file.Paths.get(d))
  }
  private val contAcc = spark.sparkContext.longAccumulator("graft-loopback-conts")
  // continuation count per batch, to know when the loopback has drained
  @volatile private var pendingContinuations = false
  // observability for tests: events that crossed the driver vs hops that
  // stayed distributed
  @volatile private var driverCollected = 0L
  @volatile private var loopbackWritten = 0L

  private val query: StreamingQuery = {
    // hoist to a local so the stateful closure captures the registry
    // VALUE, not `this` (the runtime holds non-serializable members)
    val reg = registry
    val fn: ((String, String), Iterator[Event], GroupState[State]) => Iterator[Event] =
      (k, es, st) => StreamingEntityRuntime.statefulFn(reg)(k, es, st)
    // cleanSource=delete: processed loopback files are removed, so the
    // per-trigger directory listing stays O(in-flight hops) instead of
    // growing with the life of the runtime
    val loopback = spark.readStream
      .option("cleanSource", "delete")
      .text(loopbackDir)
      .select("value").as[String]
      .map(EventBinary.decode(_))
    val dir = loopbackDir
    val ingress = fileInput match {
      case Some(in) =>
        // durable client ingress (kept on disk -> replayable on restart)
        spark.readStream.text(in)
          .select("value").as[String]
          .map(EventBinary.decode(_))
      case None => input.toDS()
    }
    val grouped = ingress.union(loopback)
      .groupByKey(ev => (ev.entity, ev.key))
    val stateful =
      if (useTransformWithState)
        grouped.transformWithState(
          new StreamingEntityRuntime.EntityProcessor(reg),
          TimeMode.None(), OutputMode.Append())(eventEnc)
      else
        grouped.flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
    stateful
      .writeStream
    .outputMode("append")
    .queryName("graft-entity-runtime")
    // state store checkpointing: exactly-once per-key state across
    // micro-batches (and across restarts when a durable dir is given)
    .option("checkpointLocation", checkpointDir.getOrElse(
      StreamingEntityRuntime.newTempDir("graft-ckpt").toString))
    .trigger(Trigger.ProcessingTime(0))
    .foreachBatch { (batch: org.apache.spark.sql.Dataset[Event], batchId: Long) =>
      // SINGLE egress pass: each executor partition streams its
      // continuations into the loopback sink (the distributed egress —
      // only the reference's EgressRouter INTERNAL route,
      // dataflow.py:96-106, by another name) and returns only the
      // client-facing replies, which the one collect brings to the
      // driver. One job, no persist, half the per-batch scheduling of a
      // collect+foreachPartition pair — hop latency is the entity
      // runtime's unit cost, so this is the hot path. File names derive
      // from (batchId, partitionId) so a replayed batch or retried task
      // republishes the SAME file instead of appending a duplicate —
      // see egressPartition.
      val before = contAcc.value
      val stage = loopbackStage
      val acc = contAcc
      val reps = batch.mapPartitions { (it: Iterator[Event]) =>
        StreamingEntityRuntime.egressPartition(it, stage, dir, acc, batchId)
      }(eventEnc).collect()
      reps.foreach(r => replies.put(r.eventId, r))
      driverCollected += reps.length
      val n = contAcc.value - before
      loopbackWritten += n
      pendingContinuations = n > 0
      ()
    }
    .start()
  }

  /** Events collected at the driver (replies only, by construction). */
  def driverCollectedCount: Long = driverCollected

  /** Hop events that went through the distributed loopback instead. */
  def loopbackWrittenCount: Long = loopbackWritten

  /** (batchId, triggerExecution ms) for every recent micro-batch that
    * carried input — the hop-latency observability the YCSB artifact
    * reports (a flow hop costs one micro-batch by construction; callers
    * window by batchId to separate warmup from the measured phase).
    */
  def busyBatches: Seq[(Long, Double)] =
    query.recentProgress.toSeq.filter(_.numInputRows > 0)
      .map(p => (p.batchId, p.durationMs.get("triggerExecution").toDouble))

  /** Raw progress JSON (duration breakdown per batch) for bench debug. */
  def progressJson: Seq[String] = query.recentProgress.toSeq.map(_.json)

  // MemoryStream.addData runs the kryo row ENCODER before taking its
  // internal buffer lock, and ExpressionEncoder serializers are not
  // thread-safe — concurrent addData corrupts the encode
  // (EXPRESSION_ENCODING_FAILED). Serialize the memory-ingress path
  // here; the file path is safe by construction (unique names + atomic
  // rename). This is what makes `concurrentSafe = true` honest.
  private val enqueueLock = new Object

  /** Enqueue client events: memory stream by default; a staged atomic
    * file write when the durable file ingress is configured.
    */
  private def enqueue(evs: Seq[Event]): Unit = fileInput match {
    case Some(in) =>
      // stage as a dotfile IN the ingress dir (same filesystem -> the
      // rename is atomic; the file source ignores dot-prefixed names)
      val name = java.util.UUID.randomUUID().toString + ".txt"
      val staged = java.nio.file.Paths.get(in, "." + name)
      val out = java.nio.file.Files.newBufferedWriter(staged)
      try evs.foreach { ev => out.write(EventBinary.encode(ev)); out.newLine() }
      finally out.close()
      java.nio.file.Files.move(staged, java.nio.file.Paths.get(in, name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
    case None => enqueueLock.synchronized(input.addData(evs)): Unit
  }

  /** Synchronous request/reply for tests and the YCSB driver: feed the
    * event, drain micro-batches (including loopback hops) until the
    * reply for this event id lands.
    */
  override def send(ev: Event): Event = {
    enqueue(Seq(ev))
    var spins = 0
    while (!replies.containsKey(ev.eventId) && spins < 300) {
      query.processAllAvailable()
      spins += 1
    }
    val r = replies.remove(ev.eventId)
    require(r != null, s"no reply for ${ev.eventId} after $spins batches")
    r
  }

  /** Pipelined fire-and-forget send; replies are collected asynchronously
    * (the shape the YCSB throughput driver uses).
    */
  def sendAsync(evs: Seq[Event]): Unit = enqueue(evs)

  // AsyncEventTransport: the pipelined client surface (Client.callAsync
  // and friends) — enqueue without blocking, pump micro-batches on
  // demand, complete futures from the reply map
  override def sendNoWait(ev: Event): Unit = enqueue(Seq(ev))
  override def advance(): Unit = drain()
  // thread-safe by construction: MemoryStream.addData synchronizes, the
  // file ingress writes unique names with atomic renames, the reply map
  // is a ConcurrentHashMap, and processAllAvailable is a blocking probe
  // safe from any thread — so a gateway may fire and pump without a lock
  override def concurrentSafe: Boolean = true

  def drain(): Unit = {
    query.processAllAvailable()
    while (pendingContinuations) query.processAllAvailable()
  }

  def takeReply(eventId: String): Option[Event] = Option(replies.remove(eventId))

  override def close(): Unit = query.stop()
}

object StreamingEntityRuntime {

  /** Temp dir for NON-durable runs, preferring tmpfs (/dev/shm): every
    * micro-batch writes offset/commit WAL entries and state-store
    * deltas, and a hop costs one batch — so the per-batch fsync floor
    * is hop latency. A session-scoped (explicitly non-recoverable)
    * checkpoint has no durability to lose in memory. Durable runs pass
    * `checkpointDir` and never come through here.
    */
  private[streaming] def newTempDir(prefix: String): java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm))
      java.nio.file.Files.createTempDirectory(shm, prefix)
    else java.nio.file.Files.createTempDirectory(prefix)
  }

  /** The `transformWithState` lowering of the entity operator (Spark 4
    * StatefulProcessor API, RocksDB-backed ValueState): identical
    * semantics to [[statefulFn]], expressed against the newer state API.
    */
  final class EntityProcessor(registry: EntityRegistry)
      extends StatefulProcessor[(String, String), Event, Event] {
    @transient private var state: ValueState[State] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[State](
        "entityState", Encoders.kryo[State], TTLConfig.NONE)

    override def handleInputRows(
        key: (String, String),
        rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Event] = {
      val handle = StatefulOperator.handle(registry) _
      var cur: Option[State] = if (state.exists()) Some(state.get()) else None
      val out = Seq.newBuilder[Event]
      rows.foreach { ev =>
        val (emitted, newState) = handle(ev, cur)
        out ++= emitted
        cur = newState
      }
      cur match {
        case Some(s) => state.update(s)
        case None => if (state.exists()) state.clear()
      }
      out.result().iterator
    }
  }

  /** Executor-side egress for one partition of a batch's stateful
    * output, in ONE pass: continuations stream into a staged loopback
    * file that is atomically renamed into the watched topic dir (the
    * file stream never sees a partial file); client-facing replies are
    * returned, to be collect()ed by the driver. Runs on the executor
    * that produced the events — this IS the distributed egress.
    *
    * Idempotence: the published name is a pure function of
    * (batchId, partitionId), and publication is skipped when the target
    * already exists — so a task retried after its rename succeeded, or a
    * whole batch replayed after a crash/restart (foreachBatch re-runs
    * uncommitted batches with the same batchId and replayed offsets,
    * hence identical partition content), republishes nothing instead of
    * double-appending hop events. The residual window is a zombie task
    * publishing after the file was already consumed AND deleted by a
    * later trigger — content-identical, same at-least-once residue as a
    * Kafka-producer retry on the reference's internal topic.
    */
  def egressPartition(
      events: Iterator[Event],
      stageDir: String,
      topicDir: String,
      acc: org.apache.spark.util.LongAccumulator,
      batchId: Long): Iterator[Event] = {
    val pid = Option(org.apache.spark.TaskContext.get())
      .map(_.partitionId()).getOrElse(0)
    val name = s"b$batchId-p$pid.txt"
    val target = java.nio.file.Paths.get(topicDir, name)
    // a prior attempt of this (batch, partition) already published its
    // continuations — idempotent replay: don't write, but still drain
    // the iterator for the replies
    val alreadyPublished = java.nio.file.Files.exists(target)
    // stage under a unique suffix so two concurrent attempts of the
    // same partition never write the same staged file
    val staged = java.nio.file.Paths.get(stageDir,
      name + "." + java.util.UUID.randomUUID().toString)
    val reps = Vector.newBuilder[Event]
    var out: java.io.BufferedWriter = null // opened on first continuation
    var n = 0L
    try {
      events.foreach { ev =>
        if (ev.eventType.isInstanceOf[EventType.Reply]) reps += ev
        else {
          n += 1
          if (!alreadyPublished) {
            if (out == null) out = java.nio.file.Files.newBufferedWriter(staged)
            out.write(EventBinary.encode(ev)); out.newLine()
          }
        }
      }
    } finally if (out != null) out.close()
    var published = false
    if (out != null) {
      if (java.nio.file.Files.exists(target)) java.nio.file.Files.delete(staged)
      else {
        java.nio.file.Files.move(staged, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
        published = true
      }
    }
    // Count only on the attempt that actually published: accumulator
    // updates inside a transformation are re-applied on task retry, so
    // counting replays would inflate the hop counters the specs and the
    // YCSB artifact assert on. (The pendingContinuations flag derived
    // from this is advisory — processAllAvailable sees published files
    // through the source's own listing regardless.)
    if (published) acc.add(n)
    reps.result().iterator
  }

  /** The per-group stateful function: a free-standing serializable
    * closure (captures only the registry) applying
    * [[StatefulOperator.handle]] to each event of the group in batch
    * arrival order.
    */
  def statefulFn(registry: EntityRegistry)(
      key: (String, String),
      events: Iterator[Event],
      state: GroupState[State]): Iterator[Event] = {
    val handle = StatefulOperator.handle(registry) _
    var cur: Option[State] = if (state.exists) Some(state.get) else None
    val out = Seq.newBuilder[Event]
    events.foreach { ev =>
      val (emitted, newState) = handle(ev, cur)
      out ++= emitted
      cur = newState
    }
    cur match {
      case Some(s) => state.update(s)
      case None => if (state.exists) state.remove()
    }
    out.result().iterator
  }
}
