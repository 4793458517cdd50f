package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable
import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.{PartitionPruningRDD, RDD}
import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.storage.StorageLevel
import graft.model._
import graft.model.Types._
import graft.runtime.StatefulOperator

/** The DRAINING lowering of the entity runtime: a multi-hop flow
  * completes in ONE micro-batch.
  *
  * The [[StreamingEntityRuntime]] lowerings pay one micro-batch per
  * inter-key hop — continuations exit through the loopback topic and
  * re-enter the stateful operator at the next trigger, because
  * `flatMapGroupsWithState` state is only reachable inside the operator
  * and an operator's output cannot feed its own input within a batch.
  * That is the reference's cost profile too (one broker round-trip per
  * hop, /root/reference/stateflow/dataflow/dataflow.py:96-106), and its
  * same-key step batching (stateful_operator.py:249-275, our
  * [[StatefulOperator.stepFlow]]) is the precedent this runtime
  * generalizes: if successive SAME-key steps can run without a broker
  * round-trip, successive CROSS-key steps can run without a trigger
  * round-trip — provided the runtime, not the state-store operator,
  * owns the state.
  *
  * So this lowering manages state explicitly inside `foreachBatch` (the
  * documented Structured Streaming pattern for state the built-in
  * operators can't reach — foreachBatch + keyed MERGE):
  *
  *   - **Base store**: an `RDD[((entity, key), State)]` hash-partitioned
  *     by [[HashPartitioner]] — the partitioner is driver-computable, so
  *     a drain round probes ONLY the partitions hosting touched keys
  *     ([[PartitionPruningRDD]]): per-round cost is O(touched
  *     partitions), never O(state). Production swaps this frame for a
  *     point-readable store (RocksDB service, Delta MERGE target); the
  *     partition-pruned scan is the same access shape.
  *   - **Drain rounds**: round 0 groups the batch's client events by
  *     key; each round runs [[StatefulOperator.handle]] executor-side
  *     over (events, state) per key, exactly as the other lowerings do.
  *     Replies surface to the client; continuations become round r+1's
  *     event groups IMMEDIATELY — no loopback, no next trigger. Rounds
  *     are bounded by flow depth (cap `maxDrainRounds`, with a
  *     next-batch spill for liveness).
  *   - **Touched overlay**: states written this batch live in a
  *     driver-held map between rounds and merge into the base store
  *     once per batch. The overlay is BATCH-bounded (each hop touches
  *     one key), the same driver budget as the reply collect every
  *     lowering already pays — never state-bounded. Hop EVENTS cross
  *     the driver here (vs the loopback lowering's distributed egress):
  *     that is this lowering's trade — hop latency over hop locality —
  *     and both lowerings stay available per workload.
  *   - **Merge**: one partitioner-preserving narrow pass drops touched
  *     keys and splices the overlay's survivors in; persisted lazily so
  *     only probed partitions ever materialize, with a periodic
  *     `localCheckpoint` compaction (every `compactEvery` batches)
  *     bounding lineage depth — the snapshot+delta discipline of
  *     Spark's own HDFS-backed state store.
  *
  * Durability: opt-in via `stateDir` — each batch appends its
  * touched-state overlay as a parquet changelog delta (batch-bounded
  * write), and a restarted runtime REPLAYS the changelog distributed-ly
  * (latest row per key wins, tombstones drop, one keyed shuffle; state
  * never sits on the driver). That covers warm restart of committed
  * state; INPUT replay needs a replayable source, which the
  * checkpointed fMGWS/transformWithState lowerings provide — the
  * reference's runtime portfolio has the same split (in-process vs
  * broker-backed).
  */
final class DrainingEntityRuntime(
    registry: EntityRegistry,
    spark: SparkSession,
    statePartitions: Int = 32,
    maxDrainRounds: Int = 64,
    compactEvery: Int = 16,
    stateDir: Option[String] = None)
    extends graft.runtime.AsyncEventTransport with AutoCloseable {

  import spark.implicits._
  private implicit val eventEnc: Encoder[Event] = Encoders.kryo[Event]

  private val sc = spark.sparkContext
  private val partitioner = new HashPartitioner(statePartitions)
  private val input = MemoryStream[Event](spark, numPartitions = 1)
  private val replies = new ConcurrentHashMap[String, Event]()

  // the base store; only the stream thread (foreachBatch) mutates it.
  // With a stateDir, startup REPLAYS the changelog distributed-ly:
  // read every delta, keep each key's latest row (tombstones drop),
  // deserialize — state never sits on the driver.
  @volatile private var base: RDD[((String, String), State)] =
    stateDir.map(DrainingEntityRuntime.restore(spark, _, partitioner))
      .getOrElse(
        sc.parallelize(Seq.empty[((String, String), State)], statePartitions)
          .partitionBy(partitioner))
  /** Delta files already on disk at startup (restore watermark). */
  private var deltaSeq: Long =
    stateDir.map(DrainingEntityRuntime.nextDeltaSeq).getOrElse(0L)
  // persisted predecessors retained until the next compaction (their
  // cached partitions back the unmaterialized ones of later bases)
  private val retained = mutable.ListBuffer.empty[RDD[_]]
  private var batches = 0L

  @volatile private var driverCollected = 0L
  @volatile private var drainedHops = 0L
  @volatile private var maxRoundsSeen = 0

  private def processBatch(events: Array[Event]): Unit = {
    val reg = registry
    var groups = groupByKey(events.toSeq)
    // states written this batch (None = deleted); authoritative over base
    val overlay = mutable.LinkedHashMap.empty[(String, String), Option[State]]
    var round = 0
    while (groups.nonEmpty && round < maxDrainRounds) {
      val evB = sc.broadcast(groups)
      val ovKeys = overlay.keySet.toSet
      // probe only the base partitions hosting keys still reading base
      // state (keys already overlaid this batch skip the base row)
      val baseKeys = groups.keysIterator.filterNot(ovKeys.contains).toVector
      val probed: Array[DrainingEntityRuntime.DrainOut] =
        if (baseKeys.isEmpty) Array.empty
        else {
          val pids = baseKeys.map(partitioner.getPartition(_)).toSet
          val skipB = sc.broadcast(ovKeys)
          val out = PartitionPruningRDD.create(base, pids.contains)
            .mapPartitions { it =>
              val evm = evB.value
              val skip = skipB.value
              it.flatMap { case (k, st) =>
                if (evm.contains(k) && !skip.contains(k))
                  Some(DrainingEntityRuntime.runKey(reg, k, Some(st), evm(k)))
                else None
              }
            }.collect()
          skipB.destroy()
          out
        }
      // keys with no live base row: overlaid this batch, or brand new
      val matched = probed.iterator.map(_.key).toSet
      val leftover = groups.keysIterator.filterNot(matched.contains).toVector
      val rest: Array[DrainingEntityRuntime.DrainOut] =
        if (leftover.isEmpty) Array.empty
        else {
          val jobs = leftover.map(k => (k, overlay.getOrElse(k, None), groups(k)))
          sc.parallelize(jobs, math.min(jobs.size, 8))
            .map { case (k, st, evs) => DrainingEntityRuntime.runKey(reg, k, st, evs) }
            .collect()
        }
      evB.destroy()
      val conts = Vector.newBuilder[Event]
      (probed.iterator ++ rest.iterator).foreach { r =>
        // only CHANGED keys enter the overlay: a pure read keeps its
        // base row authoritative (later rounds re-probe base, which is
        // correct), the merge pass splices nothing for it, and a durable
        // runtime under read traffic appends no changelog delta
        if (r.changed) overlay(r.key) = r.state
        r.out.foreach { ev =>
          if (ev.eventType.isInstanceOf[EventType.Reply]) {
            replies.put(ev.eventId, ev)
            driverCollected += 1
          } else conts += ev
        }
      }
      val c = conts.result()
      drainedHops += c.size
      groups = groupByKey(c)
      round += 1
    }
    if (round > maxRoundsSeen) maxRoundsSeen = round
    // liveness under a cap tighter than the flow depth: leftover
    // continuations re-enter through the ingress, so the NEXT trigger
    // (which processAllAvailable will run — the stream has new data)
    // resumes the drain where this batch stopped
    if (groups.nonEmpty) enqueue(groups.valuesIterator.flatten.toSeq)
    mergeOverlay(overlay)
  }

  private def groupByKey(evs: Seq[Event]): mutable.LinkedHashMap[(String, String), Vector[Event]] = {
    val m = mutable.LinkedHashMap.empty[(String, String), Vector[Event]]
    evs.foreach { ev =>
      val k = (ev.entity, ev.key)
      m.update(k, m.getOrElse(k, Vector.empty) :+ ev)
    }
    m
  }

  /** One partitioner-preserving narrow pass: drop every touched key's
    * old row, splice the overlay's surviving states into their home
    * partitions. Persisted LAZILY — an untouched partition never
    * materializes; a probed one computes through at most `compactEvery`
    * cached narrow filters before the periodic localCheckpoint snaps
    * the chain.
    */
  private def mergeOverlay(
      overlay: mutable.LinkedHashMap[(String, String), Option[State]]): Unit = {
    if (overlay.isEmpty) return
    // durable tier: the batch's touched-state overlay IS the changelog
    // delta — batch-bounded, appended before the in-memory merge so a
    // crash after the append replays into the same end state. The
    // java-serialized state blob is the internal store format (like the
    // state store's UnsafeRow bytes), not a public artifact.
    stateDir.foreach { dir =>
      val rows = overlay.iterator.map { case ((e, k), st) =>
        (e, k, st.isEmpty, st.map(DrainingEntityRuntime.stateBytes).orNull)
      }.toSeq
      spark.createDataset(rows).toDF("entity", "key", "deleted", "state_bin")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"$dir/delta-$deltaSeq%012d.parquet")
      deltaSeq += 1
    }
    val dead = overlay.keySet.toSet
    val updByPid: Map[Int, Vector[((String, String), State)]] =
      overlay.iterator.collect { case (k, Some(s)) => (k, s) }
        .toVector.groupBy { case (k, _) => partitioner.getPartition(k) }
    val deadB = sc.broadcast(dead)
    val updB = sc.broadcast(updByPid)
    val merged = base.mapPartitionsWithIndex({ (pid, it) =>
      val d = deadB.value
      it.filterNot(r => d.contains(r._1)) ++
        updB.value.getOrElse(pid, Vector.empty).iterator
    }, preservesPartitioning = true)
    batches += 1
    if (batches % compactEvery == 0) {
      // compaction: full snapshot, lineage cut, predecessors freed
      merged.persist(StorageLevel.MEMORY_AND_DISK)
      merged.localCheckpoint()
      merged.count(): Unit
      retained.foreach(_.unpersist(false))
      retained.clear()
    } else {
      merged.persist(StorageLevel.MEMORY_AND_DISK)
      retained += merged
    }
    base = merged
  }

  private val query: StreamingQuery = {
    input.toDS()
      .writeStream
      .outputMode("append")
      .queryName("graft-entity-runtime-draining")
      .option("checkpointLocation",
        StreamingEntityRuntime.newTempDir("graft-drain-ckpt").toString)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Event], _: Long) =>
        val evs = batch.collect()
        if (evs.nonEmpty) processBatch(evs)
        ()
      }
      .start()
  }

  /** Replies surfaced to the driver (every reply, by construction). */
  def driverCollectedCount: Long = driverCollected

  /** Continuations drained IN-batch (the loopback lowering's
    * `loopbackWrittenCount` analog — same hop accounting, zero extra
    * triggers).
    */
  def drainedHopCount: Long = drainedHops

  /** Deepest drain loop any batch has run — a flow with H inter-key
    * hops drains in H+1 rounds of its ONE batch.
    */
  def maxDrainRoundsSeen: Int = maxRoundsSeen

  /** (batchId, triggerExecution ms) per recent non-empty micro-batch. */
  def busyBatches: Seq[(Long, Double)] =
    query.recentProgress.toSeq.filter(_.numInputRows > 0)
      .map(p => (p.batchId, p.durationMs.get("triggerExecution").toDouble))

  /** Fold the durable changelog into ONE delta holding each key's
    * latest LIVE row (tombstones and superseded versions drop), then
    * remove the old files — bounded-changelog maintenance for a
    * long-running durable runtime (the production analog: state-store
    * snapshot maintenance folding a changelog). The fold rides the
    * same distributed replay as [[DrainingEntityRuntime.restore]] —
    * state never sits on the driver. Call between batches (quiesce
    * with `processAllAvailable`, e.g. [[advance]], first); no-op
    * without a `stateDir` or with <= 1 delta.
    */
  def compactChangelog(): Unit = stateDir.foreach { dir =>
    val d = new java.io.File(dir)
    val old = Option(d.list()).getOrElse(Array.empty[String])
      .filter(n => n.startsWith("delta-") && n.endsWith(".parquet")).sorted
    if (old.length > 1) {
      val folded = DrainingEntityRuntime.restore(spark, dir, partitioner)
        .map { case ((e, k), st) =>
          (e, k, false, DrainingEntityRuntime.stateBytes(st))
        }
      spark.createDataset(folded).toDF("entity", "key", "deleted", "state_bin")
        .write.mode("overwrite")
        .parquet(f"$dir/delta-$deltaSeq%012d.parquet")
      deltaSeq += 1
      old.foreach { n =>
        val p = new java.io.File(d, n)
        Option(p.listFiles()).foreach(_.foreach(_.delete()))
        p.delete(): Unit
      }
      // RE-POINT the live store: `base`'s lineage may still reference
      // the files just deleted — restore()'s partitionBy shuffle only
      // materializes on first probe, so a restart followed directly by
      // compaction would otherwise recompute the parquet scan over
      // removed files and throw FileNotFoundException. Every merged
      // overlay is appended as a delta BEFORE the in-memory merge, so
      // the folded delta holds exactly the live store's state; a fresh
      // restore over it is the same store with clean lineage.
      retained.foreach(_.unpersist(false))
      retained.clear()
      base.unpersist(false)
      base = DrainingEntityRuntime.restore(spark, dir, partitioner)
    }
  }

  private val enqueueLock = new Object
  private def enqueue(evs: Seq[Event]): Unit =
    enqueueLock.synchronized(input.addData(evs)): Unit

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

  def sendAsync(evs: Seq[Event]): Unit = enqueue(evs)
  override def sendNoWait(ev: Event): Unit = enqueue(Seq(ev))
  override def advance(): Unit = query.processAllAvailable()
  // MemoryStream ingress serialized by enqueueLock, replies are a
  // ConcurrentHashMap, processAllAvailable is a blocking probe safe
  // from any thread; foreachBatch bodies are serialized by the stream
  // execution thread, so the store vars have a single writer
  override def concurrentSafe: Boolean = true

  def takeReply(eventId: String): Option[Event] = Option(replies.remove(eventId))

  override def close(): Unit = {
    query.stop()
    retained.foreach(_.unpersist(false))
    retained.clear()
    base.unpersist(false): Unit
  }
}

object DrainingEntityRuntime {
  /** Per-key drain step result: output events + the key's new state.
    * `changed` is value equality against the state the fold started
    * from (states are immutable `Map`s built functionally by handlers —
    * in-place mutation is not part of the state contract, the GroupState
    * lowerings rely on that too): an unchanged key skips the overlay,
    * so a read-only batch writes NO changelog delta and splices nothing.
    */
  final case class DrainOut(
      key: (String, String), out: Seq[Event], state: Option[State],
      changed: Boolean)

  private[streaming] def stateBytes(st: State): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.ObjectOutputStream(bos)
    try out.writeObject(st) finally out.close()
    bos.toByteArray
  }

  private[streaming] def stateFromBytes(b: Array[Byte]): State = {
    val in = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(b))
    try in.readObject().asInstanceOf[State] finally in.close()
  }

  /** First unused delta sequence number in a changelog dir. */
  private[streaming] def nextDeltaSeq(dir: String): Long = {
    val d = new java.io.File(dir)
    if (!d.isDirectory) 0L
    else {
      val ns = Option(d.list()).getOrElse(Array.empty[String])
        .collect { case n if n.startsWith("delta-") && n.endsWith(".parquet") =>
          n.stripPrefix("delta-").stripSuffix(".parquet").toLong }
      if (ns.isEmpty) 0L else ns.max + 1
    }
  }

  /** Distributed changelog replay: read every delta (its sequence
    * number rides the file path), keep each key's LATEST row, drop
    * tombstones, deserialize, land on the store's partitioner. One
    * keyed shuffle over the changelog — state never touches the
    * driver. (Production compaction would fold old deltas into a
    * snapshot; the replay shape is identical.)
    */
  private[streaming] def restore(
      spark: SparkSession,
      dir: String,
      partitioner: HashPartitioner): RDD[((String, String), State)] = {
    import spark.implicits._
    val d = new java.io.File(dir)
    java.nio.file.Files.createDirectories(d.toPath)
    val deltas = Option(d.list()).getOrElse(Array.empty[String])
      .filter(n => n.startsWith("delta-") && n.endsWith(".parquet"))
      .sorted.map(n => s"$dir/$n")
    if (deltas.isEmpty)
      spark.sparkContext
        .parallelize(Seq.empty[((String, String), State)], partitioner.numPartitions)
        .partitionBy(partitioner)
    else {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val all = spark.read.parquet(deltas: _*)
        .withColumn("seq",
          regexp_extract(input_file_name(), "delta-(\\d+)\\.parquet", 1)
            .cast("long"))
      val latest = all
        .withColumn("rn", row_number().over(
          Window.partitionBy("entity", "key").orderBy(col("seq").desc)))
        .filter(col("rn") === 1 && !col("deleted"))
        .select("entity", "key", "state_bin")
      latest.as[(String, String, Array[Byte])].rdd
        .map { case (e, k, b) => ((e, k), stateFromBytes(b)) }
        .partitionBy(partitioner)
    }
  }

  /** Apply [[StatefulOperator.handle]] over one key's events in batch
    * order — the same fold as [[StreamingEntityRuntime.statefulFn]],
    * returning the final state instead of writing a GroupState. Runs
    * executor-side (free-standing, captures nothing).
    */
  def runKey(
      registry: EntityRegistry,
      key: (String, String),
      state0: Option[State],
      evs: Seq[Event]): DrainOut = {
    val handle = StatefulOperator.handle(registry) _
    var cur = state0
    val out = Seq.newBuilder[Event]
    evs.foreach { ev =>
      val (emitted, st) = handle(ev, cur)
      out ++= emitted
      cur = st
    }
    DrainOut(key, out.result(), cur, changed = cur != state0)
  }
}
