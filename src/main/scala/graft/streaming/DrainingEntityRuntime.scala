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
  * Durability: none (state dies with the session) — by design the
  * LOW-LATENCY tier; durable deployments use the checkpointed
  * fMGWS/transformWithState lowerings. The reference's runtime
  * portfolio has the same split (in-process vs broker-backed).
  */
final class DrainingEntityRuntime(
    registry: EntityRegistry,
    spark: SparkSession,
    statePartitions: Int = 32,
    maxDrainRounds: Int = 64,
    compactEvery: Int = 16)
    extends graft.runtime.AsyncEventTransport with AutoCloseable {

  import spark.implicits._
  private implicit val eventEnc: Encoder[Event] = Encoders.kryo[Event]

  private val sc = spark.sparkContext
  private val partitioner = new HashPartitioner(statePartitions)
  private val input = MemoryStream[Event](spark, numPartitions = 1)
  private val replies = new ConcurrentHashMap[String, Event]()

  // the base store; only the stream thread (foreachBatch) mutates it
  @volatile private var base: RDD[((String, String), State)] =
    sc.parallelize(Seq.empty[((String, String), State)], statePartitions)
      .partitionBy(partitioner)
  // persisted predecessors retained until the next compaction (their
  // cached partitions back the unmaterialized ones of later bases)
  private val retained = mutable.ListBuffer.empty[RDD[_]]
  private var batches = 0L

  @volatile private var driverCollected = 0L
  @volatile private var drainedHops = 0L
  @volatile private var maxRoundsSeen = 0

  /** Events that exhausted `maxDrainRounds` spill here and re-enter as
    * the next batch's round 0 (liveness under pathological depth).
    */
  private val spill = mutable.ArrayBuffer.empty[Event]

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
          PartitionPruningRDD.create(base, pids.contains)
            .mapPartitions { it =>
              val evm = evB.value
              val skip = skipB.value
              it.flatMap { case (k, st) =>
                if (evm.contains(k) && !skip.contains(k))
                  Some(DrainingEntityRuntime.runKey(reg, k, Some(st), evm(k)))
                else None
              }
            }.collect()
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
        overlay(r.key) = r.state
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
    if (groups.nonEmpty) spill ++= groups.valuesIterator.flatten
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
        val pending =
          if (spill.nonEmpty) { val s = spill.toArray; spill.clear(); s ++ evs }
          else evs
        if (pending.nonEmpty) processBatch(pending)
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
  /** Per-key drain step result: output events + the key's new state. */
  final case class DrainOut(
      key: (String, String), out: Seq[Event], state: Option[State])

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
    DrainOut(key, out.result(), cur)
  }
}
