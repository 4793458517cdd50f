package graft

import graft.model.TestEntities
import graft.runtime.EventTransport
import graft.streaming.DrainingEntityRuntime

/** The S1-S11 scenario gate on the DRAINING lowering (state managed in
  * foreachBatch, continuations re-dispatched in-batch), plus the
  * property the lowering exists for: a multi-hop flow completes in ONE
  * micro-batch instead of one per hop.
  */
class DrainingEntitySpec extends EntityScenarios with SparkSpec {

  private var open: List[DrainingEntityRuntime] = Nil

  override def freshTransport(): EventTransport = {
    val rt = new DrainingEntityRuntime(TestEntities.registry, spark)
    open ::= rt
    rt
  }

  override def withFixture(test: NoArgTest) = {
    try super.withFixture(test)
    finally { open.foreach(_.close()); open = Nil }
  }

  test("a two-entity split flow completes in ONE micro-batch") {
    val (rtT, c) = fresh()
    val rt = rtT.asInstanceOf[DrainingEntityRuntime]
    val Right(u) = c.create("User", Map("username" -> "drainer"))
    val Right(it) = c.create("Item", Map("item_name" -> "drain-item", "price" -> 5))
    c.call(u, "update_balance", Map("x" -> 20))
    c.call(it, "update_stock", Map("amount" -> 4))
    val batchesBefore = rt.busyBatches.size
    val hopsBefore = rt.drainedHopCount
    assert(c.call(u, "buy_item", Map("amount" -> 3, "item" -> it)) === true)
    // the flow's inter-entity hops drained inside the batch...
    assert(rt.drainedHopCount > hopsBefore,
      "buy_item hops must drain in-batch")
    // ...so exactly one non-empty micro-batch carried the whole flow
    // (the loopback lowering needs one batch PER hop here)
    assert(rt.busyBatches.size - batchesBefore === 1,
      s"flow should complete in one batch, saw ${rt.busyBatches.size - batchesBefore}")
    assert(rt.maxDrainRoundsSeen >= 2, "a split flow needs >= 2 drain rounds")
    // and state is consistent afterwards
    assert(c.getAttr(u, "balance") === 5)
    assert(c.getAttr(it, "stock") === 1)
  }

  test("round cap: events past maxDrainRounds spill to the next batch, flow still completes") {
    // cap 1: round 0 processes the client event, its first continuation
    // must spill and complete in a later batch — liveness under a cap
    // tighter than the flow's depth
    val rt = new DrainingEntityRuntime(TestEntities.registry, spark, maxDrainRounds = 1)
    open ::= rt
    val c = new graft.runtime.Client(TestEntities.registry, rt)
    val Right(u) = c.create("User", Map("username" -> "capped"))
    val Right(it) = c.create("Item", Map("item_name" -> "cap-item", "price" -> 5))
    c.call(u, "update_balance", Map("x" -> 20))
    c.call(it, "update_stock", Map("amount" -> 4))
    assert(c.call(u, "buy_item", Map("amount" -> 3, "item" -> it)) === true)
    assert(c.getAttr(u, "balance") === 5)
    assert(c.getAttr(it, "stock") === 1)
  }

  test("durable stateDir: a restarted runtime replays the changelog, tombstones included") {
    import graft.model.{Event, EventType, Payload}
    val dir = java.nio.file.Files.createTempDirectory("drain-state").toString
    val rt1 = new DrainingEntityRuntime(TestEntities.registry, spark,
      stateDir = Some(dir))
    val c1 = new graft.runtime.Client(TestEntities.registry, rt1)
    val Right(u) = c1.create("User", Map("username" -> "durable"))
    c1.call(u, "update_balance", Map("x" -> 37))
    val Right(gone) = c1.create("User", Map("username" -> "deleted-one"))
    assert(rt1.send(Event("d1", gone.entity, gone.key,
      EventType.DeleteState, Payload.Empty)).eventType ===
      EventType.SuccessfulStateRequest)
    rt1.close()
    // cold restart on the same changelog dir
    val rt2 = new DrainingEntityRuntime(TestEntities.registry, spark,
      stateDir = Some(dir))
    open ::= rt2
    val c2 = new graft.runtime.Client(TestEntities.registry, rt2)
    assert(c2.getAttr(u, "balance") === 37, "committed state must survive restart")
    // the delete's tombstone replays too — latest row per key wins
    assert(rt2.send(Event("g1", gone.entity, gone.key,
      EventType.GetState, Payload.AttrGet("username"))).eventType ===
      EventType.KeyNotFound)
    // and the restored store keeps accepting writes + durable flows
    c2.call(u, "update_balance", Map("x" -> -7))
    assert(c2.getAttr(u, "balance") === 30)
    // changelog compaction: many deltas fold into ONE live-rows file;
    // a third cold restart restores the identical state from it
    rt2.advance()
    rt2.compactChangelog()
    val files = new java.io.File(dir).list()
      .filter(n => n.startsWith("delta-") && n.endsWith(".parquet"))
    assert(files.length === 1, s"compaction must leave one delta, got ${files.toSeq}")
    rt2.close()
    open = open.filterNot(_ eq rt2)
    val rt3 = new DrainingEntityRuntime(TestEntities.registry, spark,
      stateDir = Some(dir))
    open ::= rt3
    val c3 = new graft.runtime.Client(TestEntities.registry, rt3)
    assert(c3.getAttr(u, "balance") === 30, "compacted changelog must restore")
    assert(rt3.send(Event("g2", gone.entity, gone.key,
      EventType.GetState, Payload.AttrGet("username"))).eventType ===
      EventType.KeyNotFound, "compaction must not resurrect deleted keys")
  }

  test("restart then IMMEDIATE compaction: store survives without a prior probe") {
    // the latent-lineage path: restore()'s partitionBy shuffle only
    // materializes on first probe, so a cold restart followed directly
    // by compactChangelog() used to leave `base` reading delta files
    // the compaction had just deleted -> FileNotFoundException on the
    // next state access. The fix re-points the store at the folded
    // delta before the old files go.
    val dir = java.nio.file.Files.createTempDirectory("drain-compact-cold").toString
    val rt1 = new DrainingEntityRuntime(TestEntities.registry, spark,
      stateDir = Some(dir))
    val c1 = new graft.runtime.Client(TestEntities.registry, rt1)
    val Right(u) = c1.create("User", Map("username" -> "cold-compact"))
    c1.call(u, "update_balance", Map("x" -> 12))
    rt1.close()
    val rt2 = new DrainingEntityRuntime(TestEntities.registry, spark,
      stateDir = Some(dir))
    open ::= rt2
    rt2.compactChangelog() // NO probe between restart and compaction
    val files = new java.io.File(dir).list()
      .filter(n => n.startsWith("delta-") && n.endsWith(".parquet"))
    assert(files.length === 1)
    val c2 = new graft.runtime.Client(TestEntities.registry, rt2)
    assert(c2.getAttr(u, "balance") === 12,
      "state access after restart+compact must not read deleted deltas")
    c2.call(u, "update_balance", Map("x" -> 3))
    assert(c2.getAttr(u, "balance") === 15)
  }

  test("read-only traffic appends no changelog deltas") {
    val dir = java.nio.file.Files.createTempDirectory("drain-readonly").toString
    val rt = new DrainingEntityRuntime(TestEntities.registry, spark,
      stateDir = Some(dir))
    open ::= rt
    val c = new graft.runtime.Client(TestEntities.registry, rt)
    val Right(u) = c.create("User", Map("username" -> "reader"))
    c.call(u, "update_balance", Map("x" -> 9))
    def deltas() = new java.io.File(dir).list()
      .count(n => n.startsWith("delta-") && n.endsWith(".parquet"))
    val before = deltas()
    (1 to 5).foreach { _ => assert(c.getAttr(u, "balance") === 9) }
    assert(deltas() === before,
      "GetState-only batches must not grow the durable changelog")
  }

  test("state survives batches, deletes tombstone, compaction preserves both") {
    val (rtT, c) = fresh()
    val rt = rtT.asInstanceOf[DrainingEntityRuntime]
    // compactEvery default is 16; run enough batches to cross it
    val refs = (0 until 20).map { i =>
      val Right(r) = c.create("User", Map("username" -> s"u$i"))
      c.call(r, "update_balance", Map("x" -> i)): Unit
      r
    }
    refs.zipWithIndex.foreach { case (r, i) =>
      assert(c.getAttr(r, "balance") === i, s"state for u$i lost across batches")
    }
    // delete u0; a later read must see KeyNotFound, not a stale row
    import graft.model.{Event, EventType, Payload}
    val del = Event("del-u0", refs.head.entity, refs.head.key,
      EventType.DeleteState, Payload.Empty)
    assert(rtT.send(del).eventType === EventType.SuccessfulStateRequest)
    val get = Event("get-u0", refs.head.entity, refs.head.key,
      EventType.GetState, Payload.AttrGet("balance"))
    assert(rtT.send(get).eventType === EventType.KeyNotFound)
    // re-create with the same args (same derived key) succeeds only if
    // the tombstone really removed the row
    val Right(re) = c.create("User", Map("username" -> "u0"))
    assert(re.key === refs.head.key)
    assert(rt.driverCollectedCount > 0)
  }
}
