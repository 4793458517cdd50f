package graft

import graft.model.TestEntities
import graft.runtime.EventTransport
import graft.streaming.StreamingEntityRuntime

/** The same S1-S6 scenario gate, but end-to-end through Structured
  * Streaming: MemoryStream -> groupByKey -> flatMapGroupsWithState ->
  * foreachBatch egress with loopback continuation re-injection. A
  * multi-hop flow (buy_item, state_requests, ...) really crosses
  * micro-batches here.
  */
class StreamingEntitySpec extends EntityScenarios with SparkSpec {

  private var open: List[StreamingEntityRuntime] = Nil

  override def freshTransport(): EventTransport = {
    val rt = new StreamingEntityRuntime(TestEntities.registry, spark)
    open ::= rt
    rt
  }

  override def withFixture(test: NoArgTest) = {
    try super.withFixture(test)
    finally { open.foreach(_.close()); open = Nil }
  }

  test("egress is distributed: hops use the loopback, driver sees replies only") {
    val (rtT, c) = fresh()
    val rt = rtT.asInstanceOf[StreamingEntityRuntime]
    val Right(u) = c.create("User", Map("username" -> "hopper"))
    val Right(it) = c.create("Item", Map("item_name" -> "hop-item", "price" -> 5))
    c.call(u, "update_balance", Map("x" -> 20))
    c.call(it, "update_stock", Map("amount" -> 4))
    // buy_item is a two-entity split flow: its inter-entity hops MUST go
    // through the distributed loopback sink, not the driver reply table
    val repliesBefore = rt.driverCollectedCount
    val hopsBefore = rt.loopbackWrittenCount
    assert(c.call(u, "buy_item", Map("amount" -> 3, "item" -> it)) === true)
    assert(rt.loopbackWrittenCount > hopsBefore,
      "flow hops must traverse the loopback, not the driver")
    // exactly one client-facing reply crossed the driver for the call
    assert(rt.driverCollectedCount - repliesBefore === 1L)
  }
}
