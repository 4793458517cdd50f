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
}
