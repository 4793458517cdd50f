package graft

import graft.model.TestEntities
import graft.runtime.EventTransport
import graft.streaming.StreamingEntityRuntime

/** The full S1-S6 scenario gate a THIRD time, through Spark 4's
  * `transformWithState` lowering (StatefulProcessor + RocksDB state
  * store) — the same `StatefulOperator.handle` core, so passing here
  * proves the entity semantics are lowering-independent across
  * LocalRuntime, flatMapGroupsWithState, and transformWithState.
  *
  * Runs on a child session (`newSession`) so the RocksDB provider conf
  * never leaks into the other suites sharing the JVM-wide context.
  */
class TwsEntitySpec extends EntityScenarios with SparkSpec {

  private lazy val twsSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  private var open: List[StreamingEntityRuntime] = Nil

  override def freshTransport(): EventTransport = {
    val rt = new StreamingEntityRuntime(TestEntities.registry, twsSession,
      useTransformWithState = true)
    open ::= rt
    rt
  }

  override def withFixture(test: NoArgTest) = {
    try super.withFixture(test)
    finally { open.foreach(_.close()); open = Nil }
  }
}
