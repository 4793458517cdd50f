package graft

import graft.model.TestEntities
import graft.runtime.Client
import graft.streaming.StreamingEntityRuntime

/** Durability gate: entity state survives a full runtime restart when
  * the sources are replayable (file ingress) and the checkpoint dir is
  * stable — the property the reference gets from Kafka offsets +
  * runtime state backends, here from Spark's checkpointed state store.
  * MemoryStream cannot provide this (its data dies with the query), so
  * this spec runs the file-ingress mode; production swaps in Kafka with
  * the same topology.
  */
class CheckpointRecoverySpec extends SparkSpec {

  test("entity state survives a runtime restart from the checkpoint") {
    val base = java.nio.file.Files.createTempDirectory("graft-recovery")
    val ckpt = base.resolve("ckpt").toString
    val in = base.resolve("in").toString

    // life 1: create + mutate state, then stop the runtime
    val rt1 = new StreamingEntityRuntime(TestEntities.registry, spark,
      checkpointDir = Some(ckpt), fileInputDir = Some(in))
    val c1 = new Client(TestEntities.registry, rt1)
    val Right(u) = c1.create("User", Map("username" -> "phoenix"))
    c1.call(u, "update_balance", Map("x" -> 42))
    assert(c1.getAttr(u, "balance") === 42)
    rt1.close()

    // life 2: a NEW runtime over the same checkpoint + ingress dirs
    // resumes the state store — the balance written before the restart
    // must be visible, and further mutations must build on it
    val rt2 = new StreamingEntityRuntime(TestEntities.registry, spark,
      checkpointDir = Some(ckpt), fileInputDir = Some(in))
    try {
      val c2 = new Client(TestEntities.registry, rt2)
      assert(c2.getAttr(u, "balance") === 42)
      c2.call(u, "update_balance", Map("x" -> 8))
      assert(c2.getAttr(u, "balance") === 50)
      // duplicate create must still fail: key existence is state too
      assert(c2.create("User", Map("username" -> "phoenix")).isLeft)
    } finally rt2.close()
  }
}
