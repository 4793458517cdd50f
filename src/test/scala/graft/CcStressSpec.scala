package graft

import graft.operators.Dedup

/** Large-graph stress for [[Dedup.duplicateClusters]]'s DISTRIBUTED
  * path — the 100×-scale protection for dd8/pipe1: an adversarial
  * 10k-node chain (diameter 9999 — linear hash-min would need 9999
  * rounds, far past maxIters) plus two 1k-node star clusters must
  * converge in O(log diameter) rounds via the pointer jump, touch the
  * driver with NO row-shaped collect, and label every component by its
  * min id. The fast path is disabled (`smallGraphMaxEdges = 0`) so the
  * iterative loop itself is what's under test.
  */
class CcStressSpec extends SparkSpec {

  test("distributed CC: 10k chain + two 1k stars, O(log d) rounds, no driver collect") {
    import spark.implicits._
    val chain = (1L until 10000L).map(i => (i, i + 1))
    val starA = (20002L to 21000L).map(i => (20001L, i))
    val starB = (30002L to 31000L).map(i => (30001L, i))
    val pairs = (chain ++ starA ++ starB).toDF("da", "db")
      // pre-spread the pair frame so the loop's first snap isn't a
      // single-partition local collection pretending to be distributed
      .repartition(4)

    val resultStages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (js.stageInfos.nonEmpty)
          resultStages.add(js.stageInfos.maxBy(_.stageId).name)
    }
    val sc = spark.sparkContext
    // AQE off: each eager checkpoint is then exactly ONE action job, so
    // the checkpoint count below reads as the loop's round count (same
    // discipline as DedupSpec's one-action-per-round test)
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.addSparkListener(listener)
    val out =
      try {
        // maxIters = 20 is itself the O(log d) assertion: the linear
        // propagation this loop would degrade to without the jump
        // needs ~9999 rounds and FAILS the require(converged) inside
        val r = Dedup.duplicateClusters(pairs,
          maxIters = 20, smallGraphMaxEdges = 0L).collect()
        var last = -1; var spins = 0
        while (last != resultStages.size && spins < 50) {
          last = resultStages.size; Thread.sleep(100); spins += 1
        }
        r
      } finally {
        sc.removeSparkListener(listener)
        spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      }

    // component correctness: min-id labels, exact sizes, full coverage
    val byCluster = out.groupBy(_.getLong(1))
    assert(byCluster.keySet === Set(1L, 20001L, 30001L))
    assert(byCluster(1L).length === 10000)
    assert(byCluster(20001L).length === 1000)
    assert(byCluster(30001L).length === 1000)
    assert(out.forall(r => r.getLong(2) ==
      byCluster(r.getLong(1)).length.toLong))

    import scala.jdk.CollectionConverters._
    val names = resultStages.asScala.toSeq
    // round count: with AQE off every loop round is exactly one
    // localCheckpoint action (plus the init labels checkpoint).
    // Doubling reach covers diameter 9999 in ceil(log2(9999)) = 14
    // propagation rounds + the zero-change confirm round + init = 16
    // actions (simulated exactly); allow ±2 slack without letting a
    // linear (diameter-bound) loop sneak through.
    val checkpoints = names.count(_.startsWith("localCheckpoint at"))
    assert(checkpoints >= 8 && checkpoints <= 18,
      s"expected ~16 checkpoint actions (log2 diameter + 2), saw $checkpoints in $names")
    // nothing row-shaped reaches the driver from inside the operator:
    // the only collect job is this spec's own assertion collect
    val operatorCollects = names.filter(n =>
      n.startsWith("collect at") && n.contains("Dedup.scala"))
    assert(operatorCollects.isEmpty,
      s"distributed path must not collect rows to the driver: $operatorCollects")
  }
}
