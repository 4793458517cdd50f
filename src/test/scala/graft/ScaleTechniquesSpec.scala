package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin
import graft.sources.Tables

/** The two explicit scale techniques from the design brief that don't
  * appear in the query inventory: bucketed co-located joins (shuffle
  * elimination) and salted skew joins (straggler elimination).
  */
class ScaleTechniquesSpec extends SparkSpec {

  test("bucketed tables join without a shuffle on either side") {
    // warehouse.dir is a static conf; use the default (./spark-warehouse,
    // gitignored) and DROP the tables afterwards
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Tables.orders(spark, sf).write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      Tables.lineitem(spark, sf).write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: bucketing satisfies the join's distribution -> no
      // Exchange under the SortMergeJoin
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
      // and the result matches the plain (shuffling) join
      val expected = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
        .count()
      assert(joined.count() === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("spread: fans out under-partitioned sources, no-op on well-split ones") {
    import spark.implicits._
    val rows = (0L until 200L).map(i => (i, s"tok$i alpha beta gamma delta epsilon zeta eta"))
    // already >= defaultParallelism splits (the at-scale case): spread
    // must NOT insert a round-robin shuffle of the corpus
    val well = spark.sparkContext.parallelize(rows, 8).toDF("doc_id", "text")
    val spreadWell = graft.operators.Dedup.spread(well)
    assert(spreadWell.rdd.getNumPartitions === 8)
    assert(!spreadWell.queryExecution.executedPlan.toString
      .contains("RoundRobinPartitioning"),
      "spread added a gratuitous shuffle to a well-partitioned source")
    // single-partition local file case: must fan out
    val narrow = spark.sparkContext.parallelize(rows, 1).toDF("doc_id", "text")
    val spreadNarrow = graft.operators.Dedup.spread(narrow)
    assert(spreadNarrow.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    assert(spreadNarrow.queryExecution.executedPlan.toString
      .contains("RoundRobinPartitioning"))
    // end-to-end: a signature pipeline over the well-split input plans no
    // round-robin exchange anywhere
    val p = graft.operators.Dedup.ngramJaccard(well)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("extended"))
    assert(!p.contains("RoundRobinPartitioning"), p)
  }

  test("salted skew join: same result as plain join under heavy key skew") {
    import spark.implicits._
    // 90% of left rows share one hot key
    val left = (1 to 5000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "payload")
    val right = (1L to 5000L).map(k => (k, s"dim$k")).toDF("rk", "dim")
    val plain = left.join(right, col("k") === col("rk"))
      .groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = SkewJoin.saltedInner(left, right, "k", "rk", saltFactor = 8)
      .groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted === plain)
    assert(plain(7L) === 4500L) // the hot key really is hot
  }
}
