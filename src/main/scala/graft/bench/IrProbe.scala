package graft.bench

import org.apache.spark.sql.{functions => F, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Dev-only stage profiler for the retrieval family (ir1/ir2/ir3/ir4)
  * — which stage carries the 1.8-3.9 s at sf0.1 and how many driver
  * jobs each query run schedules. Not part of the driver contract;
  * BENCH_NOTES forensics for the r17 verdict ask #1 (fold the stats
  * collects, share the fixture chain).
  */
object IrProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = graft.sources.Tables.documents(spark, sf)

    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      })

    def t(name: String)(f: => Long): Unit = {
      spark.catalog.clearCache()
      System.gc()
      val j0 = jobs
      val s = System.nanoTime; val n = f
      println(f"[ir] $name%-28s ${(System.nanoTime - s) / 1e9}%.2f s " +
        f"rows=$n jobs=${jobs - j0}")
    }

    docs.count() // warm the parquet footer / JIT a little
    (1 to 2).foreach { i =>
      t(s"ir1_bm25_topk-$i") {
        graft.operators.TextAnalysis.bm25TopK(docs).count()
      }
      t(s"ir2_rrf_fusion-$i") {
        graft.operators.TextAnalysis.rrfFusionTopK(docs).count()
      }
      t(s"ir4_ql_topk-$i") {
        graft.operators.TextAnalysis.qlTopK(docs).count()
      }
      t(s"ir3_postings_build-$i") {
        graft.operators.TextAnalysis.bm25Postings(docs).count()
      }
    }

    // ir2 stage decomposition: chain pieces timed separately
    t("ir2-tf-materialize") {
      val tok = graft.operators.Dedup.spread(docs.select(F.col("doc_id"), F.col("text")))
        .select(F.col("doc_id"),
          F.explode(graft.operators.Dedup.tokens(F.col("text"))).as("term"))
      val tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).as("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val n = tf.count()
      tf.unpersist(false)
      n
    }
    spark.stop()
  }
}
