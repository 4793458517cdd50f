package graft.bench

import org.apache.spark.sql.{functions => F, SparkSession}

/** Dev-only stage profiler for cl4_dbscan_lsh (the weak set's worst
  * member at sf0.1): which stage of lshNearDupPairs + dbscan carries
  * the ~4.6 s, and how many driver jobs each piece schedules. Not
  * part of the driver contract; BENCH_NOTES forensics.
  */
object Cl4Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val emb = graft.sources.Tables.embeddings(spark, sf)

    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      })
    def t(name: String)(f: => Long): Unit = {
      spark.catalog.clearCache()
      val j0 = jobs
      val s = System.nanoTime; val n = f
      println(f"[cl4] $name%-26s ${(System.nanoTime - s) / 1e9}%.2f s " +
        f"rows=$n jobs=${jobs - j0}")
    }

    emb.count()
    (1 to 2).foreach { i =>
      t(s"full-$i") {
        graft.operators.Clustering.dbscan(emb,
          pairs = Some(graft.operators.Similarity.lshNearDupPairs(
            emb, threshold = 0.35))).count()
      }
      t(s"lsh-pairs-only-$i") {
        graft.operators.Similarity.lshNearDupPairs(
          emb, threshold = 0.35).count()
      }
      t(s"dbscan-on-materialized-$i") {
        val pr = graft.operators.Similarity.lshNearDupPairs(
          emb, threshold = 0.35)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        pr.count()
        val j0 = jobs
        val s0 = System.nanoTime
        val n = graft.operators.Clustering.dbscan(emb, pairs = Some(pr)).count()
        println(f"[cl4]   (tail alone)           ${(System.nanoTime - s0) / 1e9}%.2f s " +
          f"jobs=${jobs - j0}")
        pr.unpersist(false)
        n
      }
    }
    spark.stop()
  }
}
