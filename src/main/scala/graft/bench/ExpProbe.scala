package graft.bench

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.util.concurrent.atomic.AtomicInteger

/** Dev-only scratch A/B probe for optimization experiments. Not part of
  * the driver contract; edited freely between experiments.
  */
object ExpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("exp-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    })
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def run1(mk: () => DataFrame): (Double, Int) = {
      spark.catalog.clearCache()
      jobs.set(0)
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(120)
      (dt, jobs.get())
    }
    // interleaved A/B: alternate variants so JIT/window drift hits both
    def ab(label: String, mkA: () => DataFrame, mkB: () => DataFrame, n: Int = 4): Unit = {
      val as = collection.mutable.Buffer[(Double, Int)]()
      val bs = collection.mutable.Buffer[(Double, Int)]()
      (1 to n).foreach { _ => as += run1(mkA); bs += run1(mkB) }
      val (ta, ja) = (as.map(_._1).min, as.map(_._2).max)
      val (tb, jb) = (bs.map(_._1).min, bs.map(_._2).max)
      println(f"[exp] $label%-28s A(orderBy) ${ta}%6.3f s/${ja}%3d jobs   B(orderSmall) ${tb}%6.3f s/${jb}%3d jobs   delta ${tb - ta}%+6.3f")
    }

    import graft.operators.{GraphRank, Similarity}
    import graft.sources.Tables
    import graft.queries.QueryDef.BoundedSortOps
    def gr5base(s: SparkSession) = GraphRank.triangleStats(
      GraphRank.documentLinkEdges(Tables.documents(s, sfDir)))
    ab("gr5_triangles",
      () => gr5base(spark).orderBy("node"),
      () => gr5base(spark).orderSmall("node"))
    def emb2base(s: SparkSession) = {
      val emb = Tables.embeddings(s, sfDir)
      Similarity.annRecall(
        Similarity.bruteForceTopK(emb, queryIds = graft.queries.DataPipeline.AnnQueryIds),
        graft.operators.IvfSearch.ivfTopK(emb, queryIds = graft.queries.DataPipeline.AnnQueryIds),
        k = 10)
    }
    ab("emb2_ann_recall",
      () => emb2base(spark).orderBy("qid"),
      () => emb2base(spark).orderSmall("qid"))
    spark.stop()
  }
}
