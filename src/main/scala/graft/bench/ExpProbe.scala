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
    implicit val sp: SparkSession = spark
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
    def bestOf(label: String, mk: () => DataFrame, n: Int = 3): Unit = {
      val ts = (1 to n).map(_ => run1(mk))
      println(f"[exp] $label%-36s min ${ts.map(_._1).min}%6.3f s  jobs ${ts.map(_._2).max}%3d  runs ${ts.map(t => f"${t._1}%.2f").mkString("[", ",", "]")}")
    }

    import graft.operators.Multimodal
    import graft.sources.Tables
    def docs(k: Int): DataFrame = {
      val d = Tables.documents(spark, sfDir)
      if (k <= 1) d else d.repartition(k)
    }
    Seq(1, 4, 8).foreach { k =>
      bestOf(s"mm_audio decode par=$k", () =>
        Multimodal.decodeAudio(Multimodal.syntheticAudio(docs(k))).toDF().orderBy("doc_id"))
    }
    Seq(1, 4, 8).foreach { k =>
      bestOf(s"mm_audio_pairs par=$k", () =>
        Multimodal.audioEnvelopePairs(
          Multimodal.syntheticPatternAudio(docs(k))).orderBy("da", "db"))
    }
    Seq(1, 4, 8).foreach { k =>
      bestOf(s"mm_dhash_pairs par=$k", () =>
        Multimodal.dhashPairs(Multimodal.syntheticPatternImages(docs(k))).orderBy("da", "db"))
    }
    spark.stop()
  }
}
