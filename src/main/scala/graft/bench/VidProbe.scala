package graft.bench

import org.apache.spark.sql.SparkSession

/** Scratch profiler for mm_video_pairs stage costs (dev tool). */
object VidProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => Unit): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      f
      println(f"[vidprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    implicit val s: SparkSession = spark
    val docs = graft.sources.Tables.documents(spark, sfDir)
    for (_ <- 1 to 3) {
      t("docs scan") {
        docs.write.format("noop").mode("overwrite").save()
      }
      t("synthetic vids") {
        graft.operators.Multimodal.syntheticVideoDocs(docs)
          .write.format("noop").mode("overwrite").save()
      }
      t("frameSample") {
        graft.operators.Multimodal.frameSample(
          graft.operators.Multimodal.syntheticVideoDocs(docs),
          frameBytes = 16, targetFrames = 64)
          .write.format("noop").mode("overwrite").save()
      }
      t("sets agg only") {
        import org.apache.spark.sql.functions._
        graft.operators.Multimodal.frameSample(
          graft.operators.Multimodal.syntheticVideoDocs(docs),
          frameBytes = 16, targetFrames = 64).toDF()
          .select(col("doc_id"), col("frame_md5").as("s"))
          .groupBy("doc_id").agg(collect_set(col("s")).as("sigs"))
          .write.format("noop").mode("overwrite").save()
      }
      t("full videoFramePairs") {
        graft.operators.Multimodal.videoFramePairs(
          graft.operators.Multimodal.frameSample(
            graft.operators.Multimodal.syntheticVideoDocs(docs),
            frameBytes = 16, targetFrames = 64).toDF())
          .write.format("noop").mode("overwrite").save()
      }
      t("full + orderBy (query def)") {
        graft.queries.DataPipeline.mm_video_pairs.fn(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
