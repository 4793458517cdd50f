package graft.bench

import org.apache.spark.sql.{functions => F, SparkSession}

/** Dev-only stage profiler for pipe2 (screenAndPhase) — prints one
  * line per component at the given SF. Not part of the driver
  * contract; kept for BENCH_NOTES forensics.
  */
object P2Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = graft.sources.Tables.documents(spark, sf)
    def t(name: String)(f: => Long): Unit = {
      spark.catalog.clearCache()
      val s = System.nanoTime; val n = f
      println(f"[p2] $name%-12s ${(System.nanoTime - s) / 1e9}%.2f s rows=$n")
    }
    docs.count() // warmup
    t("clf") { graft.operators.TextAnalysis.linearQualityScore(docs, threshold = -0.2)
      .filter(F.col("keep")).count() }
    t("span") { graft.operators.Dedup.spanDupFraction(
      docs.select(F.col("doc_id").cast("long").as("doc_id"), F.col("text")),
      maxDupFrac = 0.3).filter(!F.col("drop")).count() }
    t("curriculum") { graft.operators.Sampling.curriculum(
      docs.select(F.col("doc_id").cast("long").as("doc_id"), F.col("text"))).count() }
    t("span-warm") { graft.operators.Dedup.spanDupFraction(
      docs.select(F.col("doc_id").cast("long").as("doc_id"), F.col("text")),
      maxDupFrac = 0.3).filter(!F.col("drop")).count() }
    t("pipe2-full") { graft.operators.TrainingPipeline.screenAndPhase(docs).count() }
    t("pipe2-warm") { graft.operators.TrainingPipeline.screenAndPhase(docs).count() }
    t("pipe2-warm2") { graft.operators.TrainingPipeline.screenAndPhase(docs).count() }
    // experimental: persist screened + survivors (multi-consumer frames)
    def persisted(): Long = {
      import org.apache.spark.sql.functions._
      val clfKeep = graft.operators.TextAnalysis.linearQualityScore(docs, threshold = -0.2)
        .filter(col("keep")).select(col("doc_id"))
      val screened = docs
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .join(clfKeep, Seq("doc_id"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val spanKeep = graft.operators.Dedup.spanDupFraction(screened, maxDupFrac = 0.3)
        .filter(!col("drop"))
        .select(col("doc_id"), col("n_tokens"))
      val survivors = screened.join(spanKeep, Seq("doc_id"), "inner")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val phased = graft.operators.Sampling.curriculum(survivors, 0.5, 30, "doc_id", "text")
      val n = phased.join(survivors.select(col("doc_id"), col("n_tokens")), "doc_id")
        .groupBy("phase")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          round(avg(col("quality_score")), 4).as("mean_quality")).count()
      screened.unpersist(); survivors.unpersist()
      n
    }
    t("pipe2-persist") { persisted() }
    t("pipe2-persist2") { persisted() }
    spark.stop()
  }
}
