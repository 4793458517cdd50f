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
    t("pipe2-full") { graft.operators.TrainingPipeline.screenAndPhase(docs).count() }
    spark.stop()
  }
}
