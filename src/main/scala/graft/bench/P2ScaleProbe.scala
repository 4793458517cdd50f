package graft.bench

import org.apache.spark.sql.{functions => F, DataFrame, SparkSession}

/** Dev-only stage profiler for the pipe2 SCALE outlier (18.6x at 100x
  * data in SCALE.json round 15): times each screenAndPhase stage
  * STANDALONE on the soak's own synthetic corpus at x1/x10/x100 so the
  * super-scaling term has a name. Not part of the driver contract;
  * evidence feeds BENCH_NOTES.
  */
object P2ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft-p2scale").toString
    val scales = Seq("x1" -> 5000L, "x10" -> 50000L, "x100" -> 500000L)
    scales.foreach { case (tag, n) =>
      ScaleSoak.synthDocs(spark, n).repartition(32)
        .write.mode("overwrite").parquet(s"$base/$tag/documents.parquet")
    }
    def docs(tag: String) = spark.read.parquet(s"$base/$tag/documents.parquet")

    def t(tag: String, name: String)(f: => Long): Double = {
      spark.catalog.clearCache()
      val s = System.nanoTime; val n = f
      val sec = (System.nanoTime - s) / 1e9
      println(f"[p2scale] $tag%-5s $name%-14s $sec%7.2f s rows=$n")
      sec
    }

    scales.foreach { case (tag, _) =>
      val d = docs(tag)
      d.count() // warm the scan
      t(tag, "clf") {
        graft.operators.TextAnalysis.linearQualityScore(d, threshold = -0.2)
          .filter(F.col("keep")).count()
      }
      // screened as pipe2 builds it (semi-join vs the clf keep set)
      def screened: DataFrame = {
        val keep = graft.operators.TextAnalysis
          .linearQualityScore(d, threshold = -0.2)
          .filter(F.col("keep")).select(F.col("doc_id"))
        d.select(F.col("doc_id").cast("long").as("doc_id"), F.col("text"))
          .join(keep, Seq("doc_id"), "left_semi")
      }
      t(tag, "screen-join") { screened.count() }
      t(tag, "span") {
        graft.operators.Dedup.spanDupFraction(screened, maxDupFrac = 0.3)
          .filter(!F.col("drop")).count()
      }
      t(tag, "curriculum") {
        graft.operators.Sampling.curriculum(
          d.select(F.col("doc_id").cast("long").as("doc_id"), F.col("text"))).count()
      }
      t(tag, "pipe2-full") {
        graft.operators.TrainingPipeline.screenAndPhase(d).count()
      }
    }
    spark.stop()
  }
}
