package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Focused micro-bench for the quality-classifier training paths:
  * iterative (one job chain per GD step) vs batched (Gram statistics
  * collected once, steps driver-side). Prints one JSON line per
  * (path, iters) with wall seconds — the evidence that iterative
  * wall-time is linear in iters (job constants) while batched is flat.
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.bench.TrainBench'
  */
object TrainBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val labeled = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .withColumn("label", (col("doc_id") % 3 === 0).cast("double"))
      .persist()
    labeled.count()
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // warmup both paths (JIT + codegen)
    TextAnalysis.trainQualityWeights(labeled, iters = 1).collect()
    TextAnalysis.trainQualityWeightsBatched(labeled, iters = 1).collect()
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    Seq(2, 8, 32).foreach { k =>
      val ti = time(TextAnalysis.trainQualityWeights(labeled, iters = k).collect(): Unit)
      val tb = time(TextAnalysis.trainQualityWeightsBatched(labeled, iters = k).collect(): Unit)
      println(s"""{"bench":"train_quality","iters":$k,"iterative_sec":${fmt(ti)},"batched_sec":${fmt(tb)}}""")
    }
    spark.stop()
  }
}
