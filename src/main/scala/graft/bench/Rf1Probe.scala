package graft.bench

import org.apache.spark.sql.{functions => F, SparkSession}

/** Dev-only stage profiler for rf1 (corpus refresh) — which of the
  * four stages carries the 1.6-1.8 s at sf0.1. Not part of the driver
  * contract; BENCH_NOTES forensics.
  */
object Rf1Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(F.col("doc_id"), F.col("text"))
    val released = docs.filter(F.pmod(F.col("doc_id"), F.lit(5)) =!= 0)
    val clones = docs.filter(F.pmod(F.col("doc_id"), F.lit(30)) === 0)
      .select((F.col("doc_id") + 2000000L).as("doc_id"), F.col("text"))
    val batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) === 0).unionByName(clones)
    val evalDocs = docs.filter(F.pmod(F.col("doc_id"), F.lit(100)) < 3)
    def t(name: String)(f: => Long): Unit = {
      spark.catalog.clearCache()
      val s = System.nanoTime; val n = f
      println(f"[rf1] $name%-22s ${(System.nanoTime - s) / 1e9}%.2f s rows=$n")
    }
    docs.count()
    (1 to 2).foreach { i =>
      t(s"full-$i") { graft.operators.TrainingPipeline
        .refresh(released, batch, evalDocs).count() }
    }
    t("sketch-build") {
      graft.operators.Dedup.contentSketch(released, "text", 0.01).length.toLong
    }
    val sketch = graft.operators.Dedup.contentSketch(released, "text", 0.01)
    t("full-prebuilt-sketch") { graft.operators.TrainingPipeline
      .refresh(released, batch, evalDocs, corpusSketch = Some(sketch)).count() }
    t("prepare-eval") {
      graft.operators.Decontamination.prepareEval(evalDocs); 1L
    }
    t("prepare-eval-2") {
      graft.operators.Decontamination.prepareEval(evalDocs); 1L
    }
    val prep = graft.operators.Decontamination.prepareEval(evalDocs)
    t("full-prebuilt-both") { graft.operators.TrainingPipeline
      .refresh(released, batch, evalDocs, corpusSketch = Some(sketch),
        preparedEval = Some(prep)).count() }
    spark.stop()
  }
}
