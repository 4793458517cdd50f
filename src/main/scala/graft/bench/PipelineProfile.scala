// lives in the operators package to reuse the pipeline's private
// constants (Stopwords/LangProfiles) without widening their visibility
package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level wall-clock breakdown of the composed pipeline (pipe1):
  * runs the same fixture query Bench does, but forces each stage with
  * its own action and prints per-stage seconds — the tool for deciding
  * WHICH constant to shave (CC rounds vs jaccard vs decon vs pack).
  * Diagnostic only; not part of the driver contract.
  */
object PipelineProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val base = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val aug = base.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(5)) === 0,
        concat(lit(" \t"), upper(col("text")), lit("\n\ntail\r\t  END ")))
        .otherwise(col("text")).as("text"))
    val planted = Seq(
      (1000003L, graft.queries.DataPipeline.PipeBase),
      (1000004L, graft.queries.DataPipeline.PipeUpper),
      (1000005L, graft.queries.DataPipeline.PipeDirty)).toDF("doc_id", "text")
    val documents = aug.unionByName(planted)

    import org.apache.spark.storage.StorageLevel

    val norm = timed("normalize (materialize)") {
      val n = Dedup.spread(documents.select(col("doc_id"),
        TextAnalysis.normalizedText(col("text")).as("text")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      n.write.format("noop").mode("overwrite").save(); n
    }
    val isEval = pmod(col("doc_id"), lit(100L)) < 3
    val evalDocs = norm.filter(isEval)
    val corpus = norm.filter(!isEval)

    val filtered = timed("fused filter (materialize)") {
      val stopSet = TextAnalysis.Stopwords.toSet
      val langSet = TextAnalysis.LangProfiles.flatMap(_._2).toSet
      val f = corpus.as[(Long, String)].map { case (id, text) =>
        val toks = graft.functions.TextHashing.tokens(text)
        val n = toks.length
        var stops = 0; var langHits = 0
        toks.foreach { t =>
          if (stopSet(t)) stops += 1
          if (langSet(t)) langHits += 1
        }
        val score = if (n == 0) 0.0
          else graft.functions.TextHashing.round4(stops.toDouble / n * 0.5 +
            math.min(n, 100).toDouble / 100.0 * 0.5)
        (id, text, n > 0 && langHits > 0 && score >= 0.2)
      }.toDF("doc_id", "text", "keep")
        .filter(col("keep")).select("doc_id", "text")
        .persist(StorageLevel.MEMORY_AND_DISK)
      f.write.format("noop").mode("overwrite").save(); f
    }
    val pairs = timed("ngramJaccard (materialize)") {
      val p = Dedup.ngramJaccard(filtered).persist(StorageLevel.MEMORY_AND_DISK)
      p.write.format("noop").mode("overwrite").save(); p
    }
    val losers = timed("duplicateClusters (CC loop)") {
      Dedup.duplicateClusters(pairs)
        .filter(col("doc_id") =!= col("cluster")).select("doc_id")
    }
    val deduped = filtered.join(losers, Seq("doc_id"), "left_anti")
    val clean = timed("decontaminate (materialize)") {
      val contaminated = Decontamination.overlapWith(deduped, evalDocs).select("doc_id")
      val c = deduped.join(contaminated, Seq("doc_id"), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
      c.write.format("noop").mode("overwrite").save(); c
    }
    timed("split + pack + join (final)") {
      val splits = Sampling.hashSplit(clean).select(col("doc_id"), col("split"))
      val packed = Sampling.packSequences(clean, budget = 2048, shards = 32)
      packed.join(splits, "doc_id")
        .select(col("doc_id"), col("split"), col("shard"), col("bin"),
          col("off"), col("n_tokens"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
