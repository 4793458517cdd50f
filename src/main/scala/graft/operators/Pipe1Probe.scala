package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-stage wall times for the composed training pipeline
  * at a given SF dir — the profiling surface behind pipe1 bench work.
  * Stages replay [[TrainingPipeline.runObserved]]'s CURRENT shape —
  * fused prep (normalize + eval flag + quality/langid keep in one typed
  * pass), broadcast-set decontamination via the guarded
  * [[Decontamination.decontaminate]] keep-side form, and the in-place
  * [[Sampling.splitLabel]] — so per-stage deltas attribute cost to the
  * stages the pipeline actually runs. Each stage is forced through a
  * count; stages persist exactly where the pipeline persists. Not part
  * of the driver contract.
  */
object Pipe1Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("pipe1-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val documents = graft.sources.Tables.documents(spark, sfDir)
    // stage 1+2: the pipeline's fused prep — normalize (Scala twin),
    // eval flag, tokenize-once quality/langid keep — one typed pass
    val prep = time("fused prep+persist") {
      val stopSet = TextAnalysis.Stopwords.toSet
      val langSet = TextAnalysis.LangProfiles.flatMap(_._2).toSet
      val p = Dedup.spread(documents.select(
        col("doc_id").cast("long").as("doc_id"), col("text")))
        .as[(Long, String)]
        .map { case (id, raw) =>
          val text = graft.functions.TextHashing.normalize(raw)
          val isEval = (id % 100 + 100) % 100 < 3
          val toks = graft.functions.TextHashing.tokens(text)
          val n = toks.length
          var stops = 0; var langHits = 0
          toks.foreach { t => if (stopSet(t)) stops += 1; if (langSet(t)) langHits += 1 }
          val score = if (n == 0) 0.0
            else graft.functions.TextHashing.round4(
              stops.toDouble / n * 0.5 + math.min(n, 100).toDouble / 100.0 * 0.5)
          (id, text, isEval, n > 0 && langHits > 0 && score >= 0.2)
        }.toDF("doc_id", "text", "is_eval", "keep").persist()
      p.count(); p
    }
    val evalDocs = prep.filter(col("is_eval")).select("doc_id", "text")
    val filtered = time("training filter+persist") {
      val f = prep.filter(!col("is_eval") && col("keep"))
        .select("doc_id", "text").persist()
      f.count(); f
    }
    val pairs = time("ngramJaccard pairs (count)") {
      val p = Dedup.ngramJaccard(filtered).persist()
      println(s"[probe]   n_pairs = ${p.count()}")
      p
    }
    val losers = time("duplicateClusters") {
      Dedup.duplicateClusters(pairs)
        .filter(col("doc_id") =!= col("cluster")).select("doc_id")
    }
    val deduped = time("anti-join deduped (count)") {
      val d = filtered.join(losers, Seq("doc_id"), "left_anti").persist()
      d.count(); d
    }
    // stage 4: the pipeline's guarded keep-side decontamination (the
    // broadcast-set narrow pass under the cap, sketch fallback over it)
    val clean = time("decontaminate keep (count)") {
      val c = Decontamination.decontaminate(deduped, evalDocs).persist()
      c.count(); c
    }
    // stage 5+6: pack + in-place split label, exactly the output shape
    time("pack+split-in-place (count)") {
      Sampling.packSequences(clean, budget = 2048, shards = 32)
        .withColumn("split", Sampling.splitLabel(col("doc_id")))
        .count()
    }
    time("full pipe1 fresh (cache cleared)") {
      spark.catalog.clearCache()
      TrainingPipeline.run(documents).count()
    }
    spark.stop()
  }
}
