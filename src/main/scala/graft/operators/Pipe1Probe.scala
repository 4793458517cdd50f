package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: per-stage wall times for the composed training pipeline
  * at a given SF dir — the profiling surface behind pipe1 bench work.
  * Each stage is timed by forcing it through the noop count; stages are
  * cumulative (stage N includes N-1's plan) so the DELTA column is the
  * stage's own cost. Not part of the driver contract.
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
    // mirror TrainingPipeline.runObserved stage by stage
    val norm = time("normalize+persist") {
      val n = Dedup.spread(documents.select(
        col("doc_id").cast("long").as("doc_id"),
        TextAnalysis.normalizedText(col("text")).as("text")))
        .persist()
      n.count(); n
    }
    val isEval = pmod(col("doc_id"), lit(100L)) < 3
    val evalDocs = norm.filter(isEval)
    val corpus = norm.filter(!isEval)
    val filtered = time("fused filter+persist") {
      val stopSet = TextAnalysis.Stopwords.toSet
      val langSet = TextAnalysis.LangProfiles.flatMap(_._2).toSet
      val f = corpus.as[(Long, String)].map { case (id, text) =>
        val toks = graft.functions.TextHashing.tokens(text)
        val n = toks.length
        var stops = 0; var langHits = 0
        toks.foreach { t => if (stopSet(t)) stops += 1; if (langSet(t)) langHits += 1 }
        val score = if (n == 0) 0.0
          else graft.functions.TextHashing.round4(
            stops.toDouble / n * 0.5 + math.min(n, 100).toDouble / 100.0 * 0.5)
        (id, text, n > 0 && langHits > 0 && score >= 0.2)
      }.toDF("doc_id", "text", "keep").filter(col("keep")).select("doc_id", "text")
        .persist()
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
    val contaminated = time("decontaminate (count)") {
      val c = Decontamination.overlapWith(deduped, evalDocs).select("doc_id").persist()
      c.count(); c
    }
    val clean = time("clean anti-join+persist") {
      val c = deduped.join(contaminated, Seq("doc_id"), "left_anti").persist()
      c.count(); c
    }
    time("split+pack+join (count)") {
      val splits = Sampling.hashSplit(clean).select(col("doc_id"), col("split"))
      val packed = Sampling.packSequences(clean, budget = 2048, shards = 32)
      packed.join(splits, "doc_id").count()
    }
    time("full pipe1 fresh (cache cleared)") {
      spark.catalog.clearCache()
      TrainingPipeline.run(documents).count()
    }
    spark.stop()
  }
}
