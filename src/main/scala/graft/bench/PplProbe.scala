package graft.bench

import org.apache.spark.sql.SparkSession

/** Dev-only stage/job forensic for the unigram-EM / perplexity weak
  * cluster (txt_ppl2, txt_ppl4_kn, tok5, tok6 — the r18 verdict #2
  * ask): which component of each query carries the wall, and how many
  * driver jobs each schedules. The [[Cl4Probe]] pattern; findings land
  * in BENCH_NOTES. Not part of the driver contract.
  */
object PplProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = graft.sources.Tables.documents(spark, sf)
    docs.count()

    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      })
    def t(name: String)(f: => Long): Unit = {
      spark.catalog.clearCache()
      val j0 = jobs
      val s = System.nanoTime; val n = f
      println(f"[ppl] $name%-28s ${(System.nanoTime - s) / 1e9}%.2f s " +
        f"rows=$n jobs=${jobs - j0}")
    }

    val merges = graft.queries.DataPipeline.bpeMergesForProbe
    (1 to 2).foreach { i =>
      t(s"txt_ppl2 full-$i") {
        graft.operators.TextAnalysis.bigramLogProb(docs).count()
      }
      t(s"ppl2 fallback keyed-joins-$i") {
        // gate 0 forces the two-keyed-join fallback path for comparison
        graft.operators.TextAnalysis.bigramLogProb(
          docs, maxBroadcastVocab = 0L).count()
      }
      t(s"txt_ppl4_kn full-$i") {
        val (f, rel) = graft.operators.TextAnalysis.knBigramLogProbManaged(docs)
        val n = f.count(); rel(); n
      }
      t(s"ppl4 dt-stage-$i") {
        // the shared (doc, a, b, k) collapse alone — what the pair
        // flatMap + doc-keyed agg costs before any estimator work
        import org.apache.spark.sql.functions._
        val base = docs.select(col("doc_id").cast("long").as("doc_id"), col("text"))
        import spark.implicits._
        graft.operators.Dedup.spread(base).as[(Long, String)]
          .flatMap { case (id, text) =>
            val tt = graft.functions.TextHashing.tokens(text)
            val out = new Array[(Long, String, String)](math.max(tt.length - 1, 0))
            var k = 0
            while (k + 1 < tt.length) { out(k) = (id, tt(k), tt(k + 1)); k += 1 }
            out
          }
          .toDF("doc_id", "pa", "pb")
          .select(col("doc_id"), xxhash64(col("pa")).as("ha"),
            xxhash64(col("pb")).as("hb"))
          .groupBy("doc_id", "ha", "hb").agg(count(lit(1)).as("k"))
          .count()
      }
      t(s"tok5 full-$i") {
        graft.operators.TextAnalysis.unigramTokenizeEm1(docs, merges).count()
      }
      t(s"tok5 distributed-loop-$i") {
        graft.operators.TextAnalysis.unigramTokenizeEm1(docs, merges,
          smallDictMaxWords = 0).count()
      }
      t(s"tok6 full-$i") {
        graft.operators.TextAnalysis.unigramTokenizeEm(docs, merges,
          rounds = 3).count()
      }
    }
    spark.stop()
  }
}
