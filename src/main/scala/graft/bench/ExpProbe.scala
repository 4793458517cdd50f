package graft.bench

import org.apache.spark.sql.SparkSession

/** Dev-only scratch A/B probe for optimization experiments. */
object ExpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val pf = sys.env.getOrElse("EXP_PF", "true") // parallelismFirst
    val spark = SparkSession.builder()
      .appName("exp-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", pf)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val names = Seq("ir1_bm25_topk", "dd16_containment", "txt_tfidf", "dc6_mink_prob",
      "q1_agg", "dd2_minhash_lsh", "cl1_kmeans", "txt_ppl4_kn", "pipe3_curation_report",
      "tok4_unigram", "dd3_ngram_jaccard", "ev1_sessionize")
    var tot = 0.0
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val ts = (1 to 4).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      tot += ts.min
      println(f"[exp] pf=$pf $n%-26s min ${ts.min}%6.3f  runs ${ts.map(t => f"$t%.2f").mkString("[", ",", "]")}")
    }
    println(f"[exp] pf=$pf TOTAL(min) $tot%.2f s")
    spark.stop()
  }
}
