package graft

import java.security.MessageDigest

/** In-suite determinism tripwire: a representative sample of the
  * declared queries (one per family whose engine path carries a
  * nondeterminism hazard — typed-map passes, driver-collected models,
  * banded joins, window ranks, persisted stages) runs TWICE in the
  * same session and must produce byte-identical canonical results.
  * The full 100%-coverage double-Verify audit stays a per-round dev
  * step (see scripts/check.py workflow); this spec makes the most
  * hazard-prone slice of it a permanent part of `sbt test`, so a
  * future change that introduces ordering or accumulation drift fails
  * CI instead of surfacing at the driver gate.
  */
class DeterminismSampleSpec extends SparkSpec {

  private val sample = Seq(
    "dd2_minhash_lsh",      // banded self-join + persisted signature stage
    "cl1_kmeans",           // driver-collected Lloyd trajectory
    "tr1_train_weights",    // distributed GD with rounded collect per iter
    "tok1_bpe_tokenize",    // per-partition memoized typed pass
    "rf1_corpus_refresh",   // treeAggregate sketch + anti/semi joins
    "sp10_epoch_upsample",  // generator fan-out
    "ann_ivf_topk",         // sample-fit centroids + probe join
    "rl3_length_quantiles") // group-buffered exact percentiles

  private def canon(df: org.apache.spark.sql.DataFrame): String = {
    val cols = df.columns.sorted
    val rows = df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString(""))
      .sorted
    MessageDigest.getInstance("SHA-256")
      .digest(rows.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  test("hazard-prone query sample is byte-deterministic across re-runs") {
    sample.foreach { name =>
      val fn = SparkEntry.queries(name)
      spark.catalog.clearCache()
      val a = canon(fn(spark, sf))
      spark.catalog.clearCache()
      val b = canon(fn(spark, sf))
      assert(a === b, s"$name drifted between identical runs")
    }
  }
}
