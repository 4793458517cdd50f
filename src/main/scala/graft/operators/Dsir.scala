package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distribution-matched data selection — the DSIR shape (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling", public literature): pick the raw-corpus documents
  * whose hashed n-gram feature distribution looks most like a target
  * domain, by scoring each document with the log importance ratio of
  * a target unigram model over the raw-corpus unigram model.
  *
  * The reference system (delftdata/stateflow) has no analytics
  * surface; this extends the engine's training-data-pipeline family
  * (SURVEY.md §2.b north-star slots) alongside the trained quality
  * filter ([[TextAnalysis.trainQualityWeights]]) — DSIR is the
  * distribution-matching complement to a discriminative quality
  * screen, and the two share the exact same hashed feature map
  * (bucket = poly32(token, 97) % dim), so a pipeline computes the
  * incidence frame once for both.
  *
  * Determinism: no sampling noise — the published method resamples
  * with Gumbel noise; this implementation takes the deterministic
  * top-N by rounded score (score ties broken by id), which is the
  * reproducible-release variant and what makes the operator
  * oracle-mirrorable. Smoothed bucket probabilities use add-alpha
  * with the NATURAL log; the per-bucket log-ratio is rounded at 6 dp
  * and the per-doc score at 4 dp (the [[TextAnalysis.round6]] /
  * [[graft.functions.TextHashing.round4]] floor-trick discipline), so
  * both engines rank identical values and the top-N cut cannot drift
  * on an ulp.
  *
  * Scale shape (the 100-TB plan): ONE narrow tokenize pass builds the
  * (doc, bucket, k) incidence frame — vocabulary-bounded per doc —
  * persisted PRE-PARTITIONED on doc_id; the bucket model is one
  * dim-bounded exchange (map-side partial sums, dim rows out)
  * collected to a dim-sized driver array; scoring is a broadcast join
  * against the dim-sized log-ratio table plus an exchange-free
  * doc-keyed agg (the incidence partitioning is reused); selection is
  * orderBy(...).limit(topN) — TakeOrderedAndProject, per-partition
  * heaps + a topN-sized driver merge, never a global sort.
  */
object Dsir {

  /** Score every document against a target domain and keep the top N.
    *
    * @param documents corpus with `idCol` and `textCol`
    * @param isTarget  boolean Column over `documents`' columns marking
    *                  the target-domain rows (e.g. `col("lang") === "en"`
    *                  or a labeled seed set joined in upstream)
    * @param dim       hashed feature buckets (poly32(token, 97) % dim —
    *                  [[TextAnalysis.linearQualityScore]]'s map)
    * @param alpha     add-alpha smoothing for both unigram models
    * @param topN      documents to keep
    * @return topN rows (doc_id, score), score = rounded log importance
    *         ratio, ordered score DESC then doc_id. Null-text documents
    *         are dropped, and documents with no tokens (empty/whitespace
    *         text) have no incidence rows and are therefore ABSENT from
    *         the ranking — a caller selecting "topN of corpus" should
    *         screen empties upstream if it needs every doc scored.
    */
  def importanceResample(
      documents: DataFrame,
      isTarget: Column,
      dim: Int = 1024,
      alpha: Double = 1.0,
      topN: Int = 200,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(dim > 0 && alpha > 0 && topN > 0,
      s"invalid dim=$dim alpha=$alpha topN=$topN")
    val spark = documents.sparkSession
    import spark.implicits._
    val d = dim
    val inc = Dedup.spread(documents
        .filter(col(textCol).isNotNull)
        .select(col(idCol).cast("long"), col(textCol), isTarget.cast("boolean")))
      .as[(Long, String, Boolean)]
      .flatMap { case (id, text, target) =>
        val toks = graft.functions.TextHashing.tokens(text)
        if (toks.isEmpty) Iterator.empty
        else {
          val counts = new scala.collection.mutable.HashMap[Int, Long]
          toks.foreach { t =>
            val b = (graft.functions.TextHashing.poly32(t, 97L) % d).toInt
            counts.update(b, counts.getOrElse(b, 0L) + 1L)
          }
          counts.iterator.map { case (b, k) => (id, b, k, target) }
        }
      }
      .toDF("doc_id", "bucket", "k", "target")
      .repartition(col("doc_id"))
      // persist, NOT unpersisted here: the incidence frame feeds the
      // bucket-model collect below AND the returned lazy scoring plan —
      // releasing it before the caller executes would re-run the
      // tokenize pass (the shared-signature-stage convention, see
      // Dedup's header note)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Bucket-level unigram counts for both models: one dim-bounded
    // exchange, then a dim-sized driver pass builds the log-ratio
    // table. Totals are exact BIGINT sums of the same rows, so both
    // engines smooth identical integers.
    val stats = inc.groupBy("bucket")
      .agg(sum(when(col("target"), col("k")).otherwise(0L)).as("nt"),
        sum(col("k")).as("nq"))
      .collect()
    var tt = 0L
    var tq = 0L
    stats.foreach { r => tt += r.getLong(1); tq += r.getLong(2) }
    val lam = stats.map { r =>
      val nt = r.getLong(1)
      val nq = r.getLong(2)
      (r.getInt(0),
        TextAnalysis.round6(
          math.log((nt + alpha) / (tt + alpha * d)) -
            math.log((nq + alpha) / (tq + alpha * d))))
    }.toSeq
    // local Seq -> LocalRelation: plan-only, broadcast straight off the
    // driver (parallelize built an RDD whose scan cost one job per action)
    val lamDf = lam.toDF("bucket", "lambda")
    // round6-then-round4: the k*lambda TERMS are identical doubles in
    // every engine (lambda is round6, k integer) but the SUM's fold
    // order is not — the 6-dp pre-round absorbs that ulp drift before
    // the 4-dp emit can flip on a .00005 boundary (the sf0.001 ds1
    // lesson; same two-step as Clustering's dist)
    val scored = inc.join(broadcast(lamDf), "bucket")
      .groupBy("doc_id")
      .agg(graft.functions.GraftFunctions.round4(
        graft.functions.GraftFunctions.round6(
          sum(col("k") * col("lambda")))).as("score"))
    scored.orderBy(col("score").desc, col("doc_id")).limit(topN)
  }
}
