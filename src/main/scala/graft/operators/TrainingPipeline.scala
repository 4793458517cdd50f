package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.TextHashing

/** The composed end-to-end training-data pipeline: the chain a real
  * corpus release runs, built from the engine's own operators —
  *
  *   normalize -> quality/language filter -> near-dup pairs ->
  *   duplicate clusters (keep one per cluster) -> decontaminate vs the
  *   held-out eval slice -> train/val/test split -> sequence packing.
  *
  * Every stage is individually oracle-checked elsewhere; this operator
  * is the COMPOSITION evidence: the stages chain without plan blowup,
  * with explicit persist/reuse discipline so the corpus parquet is
  * scanned exactly once however many stages fan out from it (plan-gated
  * in PlanSpec).
  *
  * Scale shape per stage:
  *   - normalize: one narrow projection over the single corpus scan,
  *     persisted because both the eval slice and the training corpus
  *     branch read it;
  *   - filter: ONE fused typed pass computes token count, the quality
  *     score and the language-evidence flag together (tokenize once,
  *     not once per signal — the composable per-signal operators join
  *     by id, which at corpus scale would shuffle the text three
  *     times); the formulas are the same ones [[TextAnalysis.quality]]
  *     / [[TextAnalysis.languageId]] declare (parity spec-pinned on
  *     fixtures), with 4-dp rounding via the languageId floor-trick —
  *     which equals DuckDB's `round(x,4)` (the oracle the pipeline is
  *     checked against); Spark's own `round()` re-parses the shortest
  *     decimal representation and can differ by one ulp-step exactly
  *     at representation boundaries;
  *   - dedup: [[Dedup.ngramJaccard]] banded pairs ->
  *     [[Dedup.duplicateClusters]] hash-min components; losers drop by
  *     keyed anti-join (id-keyed, never all-pairs);
  *   - decontamination: [[Decontamination.overlapWith]] — eval shingles
  *     broadcast, corpus never shuffled by shingle;
  *   - split/pack: [[Sampling.hashSplit]] (narrow) +
  *     [[Sampling.packSequences]] (per-shard windows, no global sort),
  *     joined by id off the same persisted clean corpus.
  *
  * Quality/langid semantics in the fused filter: keep a document iff it
  * has at least one token, at least one function-word hit from ANY
  * language profile (exactly "predicted_lang != 'und'" in
  * [[TextAnalysis.languageId]]'s argmax terms — und means best score
  * <= 0 means zero profile hits), and composite quality score (the
  * [[TextAnalysis.quality]] formula, same 4-dp half-up rounding)
  * >= `minQuality`.
  *
  * CACHE OWNERSHIP: same contract as the sibling operators — the
  * persisted stages are not unpersisted here (the returned DataFrame
  * has no completion hook); batch harnesses clear the SQL cache
  * between queries.
  */
object TrainingPipeline {

  /** Per-stage row counts, harvested from `Dataset.observe` metric
    * accumulators — ZERO extra Spark jobs or scans (the counts ride the
    * jobs the pipeline runs anyway; a naive `stage.count()` audit would
    * re-run every stage). `nDocs`/`nEval`/`nFiltered` land while
    * [[TrainingPipeline.run]] materializes its internal stages;
    * `nDeduped`/`nClean`/`nPacked` land with the CALLER's first action
    * on the returned frame — `counts` blocks until then, so call it
    * only after acting on the result.
    */
  final class PipelineMetrics private[operators] (
      normObs: org.apache.spark.sql.Observation,
      filteredObs: org.apache.spark.sql.Observation,
      dedupedObs: org.apache.spark.sql.Observation,
      cleanObs: org.apache.spark.sql.Observation,
      packedObs: org.apache.spark.sql.Observation) {
    private def l(o: org.apache.spark.sql.Observation, k: String): Long =
      o.get(k).asInstanceOf[Long]
    /** docs in (post-normalize == input; normalize never drops). */
    def nDocs: Long = l(normObs, "n_docs")
    /** held-out eval slice size (decontamination target). */
    def nEval: Long = l(normObs, "n_eval")
    /** survivors of the fused quality/language filter. */
    def nFiltered: Long = l(filteredObs, "n_filtered")
    /** survivors after near-dup cluster keep-one. */
    def nDeduped: Long = l(dedupedObs, "n_deduped")
    /** survivors after decontamination. */
    def nClean: Long = l(cleanObs, "n_clean")
    /** packed output rows (== nClean; packing assigns, never drops). */
    def nPacked: Long = l(packedObs, "n_packed")
    /** All stage counts, in pipeline order. */
    def counts: Map[String, Long] = Map(
      "n_docs" -> nDocs, "n_eval" -> nEval, "n_filtered" -> nFiltered,
      "n_deduped" -> nDeduped, "n_clean" -> nClean, "n_packed" -> nPacked)
  }

  def run(
      documents: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      evalMod: Int = 100,
      evalBuckets: Int = 3,
      minQuality: Double = 0.2,
      budget: Int = 2048,
      shards: Int = 32): DataFrame =
    runObserved(documents, idCol, textCol, evalMod, evalBuckets,
      minQuality, budget, shards)._1

  /** [[run]] plus per-stage observability (the release-audit surface:
    * how many docs each cleaning stage dropped). Metrics are
    * `Dataset.observe` accumulator folds on the stage frames the
    * pipeline builds anyway — no extra action, scan or job (job-audit
    * spec-pinned); observed nodes sit below the stage persists, so each
    * fires exactly once, when its stage first materializes. Fresh
    * auto-named `Observation`s per call keep concurrent pipelines in
    * one session from colliding.
    */
  def runObserved(
      documents: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      evalMod: Int = 100,
      evalBuckets: Int = 3,
      minQuality: Double = 0.2,
      budget: Int = 2048,
      shards: Int = 32): (DataFrame, PipelineMetrics) = {
    val spark = documents.sparkSession
    import spark.implicits._
    val normObs = org.apache.spark.sql.Observation()
    val filteredObs = org.apache.spark.sql.Observation()
    val dedupedObs = org.apache.spark.sql.Observation()
    val cleanObs = org.apache.spark.sql.Observation()
    val packedObs = org.apache.spark.sql.Observation()

    // 1. normalize — all later tokenization splits on single spaces,
    // which is exactly what the cleaning pass guarantees. The observe
    // rides the same node both branches (eval slice + corpus) read;
    // n_eval folds the branch predicate into the one pass.
    val norm = Dedup.spread(documents.select(
      col(idCol).cast("long").as("doc_id"),
      TextAnalysis.normalizedText(col(textCol)).as("text")))
      .observe(normObs,
        count(lit(1)).as("n_docs"),
        count(when(pmod(col("doc_id"), lit(evalMod.toLong)) < evalBuckets, 1))
          .as("n_eval"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // the eval slice is held OUT of the released corpus and used only
    // as the decontamination target (id-hash split, deterministic)
    val isEval = pmod(col("doc_id"), lit(evalMod.toLong)) < evalBuckets
    val evalDocs = norm.filter(isEval)
    val corpus = norm.filter(!isEval)

    // 2. fused quality + language filter (one tokenization per doc)
    val stopSet = TextAnalysis.Stopwords.toSet
    val langSet = TextAnalysis.LangProfiles.flatMap(_._2).toSet
    val minQ = minQuality
    val filtered = corpus.as[(Long, String)]
      .map { case (id, text) =>
        val toks = TextHashing.tokens(text)
        val n = toks.length
        var stops = 0
        var langHits = 0
        toks.foreach { t =>
          if (stopSet(t)) stops += 1
          if (langSet(t)) langHits += 1
        }
        // shared round4 so this fused score can never diverge from the
        // composed TextAnalysis.quality()>=minQuality path at boundaries
        val score =
          if (n == 0) 0.0
          else TextHashing.round4(stops.toDouble / n * 0.5 +
            math.min(n, 100).toDouble / 100.0 * 0.5)
        (id, text, n > 0 && langHits > 0 && score >= minQ)
      }
      .toDF("doc_id", "text", "keep")
      .filter(col("keep")).select("doc_id", "text")
      .observe(filteredObs, count(lit(1)).as("n_filtered"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // 3. near-dup pairs -> connected components -> keep the cluster
    // representative (min id); losers drop via keyed anti-join
    val pairs = Dedup.ngramJaccard(filtered)
    val losers = Dedup.duplicateClusters(pairs)
      .filter(col("doc_id") =!= col("cluster")).select("doc_id")
    // the deduped observe node appears TWICE in the final query (once
    // under the decontamination probe, once on the kept side) — exact
    // duplicate CollectMetrics subtrees are legal and both fold the
    // full frame, so the count is well-defined either way
    val deduped = filtered.join(losers, Seq("doc_id"), "left_anti")
      .observe(dedupedObs, count(lit(1)).as("n_deduped"))

    // 4. decontaminate: any 4-gram shared with the eval slice drops the doc
    val contaminated = Decontamination.overlapWith(deduped, evalDocs)
      .select("doc_id")
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
      .observe(cleanObs, count(lit(1)).as("n_clean"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // 5. split + 6. pack, both off the same persisted clean corpus
    val splits = Sampling.hashSplit(clean).select(col("doc_id"), col("split"))
    val packed = Sampling.packSequences(clean, budget = budget, shards = shards)
    val out = packed.join(splits, "doc_id")
      .select(col("doc_id"), col("split"), col("shard"), col("bin"),
        col("off"), col("n_tokens"))
      .observe(packedObs, count(lit(1)).as("n_packed"))
    (out, new PipelineMetrics(normObs, filteredObs, dedupedObs, cleanObs, packedObs))
  }

  /** The physical layout a release write uses: one keyed exchange
    * co-locating each shard (the `shard` column is [[Sampling
    * .packSequences]]'s stable `mix32(id) % shards` assignment, so the
    * layout is reproducible across runs, re-partitioning and appends),
    * then a partition-local sort on (split, shard, id). The sort leads
    * with the partition columns so `partitionBy`'s writer sees its
    * required ordering already satisfied — no second sort, no
    * spilled-writer fallback — and the id tiebreak makes every file's
    * row order deterministic. Exactly ONE exchange, no range exchange
    * (a global ORDER BY here would range-partition the corpus for no
    * layout benefit).
    */
  def releaseLayout(release: DataFrame, idCol: String = "doc_id"): DataFrame = {
    require(release.columns.contains("split") && release.columns.contains("shard"),
      s"release layout needs split+shard columns, got ${release.columns.mkString(",")}")
    release
      .repartition(col("shard"))
      .sortWithinPartitions(col("split"), col("shard"), col(idCol))
  }

  /** Write a corpus release as deterministic sharded parquet:
    * `path/split=…/shard=…/` directories, one file per (split, shard)
    * (each shard lands in one task), rows id-sorted within every file.
    * Byte-stable layout given the same input — the property a dataset
    * release needs for diffing, resumable consumption and content
    * addressing. Read back with `spark.read.parquet(path)`; the
    * partition columns return as directory keys.
    */
  def writeRelease(release: DataFrame, path: String, idCol: String = "doc_id"): Unit =
    releaseLayout(release, idCol)
      .write.mode("overwrite").partitionBy("split", "shard").parquet(path)
}
