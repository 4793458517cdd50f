package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.TextHashing

/** Benchmark decontamination: flag training documents that share word
  * n-grams with a held-out evaluation set — the standard hygiene pass of
  * an LLM training-data pipeline (eval answers leaking into the corpus
  * inflate benchmark scores). The reference system has no analog; this
  * is part of the engine's declared training-pipeline surface
  * (SURVEY.md §2.b north-star slots).
  *
  * Scale design: the corpus side is one narrow shingle explode. The
  * eval side reduces to a DISTINCT shingle set and BROADCASTS, so the
  * hit join is map-side — the corpus is never shuffled by shingle, and
  * the output is bounded by the corpus shingle count (eval shingles are
  * distinct, so each corpus shingle matches at most once). The
  * broadcast is justified by the deployment contract: real benchmark
  * eval sets are orders of magnitude smaller than the training corpus.
  * [[overlapWith]] is that deployment API (explicit eval corpus);
  * [[overlap]] derives a hash-split from one table so the WHOLE
  * pipeline, split included, replays in the DuckDB oracle — at real
  * scale its 1/evalMod "eval" side would grow with the corpus, so it
  * is the oracle-checkable demo, not the deployment form.
  */
object Decontamination {

  /** Distinct `k`-gram shingles per doc, as a (doc_id, s) table. */
  private def shingleTable(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    Dedup.spread(docs.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        TextHashing.shingles(TextHashing.tokens(text), k).map(s => (id, s))
      }
      .toDF("doc_id", "s")
  }

  /** Deployment form: explicit (small) eval corpus vs the training
    * corpus. Per contaminated training doc: overlapping distinct grams,
    * total distinct grams, and the ratio.
    */
  def overlapWith(
      train: DataFrame,
      evalDocs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      gramSize: Int = 4): DataFrame = {
    // persist: the train shingles feed the per-doc size aggregation AND
    // the hit join (no shared exchange)
    val trainSh = shingleTable(train, idCol, textCol, gramSize)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val evalSh = shingleTable(evalDocs, idCol, textCol, gramSize)
      .select("s").distinct()
    finish(trainSh, evalSh)
  }

  /** Oracle-checkable single-table form: the eval split is selected by
    * a deterministic hash of the id (`mix32(doc_id) % evalMod == 0`),
    * so split + overlap replay exactly in the SQL mirror. One corpus
    * scan feeds both sides.
    */
  def overlap(
      documents: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      evalMod: Long = 19,
      gramSize: Int = 4): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val k = gramSize
    val isEval = pmod(IvfSearch.mix32(col(idCol)), lit(evalMod)) === 0
    val sh = Dedup.spread(documents
      .select(col(idCol).cast("long"), col(textCol), isEval.as("is_eval")))
      .as[(Long, String, Boolean)]
      .flatMap { case (id, text, ev) =>
        TextHashing.shingles(TextHashing.tokens(text), k).map(s => (id, s, ev))
      }
      .toDF("doc_id", "s", "is_eval")
      .persist(StorageLevel.MEMORY_AND_DISK)
    finish(sh.filter(!col("is_eval")), sh.filter(col("is_eval")).select("s").distinct())
  }

  /** Contaminated-id form: just the training doc_ids sharing at least
    * one `gramSize`-gram with the eval corpus — the decision the
    * cleaning pipeline actually consumes (drop the doc), without
    * [[overlapWith]]'s per-doc ratio bookkeeping.
    *
    * Scale shape: the eval shingle set is collected (it is DISTINCT
    * shingles of the small eval corpus — the same "eval is orders of
    * magnitude smaller" contract that justifies overlapWith's
    * broadcast) and broadcast as a hash set; the corpus side is then
    * ONE narrow typed pass — tokenize, slide, membership-test — with
    * no explode, no shuffle, no aggregation. Where overlapWith
    * materializes every corpus shingle to count them, this form
    * short-circuits on the first hit per document, so it is strictly
    * cheaper whenever only the drop decision is needed.
    */
  def contaminatedIds(
      train: DataFrame,
      evalDocs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      gramSize: Int = 4): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    val k = gramSize
    val evalSet = evalDocs.select(col(textCol)).as[String]
      .flatMap(t => TextHashing.shingles(TextHashing.tokens(t), k))
      .distinct().collect().toSet
    val evalB = spark.sparkContext.broadcast(evalSet)
    Dedup.spread(train.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .filter { case (_, text) =>
        TextHashing.shingles(TextHashing.tokens(text), k).exists(evalB.value)
      }
      .map(_._1)
      .toDF(idCol)
  }

  /** The reverse report: per EVAL document, how badly it leaked into
    * the training corpus — distinct leaked grams, distinct train docs
    * carrying them, total grams, leak ratio. [[overlapWith]] answers
    * "which training docs must I drop"; this answers "which benchmark
    * items are compromised" (the score-inflation audit a leaked eval
    * set needs). Only eval docs with at least one leak appear.
    *
    * Scale shape: same contract as the sibling forms — the eval
    * shingle table is small and BROADCAST into the hit join, the
    * corpus side is one narrow shingle explode, never shuffled by
    * shingle; only HIT rows (bounded by the actual overlap) reach the
    * per-eval-doc aggregation.
    */
  def evalLeakReport(
      train: DataFrame,
      evalDocs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      gramSize: Int = 4): DataFrame = {
    val trainSh = shingleTable(train, idCol, textCol, gramSize)
    val evalSh = shingleTable(evalDocs, idCol, textCol, gramSize)
      .withColumnRenamed("doc_id", "eval_id")
    val sizes = evalSh.groupBy("eval_id").agg(count(lit(1)).as("n_grams"))
    trainSh.join(broadcast(evalSh), "s")
      .groupBy("eval_id").agg(
        countDistinct(col("s")).as("n_leaked_grams"),
        countDistinct(col("doc_id")).as("n_train_docs"))
      .join(broadcast(sizes), "eval_id")
      .select(col("eval_id"), col("n_leaked_grams"), col("n_train_docs"),
        col("n_grams"),
        round(col("n_leaked_grams").cast("double") / col("n_grams"), 4)
          .as("leak_ratio"))
  }

  private def finish(trainSh: DataFrame, evalSh: DataFrame): DataFrame = {
    val hits = trainSh.join(broadcast(evalSh), "s")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    val sizes = trainSh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    hits.join(sizes, "doc_id")
      .select(col("doc_id"), col("n_hits"), col("n_shingles"),
        round(col("n_hits").cast("double") / col("n_shingles"), 4).as("overlap_ratio"))
  }
}
