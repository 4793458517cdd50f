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
  * Scale design: the corpus side is one narrow shingle explode; the eval
  * side (benchmark sets are tiny by construction) reduces to a DISTINCT
  * shingle set and BROADCASTS, so the hit join is map-side — the corpus
  * is never shuffled by shingle and there is no skew surface (the
  * output is bounded by the corpus shingle count: eval shingles are
  * distinct, so each corpus shingle matches at most once). The exploded
  * corpus feeds the eval-set filter, the per-doc size aggregation, and
  * the hit join — three consumers, hence the persist (same pattern as
  * the Dedup signature stages).
  */
object Decontamination {

  /** Per contaminated training doc: the number of its distinct
    * `gramSize`-grams that appear anywhere in the eval split, its total
    * distinct grams, and the ratio. The eval split is selected by a
    * deterministic hash of the id (`mix32(doc_id) % evalMod == 0`) so
    * the whole pipeline — split included — replays in the SQL oracle;
    * a real deployment passes an explicit eval corpus instead, same
    * shapes.
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
    val evalSh = sh.filter(col("is_eval")).select("s").distinct()
    val trainSh = sh.filter(!col("is_eval"))
    val hits = trainSh.join(broadcast(evalSh), "s")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    val sizes = trainSh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    hits.join(sizes, "doc_id")
      .select(col("doc_id"), col("n_hits"), col("n_shingles"),
        round(col("n_hits").cast("double") / col("n_shingles"), 4).as("overlap_ratio"))
      .orderBy("doc_id")
  }
}
