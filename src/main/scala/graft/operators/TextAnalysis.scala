package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Dedup.tokens

/** Text-analysis operators for training-data pipelines: quality scoring,
  * token counting, document fingerprinting, language identification.
  * All are row-local (narrow) transformations — they scale embarrassingly
  * and keep the parquet scan as the only I/O.
  */
object TextAnalysis {

  private val Stopwords = Seq("the", "a", "of", "and", "in", "to", "is")

  /** Quality signals: length ratios, stopword ratio, a bounded composite
    * score. Pure integer/rational arithmetic so an SQL oracle matches
    * exactly.
    */
  def quality(documents: DataFrame): DataFrame = {
    val words = tokens(col("text"))
    documents.select(
      col("doc_id"),
      col("n_chars"),
      size(words).as("n_words"),
      round(col("n_chars").cast("double") / size(words), 4).as("chars_per_word"),
      round(aggregate(words, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(words), 4)
        .as("avg_word_len"),
      size(filter(words, w => w.isin(Stopwords: _*))).as("n_stop"),
      round(size(filter(words, w => w.isin(Stopwords: _*))).cast("double") / size(words), 4)
        .as("stop_ratio"),
      round(
        size(filter(words, w => w.isin(Stopwords: _*))).cast("double") / size(words) * 0.5
          + least(size(words), lit(100)).cast("double") / 100 * 0.5, 4)
        .as("quality_score"))
      .orderBy("doc_id")
  }

  /** Token counting: whitespace tokens and a BPE-ish regex segmentation
    * (letter runs / digit runs / single other chars).
    */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      size(tokens(col("text"))).as("ws_tokens"),
      regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("int").as("bpe_tokens"),
      round(col("n_chars").cast("double")
        / regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")), 4)
        .as("chars_per_token"))
      .orderBy("doc_id")

  /** Rolling-hash document fingerprint (Rabin-Karp style fold over the
    * word stream, mod 1e9+7). Word atoms use only length+first-char so
    * the identical fold is expressible in ANSI SQL for the oracle; the
    * modulus keeps every intermediate < 2^40 (ANSI-overflow-safe).
    */
  def fingerprint(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      aggregate(tokens(col("text")), lit(0L),
        (acc, w) => pmod(acc * 131L + length(w) * 31L + ascii(w), lit(1000000007L)))
        .as("fp"))
      .orderBy("doc_id")

  /** tf-idf over whitespace tokens: one row per (doc, term) with the raw
    * term frequency, document frequency, and tf * ln(N/df) (rounded for
    * cross-engine float parity). Scale shape: one explode + two hash
    * aggregations + an equi-join on the term — the df table is
    * vocabulary-sized and shuffles by term (no hot key: a term's df row
    * is one row however common the term); N is a broadcast scalar.
    * Downstream vectorization is a per-doc collect_list over this table.
    */
  def tfIdf(documents: DataFrame): DataFrame = {
    val tok = documents.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = documents.agg(count(lit(1)).as("n"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tf") * log(col("n") / col("df")), 4).as("tfidf"))
      .orderBy("doc_id", "term")
  }

  /** Within-document repetition (a standard LLM-corpus quality signal:
    * high duplicate-n-gram ratios mark boilerplate/spam/generation
    * loops): total vs distinct word-3-grams and the duplicate ratio.
    * Row-local column expressions only — the n-gram build is a
    * per-row HOF over the token array (bounded work per row, no
    * explode, no shuffle), so the operator stays a narrow pass.
    */
  def repetition(documents: DataFrame): DataFrame = {
    val ws = tokens(col("text"))
    // guard: sequence(0, n) is bidirectional in Spark — a doc under 3
    // tokens would produce a DESCENDING sequence, not an empty one
    val grams = when(size(ws) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(ws) - lit(3)),
        i => concat_ws(" ",
          element_at(ws, i + 1), element_at(ws, i + 2), element_at(ws, i + 3))))
    documents.select(
      col("doc_id"),
      size(grams).as("n_grams"),
      size(array_distinct(grams)).as("n_distinct"),
      when(size(grams) > 0,
        round(lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams), 4))
        .otherwise(lit(0.0)).as("rep_ratio"))
      .orderBy("doc_id")
  }

  /** Vocabulary building: global top-K terms by document frequency
    * (occurrence count carried along) — the corpus-statistics precursor
    * to tokenizer training / stopword induction. Scale shape: one
    * explode + hash aggregation by term (a term's stats are ONE row
    * however common the term — no hot key), then a global top-K that
    * plans as TakeOrderedAndProject (per-partition top-K + driver
    * merge), never a full sort. Deterministic tiebreak by term.
    */
  def vocabulary(documents: DataFrame, topK: Int = 1000): DataFrame =
    documents.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("n_occurrences"), countDistinct("doc_id").as("df"))
      .orderBy(col("df").desc, col("term"))
      .limit(topK)

  /** Function-word profiles for [[languageId]] — public so the oracle SQL
    * is generated from the same table (no drift between engine and check).
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "a"),
    "de" -> Seq("der", "und", "die", "ist", "das", "ein"),
    "es" -> Seq("el", "la", "de", "que", "es", "un"),
    "fr" -> Seq("le", "la", "et", "est", "un", "une"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "you3", "wo3"))

  /** Language-ID heuristic: score each candidate language by its
    * function-word hit rate in the token stream and take the argmax
    * (deterministic tiebreak by profile order). Pure rational arithmetic
    * over column expressions, so the identical computation is
    * SQL-expressible for the oracle; a real system would swap in full
    * character n-gram profiles, same operator shape.
    */
  def languageId(documents: DataFrame): DataFrame = {
    val ws = tokens(col("text"))
    def score(stop: Seq[String]): Column =
      when(size(ws) === 0, lit(0.0))
        .otherwise(round(size(filter(ws, w => w.isin(stop: _*))).cast("double") / size(ws), 4))
    val scored = documents.select(
      Seq(col("doc_id"), col("lang").as("labeled_lang")) ++
        LangProfiles.map { case (l, st) => score(st).as(s"score_$l") }: _*)
    val scoreCols = LangProfiles.map { case (l, _) => col(s"score_$l") }
    val best = greatest(scoreCols: _*)
    val pred = LangProfiles.foldLeft(when(best <= 0, lit("und"))) {
      case (acc, (l, _)) => acc.when(col(s"score_$l") === best, lit(l))
    }
    scored.select(
      Seq(col("doc_id"), col("labeled_lang"), pred.as("predicted_lang")) ++ scoreCols: _*)
      .orderBy("doc_id")
  }
}
