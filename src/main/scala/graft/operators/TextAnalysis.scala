package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.operators.Dedup.tokens

/** Text-analysis operators for training-data pipelines: quality scoring,
  * token counting, document fingerprinting, language identification.
  * All are row-local (narrow) transformations — they scale embarrassingly
  * and keep the parquet scan as the only I/O.
  *
  * OUTPUT ORDER IS UNSPECIFIED: an ORDER BY inside an operator API would
  * plan an `Exchange rangepartitioning` + full sort of a corpus-sized
  * output at 100 TB. Determinism sorts live in the QueryDef wrappers
  * (the oracle edge), and `PlanSpec` pins that bare narrow-operator
  * calls plan ZERO exchanges of either kind. ([[vocabulary]] is the one
  * exception: its orderBy+limit IS the top-K semantics and plans as
  * TakeOrderedAndProject, never a full sort.)
  */
object TextAnalysis {

  /** Public like [[LangProfiles]] so oracle SQL generates from the
    * same table the operator uses (no drift).
    */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "in", "to", "is")

  /** Quality signals: length ratios, stopword ratio, a bounded composite
    * score. Pure integer/rational arithmetic so an SQL oracle matches
    * exactly. All rounding goes through the shared
    * [[graft.functions.GraftFunctions.round4]] floor-trick definition —
    * the same double operations [[TrainingPipeline]]'s fused filter
    * performs in its typed map — so `quality()>=minQuality` composed
    * and the fused pipeline filter agree on EVERY document, including
    * representation-boundary scores where Spark's BigDecimal `round`
    * would drift one ulp-step.
    */
  def quality(documents: DataFrame): DataFrame = {
    val r4 = graft.functions.GraftFunctions.round4 _
    val words = tokens(col("text"))
    documents.select(
      col("doc_id"),
      col("n_chars"),
      size(words).as("n_words"),
      r4(col("n_chars").cast("double") / size(words)).as("chars_per_word"),
      r4(aggregate(words, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(words))
        .as("avg_word_len"),
      size(filter(words, w => w.isin(Stopwords: _*))).as("n_stop"),
      r4(size(filter(words, w => w.isin(Stopwords: _*))).cast("double") / size(words))
        .as("stop_ratio"),
      r4(
        size(filter(words, w => w.isin(Stopwords: _*))).cast("double") / size(words) * 0.5
          + least(size(words), lit(100)).cast("double") / 100 * 0.5)
        .as("quality_score"))
  }

  /** Gopher-style rule filtering (the public Gopher paper's document
    * quality heuristics, Rae et al. 2021 §A1.1): per document, the rule
    * signals and a composite pass flag —
    *   - word count within [minWords, maxWords] — NOTE the default
    *     minWords=25 deliberately deviates from the paper's 50-word
    *     rule (the synthetic fixture corpus skews shorter than web
    *     text; a Gopher-faithful run passes minWords = 50);
    *   - mean word length within [3, 10];
    *   - symbol-to-word ratio ('#' or '...' occurrences / words) <= 0.1;
    *   - fraction of lines starting with a bullet < 0.9;
    *   - fraction of lines ending with '...' < 0.3;
    *   - at least `minStopKinds` DISTINCT stopwords present (the
    *     "contains 2 of the, be, to, of, and, that, have, with" rule,
    *     over the engine's stopword list).
    * Unlike [[c4LineFilter]] (which rewrites the text line by line),
    * this is the document-level accept/reject gate; emitting the
    * signals alongside the flag keeps the decision auditable (threshold
    * sweeps without recomputation). Pure rational arithmetic + explicit
    * character classes, so an SQL oracle replays it exactly; one narrow
    * codegen'd projection, no shuffle, at any corpus size.
    */
  def gopherRules(
      documents: DataFrame,
      minWords: Int = 25,
      maxWords: Int = 100000,
      minStopKinds: Int = 2,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minWords > 0 && maxWords > minWords,
      s"invalid word bounds [$minWords, $maxWords]")
    val r4 = graft.functions.GraftFunctions.round4 _
    val t = col(textCol)
    val words = tokens(t)
    val nWords = size(words)
    val meanLen = aggregate(words, lit(0L), (acc, w) => acc + length(w))
      .cast("double") / nWords
    // '#' plus non-overlapping '...' runs — both regex engines scan
    // left to right, so the counts agree by construction
    val nSymbols = regexp_count(t, lit("#")) + regexp_count(t, lit("\\.\\.\\."))
    val lines = filter(transform(split(t, "\n"), l => trim(l)), l => length(l) > 0)
    val nLines = size(lines)
    val nBullet = size(filter(lines, l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("•")))
    val nEllipsis = size(filter(lines, l => l.endsWith("...")))
    // distinct-presence count over the fixed stopword list, expanded
    // term by term (array_intersect/list_intersect dedup semantics
    // differ between engines; the explicit sum can't)
    val nStopKinds = Stopwords.map(w =>
      array_contains(words, w).cast("int")).reduce(_ + _)
    documents.select(
      col(idCol),
      nWords.as("n_words"),
      r4(when(nWords > 0, meanLen).otherwise(0.0)).as("mean_word_len"),
      r4(when(nWords > 0, nSymbols.cast("double") / nWords).otherwise(0.0))
        .as("symbol_ratio"),
      r4(when(nLines > 0, nBullet.cast("double") / nLines).otherwise(0.0))
        .as("bullet_ratio"),
      r4(when(nLines > 0, nEllipsis.cast("double") / nLines).otherwise(0.0))
        .as("ellipsis_ratio"),
      nStopKinds.as("n_stop_kinds"),
      (nWords >= minWords && nWords <= maxWords &&
        meanLen >= 3.0 && meanLen <= 10.0 &&
        nSymbols.cast("double") / nWords <= 0.1 &&
        (nLines === 0 || nBullet.cast("double") / nLines < 0.9) &&
        (nLines === 0 || nEllipsis.cast("double") / nLines < 0.3) &&
        nStopKinds >= minStopKinds).as("pass"))
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

  /** Learn a BPE merges table from the corpus — the tokenizer-training
    * pass of a data pipeline (Sennrich 2016; see [[graft.functions.Bpe]]
    * for the algorithm and its two documented deviations). Distributed
    * part: ONE token-keyed shuffle builds the word-frequency dict
    * (map-side partials, vocabulary-sized output); the dict is then
    * truncated to the `maxDictWords` most frequent words — a
    * TakeOrdered (bounded heap, no full sort) — and collected. Training
    * itself is driver-side ON THE BOUNDED DICT, which is how production
    * tokenizers train too (HuggingFace/SentencePiece run single-node on
    * a sample): the iterative merge loop is inherently sequential, and
    * the dict, not the corpus, is its input. The collect is explicitly
    * capped — at 100 TB the dict for any natural-language corpus is
    * MBs (Heaps' law), and pathological corpora hit the cap, not the
    * driver's heap.
    */
  def bpeTrain(
      documents: DataFrame,
      numMerges: Int = 64,
      maxDictWords: Int = 100000,
      textCol: String = "text"): Seq[(String, String)] = {
    require(maxDictWords > 0, s"invalid maxDictWords=$maxDictWords")
    val dict = documents
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w")).limit(maxDictWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    graft.functions.Bpe.train(dict, numMerges)
  }

  /** Apply a fixed BPE merges table to the corpus: per document the
    * word count, subword count, and the md5 of the space-joined subword
    * stream (full-content check, the fimTransform trick — the oracle
    * verifies the actual segmentation, not just arithmetic). This is
    * the REAL token accounting the whitespace-token operators
    * approximate; feed `n_bpe_tokens` into the token-budget/packing
    * passes via their tokenCol variants (sp8b/pk1b).
    *
    * Scale shape: one narrow typed pass, zero exchanges, with a
    * per-partition word->segmentation memo — Zipf token frequencies
    * make the hit rate extreme, so the per-word merge loop runs
    * ~once per distinct word per partition, not once per occurrence.
    * The merges table ships in the closure (even 50k merges is ~1 MB).
    *
    * PRECONDITION shared with the oracle: text must not contain U+0001
    * (the oracle's symbol separator; the corpus generator guarantees
    * it, and encodingQuality's control-char screen drops violators).
    */
  def bpeTokenize(
      documents: DataFrame,
      merges: Seq[(String, String)],
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    bpeTokenizeObserved(documents, merges, idCol, textCol)._1

  /** Leftmost-longest MaxMatch tokenization over the PIECE vocabulary a
    * BPE merge table induces ([[graft.functions.Bpe.maxMatchSegment]],
    * the fast-WordPiece decoding rule) — the throughput-swap decoder
    * production tokenizers pair with a trained vocab: same artifact,
    * different (and cheaper, O(len·maxPieceLen)) matching rule than
    * [[bpeTokenize]]'s merge replay. Output shape matches bpeTokenize:
    * per doc the word count, MaxMatch token count, and the md5 of the
    * space-joined token stream (full-content segmentation check).
    *
    * Scale shape: one narrow typed pass, zero exchanges, per-partition
    * word memo (the bpeTokenize Zipf argument). Precondition shared
    * with the oracle: ASCII-safe text (the recursive mirror counts
    * positions in codepoints, the engine in UTF-16 units — identical on
    * the generator's corpus, and encodingQuality screens violators).
    */
  def maxMatchTokenize(
      documents: DataFrame,
      merges: Seq[(String, String)],
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val pieces = merges.map { case (a, b) => a + b }.toSet
    val maxLen = if (pieces.isEmpty) 1 else pieces.map(_.length).max
    Dedup.spread(documents.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = new java.util.HashMap[String, Array[String]]()
        it.map { case (id, text) =>
          val words = graft.functions.TextHashing.tokens(text)
          var nt = 0L
          val sb = new java.lang.StringBuilder
          words.foreach { w =>
            var segs = memo.get(w)
            if (segs == null) {
              segs = graft.functions.Bpe.maxMatchSegment(w, pieces, maxLen)
              memo.put(w, segs)
            }
            nt += segs.length
            segs.foreach { s =>
              if (sb.length > 0) sb.append(' ')
              sb.append(s)
            }
          }
          (id, words.length.toLong, nt,
            graft.functions.TextHashing.md5Hex(sb.toString))
        }
      }
      .toDF(idCol, "n_words", "n_mm_tokens", "mm_md5")
  }

  /** Unigram-LM (Viterbi) tokenization — the SentencePiece decoding
    * rule (Kudo 2018, public algorithm) bootstrapped from the MaxMatch
    * segmentation: EM iteration 0 of unigram training. Pass 1 counts
    * occurrence-weighted [[graft.functions.Bpe.maxMatchSegment]] tokens
    * over the corpus (the init segmentation); the observed token vocab
    * with −ln(count/total) micro-integer costs becomes the unigram LM
    * (coverage is guaranteed: every word's own bootstrap cover is in
    * the vocab). Pass 2 re-segments every word by max likelihood
    * ([[graft.functions.Bpe.viterbiSegment]]); ties → fewer pieces →
    * lexicographically smallest token stream. Output shape matches
    * [[maxMatchTokenize]]: (doc, n_words, n_uni_tokens, md5 of the full
    * token stream).
    *
    * Scale shape (r19): ONE corpus pass builds the (word, freq) dict
    * (token-keyed exchange); bootstrap counts are Σ freq(w)·segs(w)
    * over the dict — driver-side within [[SmallDictMaxWords]], a
    * narrow dict pass above it — then one final narrow corpus pass
    * re-segments under the broadcast costs. Costs
    * cross engines as `floor(x·1e6 + 0.5)` micro-longs (x ≥ 0), the
    * exact mirror of DuckDB's half-away-from-zero `round()`.
    */
  def unigramTokenize(
      documents: DataFrame,
      merges: Seq[(String, String)],
      idCol: String = "doc_id",
      textCol: String = "text",
      smallDictMaxWords: Int = SmallDictMaxWords): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val pieces = merges.map { case (a, b) => a + b }.toSet
    val base = Dedup.spread(documents.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
    // pass 1: occurrence-weighted bootstrap counts — rounds = 0 of the
    // shared EM loop (freq-dict form, r19: counts are Σ freq(w)·segs(w),
    // identical to the old direct corpus count)
    val (counts, _) = unigramEmCounts(base, pieces, rounds = 0, smallDictMaxWords)
    val costs = unigramMicroCosts(counts)
    val vocabMaxLen = if (counts.isEmpty) 1 else counts.map(_._1.length).max
    val bcCosts = spark.sparkContext.broadcast(costs)
    // pass 2: max-likelihood re-segmentation, memoized per word
    base.mapPartitions { it =>
        val cs = bcCosts.value
        val memo = new java.util.HashMap[String, Array[String]]()
        it.map { case (id, text) =>
          val words = graft.functions.TextHashing.tokens(text)
          var nt = 0L
          val sb = new java.lang.StringBuilder
          words.foreach { w =>
            var segs = memo.get(w)
            if (segs == null) {
              segs = graft.functions.Bpe.viterbiSegment(w, cs, vocabMaxLen)
              memo.put(w, segs)
            }
            nt += segs.length
            segs.foreach { s =>
              if (sb.length > 0) sb.append(' ')
              sb.append(s)
            }
          }
          (id, words.length.toLong, nt,
            graft.functions.TextHashing.md5Hex(sb.toString))
        }
      }
      .toDF(idCol, "n_words", "n_uni_tokens", "uni_md5")
  }

  /** `-ln(count/total)` as micro-integer costs — the unigram-LM emit
    * rule shared by [[unigramTokenize]] and [[unigramTokenizeEm1]].
    */
  private def unigramMicroCosts(
      counts: Array[(String, Long)]): java.util.HashMap[String, java.lang.Long] = {
    val total = counts.map(_._2).sum
    val costs = new java.util.HashMap[String, java.lang.Long]()
    counts.foreach { case (p, c) =>
      costs.put(p, java.lang.Long.valueOf(math.floor(
        (math.log(total.toDouble) - math.log(c.toDouble)) * 1e6 + 0.5).toLong))
    }
    costs
  }

  /** One full EM iteration of unigram-LM training on top of
    * [[unigramTokenize]]'s bootstrap (Kudo 2018 §3.2, the SentencePiece
    * training loop): the M-step recounts pieces from the Viterbi-1
    * segmentation (occurrence-weighted — pieces the decoder stopped
    * using fall out of the LM, exactly how SentencePiece's vocabulary
    * shrinks), and the E-step re-segments every word under the
    * re-estimated costs. Coverage survives the shrink: every word's own
    * Viterbi-1 pieces are counted, so each word can at worst keep its
    * previous segmentation. Output shape matches [[unigramTokenize]]:
    * (doc, n_words, n_em1_tokens, md5 of the full re-segmented stream).
    *
    * Scale shape (r19): ONE corpus pass (the word-freq dict) + one
    * final re-segmentation pass; the bootstrap and E-step-1 recounts
    * run over the DICT, not the corpus — driver-side within
    * [[SmallDictMaxWords]] (O(1) jobs in rounds), distributed dict
    * passes above it. Costs cross engines as micro-longs
    * (`floor(x·1e6 + 0.5)`, x ≥ 0).
    */
  def unigramTokenizeEm1(
      documents: DataFrame,
      merges: Seq[(String, String)],
      idCol: String = "doc_id",
      textCol: String = "text",
      smallDictMaxWords: Int = SmallDictMaxWords): DataFrame =
    unigramTokenizeEm(documents, merges, rounds = 1, idCol, textCol,
      nTokCol = "n_em1_tokens", md5Col = "em1_md5",
      smallDictMaxWords = smallDictMaxWords)

  /** Unigram-LM EM run TO CONVERGENCE (capped at `rounds` iterations) —
    * the full SentencePiece training loop on top of
    * [[unigramTokenize]]'s bootstrap: each round recounts pieces from
    * the previous round's Viterbi segmentation (M-step; pieces the
    * decoder stopped using fall out of the LM — the vocabulary prune)
    * and re-estimates the costs. The loop EARLY-STOPS at the first
    * exact fixed point: when a round's counts equal the previous
    * round's, the costs are identical, so every further round replays
    * the same segmentation — the capped loop and a fixed `rounds`
    * unroll (what the SQL mirror does) provably agree. Output shape
    * matches [[unigramTokenize]]: (doc, n_words, nTokCol, md5Col of
    * the final re-segmented stream).
    *
    * Scale shape (r19): TWO corpus passes total regardless of rounds
    * — the word-freq dict build and the final re-segmentation; every
    * EM recount runs over the dict (driver-side within
    * [[SmallDictMaxWords]], so the whole loop is O(1) jobs in rounds;
    * distributed dict passes + one vocab-bounded exchange per round
    * above the gate). Loop state stays vocab-sized either way.
    */
  def unigramTokenizeEm(
      documents: DataFrame,
      merges: Seq[(String, String)],
      rounds: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text",
      nTokCol: String = "n_em_tokens",
      md5Col: String = "em_md5",
      smallDictMaxWords: Int = SmallDictMaxWords): DataFrame = {
    require(rounds >= 1, s"invalid rounds=$rounds")
    val spark = documents.sparkSession
    import spark.implicits._
    val pieces = merges.map { case (a, b) => a + b }.toSet
    val base = Dedup.spread(documents.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
    val (_, countsF) = unigramEmCounts(base, pieces, rounds, smallDictMaxWords)
    val costsF = unigramMicroCosts(countsF)
    val maxLenF = if (countsF.isEmpty) 1 else countsF.map(_._1.length).max
    val bcF = spark.sparkContext.broadcast(costsF)
    // final E-step: re-segment the corpus under the converged LM
    base.mapPartitions { it =>
        val cs = bcF.value
        val memo = new java.util.HashMap[String, Array[String]]()
        it.map { case (id, text) =>
          val words = graft.functions.TextHashing.tokens(text)
          var nt = 0L
          val sb = new java.lang.StringBuilder
          words.foreach { w =>
            var segs = memo.get(w)
            if (segs == null) {
              segs = graft.functions.Bpe.viterbiSegment(w, cs, maxLenF)
              memo.put(w, segs)
            }
            nt += segs.length
            segs.foreach { s =>
              if (sb.length > 0) sb.append(' ')
              sb.append(s)
            }
          }
          (id, words.length.toLong, nt,
            graft.functions.TextHashing.md5Hex(sb.toString))
        }
      }
      .toDF(idCol, "n_words", nTokCol, md5Col)
  }

  /** The vocabulary-prune view of the EM loop: which bootstrap pieces
    * survived `rounds` EM iterations (SentencePiece's vocabulary
    * shrinking, Kudo 2018 §3.2 — a piece the Viterbi decoder stops
    * using gets count 0 and leaves the LM). Output, one row per
    * BOOTSTRAP piece: (piece, boot_cnt, final_cnt, cost_micro, kept)
    * where pruned pieces carry final_cnt 0 and cost_micro −1 (an
    * integer sentinel, NOT NULL — a nullable BIGINT materializes as
    * float64 in pandas on the DuckDB side and the driver's hasher
    * would see 123.0 vs 123, the recorded pk1 dtype trap).
    * Driver state is vocab-sized; the corpus work is the same EM loop
    * as [[unigramTokenizeEm]].
    */
  def unigramVocabPrune(
      documents: DataFrame,
      merges: Seq[(String, String)],
      rounds: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text",
      smallDictMaxWords: Int = SmallDictMaxWords): DataFrame = {
    require(rounds >= 1, s"invalid rounds=$rounds")
    val spark = documents.sparkSession
    import spark.implicits._
    val pieces = merges.map { case (a, b) => a + b }.toSet
    val base = Dedup.spread(documents.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
    val (counts0, countsF) = unigramEmCounts(base, pieces, rounds, smallDictMaxWords)
    val totF = countsF.map(_._2).sum
    val fin = countsF.toMap
    counts0.toSeq.sortBy(_._1)
      .map { case (p, c0) =>
        val cf = fin.getOrElse(p, 0L)
        val cost =
          if (cf == 0L) -1L
          else math.floor(
            (math.log(totF.toDouble) - math.log(cf.toDouble)) * 1e6 + 0.5).toLong
        (p, c0, cf, cost, cf > 0L)
      }
      .toDF("piece", "boot_cnt", "final_cnt", "cost_micro", "kept")
  }

  /** Size gate for the EM training loop's driver fast path: a
    * word-frequency dict within the gate collects once and the whole
    * EM loop runs driver-side in O(1) jobs (the dd8/gr1 strategy
    * discipline); above it, every round stays a distributed pass over
    * the persisted dict. 200k (word, freq) pairs ≈ a few MB of driver
    * heap — the same order as the piece-vocab broadcasts the loop
    * already holds.
    */
  private[operators] val SmallDictMaxWords = 200000

  /** The EM count loop shared by [[unigramTokenize]] (rounds = 0:
    * bootstrap only), [[unigramTokenizeEm]] and [[unigramVocabPrune]]:
    * bootstrap (MaxMatch) piece counts, then up to `rounds`
    * occurrence-weighted Viterbi recounts, early-stopped at the first
    * exact count fixed point (see [[unigramTokenizeEm]] for why that
    * is mirror-equivalent to a fixed unroll). Returns (bootstrap
    * counts, final counts); both are vocab-sized.
    *
    * r19 restructure (the SentencePiece formulation proper, Kudo 2018
    * trains on the word-frequency table): ONE corpus pass builds the
    * (word, freq) dict — occurrence-weighted piece counts are then
    * Σ_w freq(w)·segs(w), identical totals — so EM rounds never touch
    * the corpus again. Within [[SmallDictMaxWords]] the dict collects
    * once and every round is driver-side arithmetic (O(1) jobs in
    * rounds — the previous shape paid one corpus pass + one
    * vocab exchange + one collect PER ROUND); above the gate each
    * round is a narrow pass over the persisted dict (corpus-scale
    * path: the dict is orders of magnitude under the corpus).
    */
  private def unigramEmCounts(
      base: org.apache.spark.sql.Dataset[(Long, String)],
      pieces: Set[String],
      rounds: Int,
      smallDictMaxWords: Int = SmallDictMaxWords)
    : (Array[(String, Long)], Array[(String, Long)]) = {
    val spark = base.sparkSession
    import spark.implicits._
    val mmMaxLen = if (pieces.isEmpty) 1 else pieces.map(_.length).max
    // the ONE corpus pass: per-partition pre-aggregated word counts
    // into a token-keyed exchange — the bpeTrain shape
    val wordFreq = base.mapPartitions { it =>
        val cnt = new scala.collection.mutable.HashMap[String, Long]()
        it.foreach { case (_, text) =>
          graft.functions.TextHashing.tokens(text)
            .foreach(w => cnt.update(w, cnt.getOrElse(w, 0L) + 1L))
        }
        cnt.iterator
      }
      .toDF("w", "c").groupBy("w").agg(sum("c").as("freq"))
      .as[(String, Long)]
    // gate probe: limit(cap + 1) — a full result within the cap IS the
    // dict (one job; the distributed path discards the probe rows)
    val head = wordFreq.limit(smallDictMaxWords + 1).collect()
    if (head.length <= smallDictMaxWords) {
      // driver fast path: the whole EM loop is in-memory arithmetic
      def countWith(seg: String => Array[String]): Array[(String, Long)] = {
        val cnt = new scala.collection.mutable.HashMap[String, Long]()
        head.foreach { case (w, f) =>
          seg(w).foreach(t => cnt.update(t, cnt.getOrElse(t, 0L) + f))
        }
        cnt.toArray
      }
      val counts0 = countWith(
        w => graft.functions.Bpe.maxMatchSegment(w, pieces, mmMaxLen))
      var counts = counts0
      var r = 0
      var converged = false
      while (r < rounds && !converged) {
        val costs = unigramMicroCosts(counts)
        val maxLen = if (counts.isEmpty) 1 else counts.map(_._1.length).max
        val next = countWith(
          w => graft.functions.Bpe.viterbiSegment(w, costs, maxLen))
        converged = next.toMap == counts.toMap
        counts = next
        r += 1
      }
      (counts0, counts)
    } else {
      // distributed loop: each round is a narrow pass over the
      // persisted dict (never the corpus) + a vocab-bounded exchange
      val dict = wordFreq.persist(StorageLevel.MEMORY_AND_DISK)
      try {
        def countWith(mkSeg: () => String => Array[String]): Array[(String, Long)] =
          dict.mapPartitions { it =>
              val seg = mkSeg()
              val cnt = new scala.collection.mutable.HashMap[String, Long]()
              it.foreach { case (w, f) =>
                seg(w).foreach(t => cnt.update(t, cnt.getOrElse(t, 0L) + f))
              }
              cnt.iterator
            }
            .toDF("piece", "c").groupBy("piece").agg(sum("c").as("cnt"))
            .collect().map(r => (r.getString(0), r.getLong(1)))
        val counts0 = countWith(() =>
          w => graft.functions.Bpe.maxMatchSegment(w, pieces, mmMaxLen))
        var counts = counts0
        var r = 0
        var converged = false
        while (r < rounds && !converged) {
          val costs = unigramMicroCosts(counts)
          val maxLen = if (counts.isEmpty) 1 else counts.map(_._1.length).max
          // in-loop broadcasts are destroyed once their counting job
          // has collected (the lloydCentroids discipline)
          val bc = spark.sparkContext.broadcast(costs)
          val next =
            try {
              countWith { () =>
                val cs = bc.value
                w => graft.functions.Bpe.viterbiSegment(w, cs, maxLen)
              }
            } finally bc.destroy()
          converged = next.toMap == counts.toMap
          counts = next
          r += 1
        }
        (counts0, counts)
      } finally dict.unpersist(false)
    }
  }

  /** [[bpeTokenize]] plus the memo-effectiveness counters the scale
    * story rests on: (frame, memoHits, memoMisses) where a miss runs
    * the O(merges × len) segment loop and a hit is an O(1) lookup.
    * Zipf token frequencies make hits dominate (spec-pinned > 90% on
    * the sf corpus); accumulators are flushed once per partition, not
    * per word, so observability costs nothing in the hot loop.
    */
  def bpeTokenizeObserved(
      documents: DataFrame,
      merges: Seq[(String, String)],
      idCol: String = "doc_id",
      textCol: String = "text")
      : (DataFrame, org.apache.spark.util.LongAccumulator,
         org.apache.spark.util.LongAccumulator) = {
    val spark = documents.sparkSession
    import spark.implicits._
    val m = merges.toArray.toSeq
    val hitsAcc = spark.sparkContext.longAccumulator("bpe-memo-hits")
    val missAcc = spark.sparkContext.longAccumulator("bpe-memo-misses")
    val df = Dedup.spread(documents.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = new java.util.HashMap[String, Array[String]]()
        var hits = 0L
        var misses = 0L
        val mapped = it.map { case (id, text) =>
          val words = graft.functions.TextHashing.tokens(text)
          var nb = 0L
          val sb = new java.lang.StringBuilder
          words.foreach { w =>
            var segs = memo.get(w)
            if (segs == null) {
              misses += 1
              segs = graft.functions.Bpe.segment(w, m)
              memo.put(w, segs)
            } else hits += 1
            nb += segs.length
            segs.foreach { s =>
              if (sb.length > 0) sb.append(' ')
              sb.append(s)
            }
          }
          (id, words.length.toLong, nb,
            graft.functions.TextHashing.md5Hex(sb.toString))
        }
        // flush the partition-local counters after the last row
        new Iterator[(Long, Long, Long, String)] {
          private var flushed = false
          override def hasNext: Boolean = {
            val h = mapped.hasNext
            if (!h && !flushed) {
              hitsAcc.add(hits); missAcc.add(misses); flushed = true
            }
            h
          }
          override def next(): (Long, Long, Long, String) = mapped.next()
        }
      }
      .toDF("doc_id", "n_words", "n_bpe_tokens", "bpe_md5")
    (df, hitsAcc, missAcc)
  }

  /** Rolling-hash document fingerprint (Rabin-Karp style fold over the
    * word stream, mod 1e9+7). Word atoms use only length+first-char so
    * the identical fold is expressible in ANSI SQL for the oracle; the
    * modulus keeps every intermediate < 2^40 (ANSI-overflow-safe).
    *
    * Deliberately the `aggregate` HOF, not a typed map: the lambda
    * evaluates interpreted, but the fold is a few ops per token and
    * MEASURED faster than the typed alternative at sf0.1 (0.34 s vs
    * 0.68 s — the Dataset encoder + spread exchange cost more than the
    * interpretation on ~55-token documents). The repetition operator is
    * the opposite case (its HOF formulation re-evaluates tokenization
    * per gram, O(tokens^2)); the rule is re-evaluation, not
    * interpretation, decides when a HOF must become a typed loop.
    */
  def fingerprint(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      aggregate(tokens(col("text")), lit(0L),
        (acc, w) => pmod(acc * 131L + length(w) * 31L + ascii(w), lit(1000000007L)))
        .as("fp"))

  /** tf-idf over whitespace tokens: one row per (doc, term) with the raw
    * term frequency, document frequency, and tf * ln(N/df) (rounded for
    * cross-engine float parity). Scale shape: one explode + two hash
    * aggregations + an equi-join on the term — the df table is
    * vocabulary-sized and shuffles by term (no hot key: a term's df row
    * is one row however common the term); N is a broadcast scalar.
    * Downstream vectorization is a per-doc collect_list over this table.
    *
    * CACHE OWNERSHIP: `tf` is persist(MEMORY_AND_DISK)ed (two consumers,
    * no shared exchange) and NOT unpersisted here — a returned DataFrame
    * has no completion hook. Repeated same-input calls reuse the one
    * entry (CacheManager canonicalizes); batch harnesses clear the SQL
    * cache between queries; a long-lived caller that never clears the
    * cache should `spark.catalog.clearCache()` when done (the same
    * contract as Dedup's signature stages and IvfSearch.ivfTopK).
    */
  def tfIdf(documents: DataFrame): DataFrame = {
    // spread: a single-file corpus must not tokenize on one partition
    // (same guard every sibling text op applies)
    val tok = Dedup.spread(documents.select(col("doc_id"), col("text")))
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    // persist: tf feeds TWO consumers (the df aggregation and the join's
    // left side) that share no canonical exchange — without it the
    // tokenize/explode/agg chain re-executes per consumer (AQE exchange
    // reuse is best-effort, not a contract). Callers that batch many
    // queries clear the SQL cache between them (see Dedup scaladoc).
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = documents.agg(count(lit(1)).as("n"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tf") * log(col("n") / col("df")), 4).as("tfidf"))
  }

  /** Okapi BM25 top-k retrieval over the corpus — the lexical-search
    * baseline every RAG / retrieval-curation pipeline carries. Queries
    * are derived from the corpus itself (deterministic, oracle-
    * replayable): the df-ranked vocabulary's terms at ranks
    * `[rankLo, rankLo + nQueries*termsPerQuery)` (df DESC, term ties
    * lexical) split into `nQueries` consecutive groups — mid-frequency
    * terms, so posting lists are informative but bounded. Score per
    * (query, doc) = Σ_terms idf·tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    * with the Lucene plus-one idf `ln((N−df+0.5)/(df+0.5)+1)`.
    *
    * Cross-engine exactness: each (term, doc) partial score rounds to
    * integer MICRO-credits per row (`floor(x·1e6+0.5)`, the r13 emit
    * rule) BEFORE the per-document sum — integer sums are addition-
    * order-free, so Spark's partial aggregation and DuckDB's single-
    * threaded fold agree bit-for-bit where a double Σ would drift with
    * partitioning. avgdl divides two integer sums once (the
    * micro-average rule).
    *
    * Scale shape (100 TB): one explode into a persisted (doc, term, tf)
    * frame with three consumers (df, dl=Σtf per doc, the score join);
    * the query fixture is a TakeOrdered top-(rankLo+Q·T) over the
    * vocabulary-sized df table collected to the driver (tens of rows —
    * bounded) and broadcast back; scoring filters tf by the broadcast
    * term set (postings of Q·T mid-frequency terms) and joins dl on
    * the doc key. Ranking is a BOUNDED PARTIAL TOP-K aggregate
    * ([[topKByGroup]]), not a rank window: the window form capped
    * parallelism at nQueries and sorted every candidate inside each
    * qid partition — at 100× the corpus that is a handful of fat sort
    * partitions — while the aggregator reduces every partition to ≤ k
    * entries per qid before the shuffle. For web-scale posting lists
    * the further upgrade is impact-ordered pruning (WAND/block-max) —
    * a cursor algorithm with no faithful relational form; the partial
    * top-k plus mid-frequency fixture keeps candidates bounded here.
    */
  def bm25TopK(
      documents: DataFrame,
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 10,
      rankLo: Int = 12,
      nQueries: Int = 4,
      termsPerQuery: Int = 4): DataFrame =
    bm25TopKManaged(documents, k1, b, topK, rankLo, nQueries, termsPerQuery)._1

  /** [[bm25TopK]] with caller-managed cache cleanup (the
    * screenAndPhaseManaged convention): the chain persists its tf frame
    * and the returned result is LAZY, so the operator cannot unpersist
    * it itself — callers that loop (soaks, batch drivers) invoke the
    * thunk after the final action to release the cached frame instead
    * of leaking one per call for the session lifetime.
    */
  def bm25TopKManaged(
      documents: DataFrame,
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 10,
      rankLo: Int = 12,
      nQueries: Int = 4,
      termsPerQuery: Int = 4): (DataFrame, () => Unit) = {
    require(topK > 0, s"invalid topK=$topK")
    val c = bm25Chain(documents, k1, b, rankLo, nQueries, termsPerQuery)
    val scores = c.hits.groupBy("qid", "doc_id")
      .agg(sum("s_micro").cast("long").as("bm25_micro"))
    (topKByGroup(scores, "qid", "bm25_micro", "doc_id", topK),
      () => { c.tf.unpersist(false); c.dl.unpersist(false); () })
  }

  /** Per-group bounded top-k — see [[graft.operators.TopK.byGroupDesc]]
    * (shared with the ANN family).
    */
  private[graft] def topKByGroup(
      scores: DataFrame,
      g: String,
      scoreCol: String,
      idCol: String,
      k: Int): DataFrame = TopK.byGroupDesc(scores, g, scoreCol, idCol, k)

  /** Shared retrieval chain for [[bm25TopK]], [[qlTopK]] and
    * [[rrfFusionTopK]]: the persisted tf frame, vocabulary df, the
    * collected corpus stats, the broadcast query fixture, and
    * per-(query, term, doc) hit rows carrying BOTH the BM25
    * micro-credit and the tf-idf quarti-credit (`round(tf ·
    * ln(N/df) · 1e4)` — the q4 scale keeps Σm² inside a long at corpus
    * document lengths; consumers that don't read `m_q4` get it pruned
    * by Catalyst at zero cost).
    *
    * Corpus stats (`n`, `avgdl`, `sdl` = Σtf = the collection token
    * total) are SCALA VALUES, not a stats frame: the r17 forensic put
    * the family's 1.0-1.4× window swing on per-run driver-job count,
    * and the old singleton-stats frame cost two aggregation jobs plus
    * two broadcast exchanges PER QUERY RUN. Three bounded scalars
    * collected once (off the already-persisted tf + a metadata-only
    * documents count) and inlined as literals — the probeBm25 pattern,
    * where stats ride the index stamp — buy the same plan with zero
    * stats subtree. The fixture rows additionally carry `cf` (per-term
    * Σtf) so [[qlTopK]]'s collection frequencies ride the SAME fixture
    * collect instead of a second semi-join + aggregate pass.
    */
  private case class Bm25Chain(tf: DataFrame, df: DataFrame,
      n: Long, avgdl: Double, sdl: Long,
      qterms: DataFrame, hits: DataFrame, dl: DataFrame)

  private def bm25Chain(
      documents: DataFrame,
      k1: Double,
      b: Double,
      rankLo: Int,
      nQueries: Int,
      termsPerQuery: Int): Bm25Chain = {
    require(rankLo >= 1 && nQueries > 0 && termsPerQuery > 0,
      s"invalid bm25 fixture params ($rankLo, $nQueries, $termsPerQuery)")
    val spark = documents.sparkSession
    import spark.implicits._
    val tok = Dedup.spread(documents.select(col("doc_id"), col("text")))
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    // persisted: the consumers (df fixture collect, dl, score join,
    // rrf's norm join) share no exchange
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // df carries cf (collection frequency) so the fixture collect below
    // hands qlTopK its cf values for free — one extra map-side sum over
    // an aggregation this frame runs anyway
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"),
      sum("tf").cast("long").as("cf"))
    // dl persists (r20): it has TWO consumers that share no exchange —
    // the stats collect below and the score join — so without the cache
    // the doc-keyed aggregation over the tf cache ran twice per query.
    // The stats job materializes it; the managed cleanup thunk releases
    // it together with tf.
    val dl = tf.groupBy("doc_id").agg(sum("tf").cast("long").as("dl"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nTerms = nQueries * termsPerQuery
    // TakeOrderedAndProject + a fixture-bounded driver collect — never a
    // global-sort exchange or an unpartitioned rank window (the q12 rule).
    // This job also materializes the tf cache for everything below.
    val ranked = df.orderBy(col("df").desc, col("term"))
      .limit(rankLo - 1 + nTerms).collect()
    require(ranked.length == rankLo - 1 + nTerms,
      s"vocabulary too small for the rank-$rankLo fixture: ${ranked.length}")
    val qterms = ranked.iterator.zipWithIndex
      .drop(rankLo - 1)
      .map { case (r, i) =>
        ((i + 1 - rankLo).toLong / termsPerQuery,
          r.getAs[String]("term"), r.getAs[Long]("df"), r.getAs[Long]("cf"))
      }.toSeq.toDF("qid", "term", "df", "cf")
    // bounded stats collect — ONE driver job: the dl-stats branch (off
    // the cached tf) and the doc-count branch union into a single 2-row
    // collect; identical IEEE arithmetic to the old in-plan double
    // division (sdl.toDouble / nd)
    val st = dl.agg(sum("dl").cast("long").as("a"),
        count(lit(1)).cast("long").as("b"))
      .unionByName(documents.agg(count(lit(1)).cast("long").as("a"))
        .select(col("a"), lit(-1L).as("b")))
      .collect()
    // marker-based row selection (b == -1 is the doc-count row) — same
    // rationale as bm25Postings: never rely on Union preserving child
    // row order for a scalar that feeds every score
    val dlRow = st.find(_.getLong(1) != -1L).getOrElse(
      sys.error("bm25Chain: dl-stats row missing from stats collect"))
    val sdl = dlRow.getLong(0)
    val nd = dlRow.getLong(1)
    val n = st.find(_.getLong(1) == -1L).getOrElse(
      sys.error("bm25Chain: doc-count row missing from stats collect")).getLong(0)
    require(nd > 0, "bm25Chain: corpus has no tokenized documents")
    val avgdl = sdl.toDouble / nd
    // one micro-rounded integer per (query, term, doc) BEFORE the sum
    val hits = tf.join(broadcast(qterms.select("qid", "term", "df")), "term")
      .join(dl, "doc_id")
      .select(col("qid"), col("doc_id"),
        floor(
          log((lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
            * (col("tf") * lit(k1 + 1.0))
            / (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
            * lit(1000000.0) + lit(0.5)).cast("long").as("s_micro"),
        floor(col("tf") * log(lit(n) / col("df")) * lit(10000.0) + lit(0.5))
          .cast("long").as("m_q4"))
    Bm25Chain(tf, df, n, avgdl, sdl, qterms, hits, dl)
  }

  /** Dirichlet-smoothed QUERY-LIKELIHOOD retrieval (Ponte & Croft 1998
    * ranking with Zhai & Lafferty 2001 smoothing) — the language-model
    * member of the retrieval triple next to [[bm25TopK]] (probabilistic)
    * and [[rrfFusionTopK]] (hybrid). Per (query, doc):
    *
    *   score = Σ_{t∈q} ln(1 + tf(t,d)·|C| / (μ·cf(t)))
    *         + |q| · ln(μ / (dl(d) + μ))
    *
    * the standard rank-equivalent decomposition of
    * Σ ln((tf + μ·cf/|C|) / (dl + μ)): the left sum runs only over
    * MATCHED terms (candidates = docs sharing ≥1 fixture term, the
    * postings-bounded set every practical QL retriever scores), the
    * right term is per-document only. cf is the COLLECTION frequency
    * (Σ tf over docs — QL smooths by token mass where BM25's idf counts
    * documents), |C| the corpus token total.
    *
    * Cross-engine exactness: each matched-term contribution floors to
    * integer micro-nats BEFORE the per-document sum (the r13 emit rule
    * — integer sums are addition-order-free); the per-doc smoothing
    * term floors once per (query, doc). `floor(x·1e6 + 0.5)` on BOTH
    * engines — not round(): the smoothing term is negative and
    * half-away-from-zero rounding would diverge from half-up there.
    *
    * Scale shape: [[bm25Chain]]'s persisted tf + fixture machinery; cf
    * rides the fixture rows (per-term Σtf collected by the chain's
    * single fixture job) and |C| is the chain's sdl scalar, scoring is
    * one broadcast join over the postings, and the ranking rides the
    * bounded partial top-k aggregate — no windows, no new corpus-sized
    * exchanges, zero stats jobs beyond the chain's own.
    */
  def qlTopK(
      documents: DataFrame,
      mu: Double = 2000.0,
      topK: Int = 10,
      rankLo: Int = 12,
      nQueries: Int = 4,
      termsPerQuery: Int = 4): DataFrame =
    qlTopKManaged(documents, mu, topK, rankLo, nQueries, termsPerQuery)._1

  /** [[qlTopK]] with the caller-managed cache-release thunk (the
    * bm25TopKManaged convention).
    */
  def qlTopKManaged(
      documents: DataFrame,
      mu: Double = 2000.0,
      topK: Int = 10,
      rankLo: Int = 12,
      nQueries: Int = 4,
      termsPerQuery: Int = 4): (DataFrame, () => Unit) = {
    require(topK > 0 && mu > 0, s"invalid qlTopK params topK=$topK mu=$mu")
    val c = bm25Chain(documents, 1.2, 0.75, rankLo, nQueries, termsPerQuery)
    // collection frequencies ride the fixture rows (cf = per-term Σtf,
    // collected by the chain's single fixture job) and |C| is the
    // chain's sdl scalar (Σ over docs of dl ≡ Σ tf — the same total) —
    // the old semi-join + cf aggregate + ctot aggregate + two broadcast
    // exchanges were three extra driver jobs per run for values the
    // chain already had
    val hits = c.tf
      .join(broadcast(c.qterms.select("qid", "term", "cf")), "term")
      .select(col("qid"), col("doc_id"),
        floor(log(lit(1.0) + col("tf") * lit(c.sdl) / (lit(mu) * col("cf")))
          * lit(1000000.0) + lit(0.5)).cast("long").as("m_micro"))
    val scores = hits.groupBy("qid", "doc_id")
      .agg(sum("m_micro").cast("long").as("m_sum"))
      .join(c.dl, "doc_id")
      .select(col("qid"), col("doc_id"),
        (col("m_sum") + floor(log(lit(mu) / (col("dl") + lit(mu)))
          * lit(termsPerQuery.toDouble) * lit(1000000.0) + lit(0.5)).cast("long"))
          .as("ql_micro"))
    (topKByGroup(scores, "qid", "ql_micro", "doc_id", topK),
      () => { c.tf.unpersist(false); c.dl.unpersist(false); () })
  }

  /** Reciprocal-rank fusion of TWO lexical rankings over the same
    * corpus-derived query fixture — the standard hybrid-retrieval
    * consensus (Cormack et al. 2009): list 1 is Okapi BM25
    * ([[bm25TopK]]'s scores), list 2 is tf-idf cosine (query-term dot
    * product over `tf·ln(N/df)` weights, normalized by the document's
    * full tf-idf vector norm).
    *
    * RANK-CUTOFF fusion (how every production RRF runs): each list is
    * first bounded to its per-query top `rankCutoff` via the partial
    * top-k aggregator, and only docs INSIDE a list's cutoff draw that
    * list's credit — `rrf_micro = Σ_present 1e6 div (k0 + r)`, a doc
    * outside a list contributes 0 from it and reports rank 0. Fusing
    * full exact ranks (the pre-round-16 form) needed per-qid rank
    * windows over the ENTIRE candidate set — parallelism capped at the
    * query count and a full per-qid sort of every posting, the r14 ir1
    * scale flag all over again. Here the candidate frame is reduced
    * map-side to ≤ rankCutoff entries per (partition, qid, list), and
    * both lists fold in ONE qid-keyed aggregate pass (two
    * [[graft.functions.TopKScoredAgg]] columns); everything downstream
    * is fixture-bounded (≤ 2·rankCutoff rows per query). No rank
    * window anywhere (plan-gated); the aggregator's (score desc,
    * id asc) selection order equals the mirror's window order, so
    * bounded-list ranks match full ranks wherever both are defined.
    *
    * Cross-engine exactness: the dot product sums integer
    * quarti-credits (rounded per (term, doc) BEFORE the sum); the norm
    * sums squared quarti-credits in decimal(38,0) (the gr3
    * HUGEINT-parity rule — Σm² overflows a long on long documents);
    * cosine divides the two exact integers once; ranks and RRF credits
    * are integers end to end.
    *
    * Scale shape: everything [[bm25TopK]] does, plus ONE
    * vocabulary-keyed equi-join (tf ⋈ df — the txt_tfidf shape) and a
    * doc-keyed norm aggregate joined back to the channel-bounded score
    * frame.
    */
  def rrfFusionTopK(
      documents: DataFrame,
      k0: Int = 60,
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 10,
      rankLo: Int = 12,
      nQueries: Int = 4,
      termsPerQuery: Int = 4,
      rankCutoff: Int = 100): DataFrame =
    rrfFusionTopKManaged(documents, k0, k1, b, topK, rankLo, nQueries,
      termsPerQuery, rankCutoff)._1

  /** [[rrfFusionTopK]] with the [[bm25TopKManaged]] cache-release
    * convention — the thunk unpersists the chain's tf frame after the
    * caller's final action (the dual top-R frame no longer persists:
    * the typed fusion pass is its single consumer).
    */
  def rrfFusionTopKManaged(
      documents: DataFrame,
      k0: Int = 60,
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 10,
      rankLo: Int = 12,
      nQueries: Int = 4,
      termsPerQuery: Int = 4,
      rankCutoff: Int = 100): (DataFrame, () => Unit) = {
    require(k0 > 0 && topK > 0 && rankCutoff >= topK,
      s"invalid rrf params ($k0, $topK, $rankCutoff)")
    val spark = documents.sparkSession
    import spark.implicits._
    val c = bm25Chain(documents, k1, b, rankLo, nQueries, termsPerQuery)
    val scores = c.hits.groupBy("qid", "doc_id")
      .agg(sum("s_micro").cast("long").as("bm25_micro"),
        sum("m_q4").cast("long").as("dot_q4"))
    // full-vocabulary tf-idf norm per document (the txt_tfidf join shape)
    val norms = c.tf.join(c.df, "term")
      .select(col("doc_id"),
        floor(col("tf") * log(lit(c.n) / col("df")) * lit(10000.0) + lit(0.5))
          .cast("long").as("m"))
      .groupBy("doc_id")
      .agg(sum((col("m") * col("m")).cast("decimal(38,0)")).as("n2"))
    val cs = scores.join(norms, "doc_id")
      .select(col("qid"), col("doc_id"), col("bm25_micro"),
        floor(col("dot_q4").cast("double") / sqrt(col("n2").cast("double"))
          * lit(1000000.0) + lit(0.5)).cast("long").as("cos_micro"))
    // BOTH bounded lists in one aggregate pass over the candidate
    // frame: each map partition reduces to ≤ rankCutoff entries per
    // (partition, qid, list) before the single qid exchange
    val topR = udaf(new graft.functions.TopKScoredAgg(rankCutoff))
    val both = cs.groupBy("qid")
      .agg(topR(col("bm25_micro"), col("doc_id")).as("t1"),
        topR(col("cos_micro"), col("doc_id")).as("t2"))
    // Fusion of two ALREADY-BOUNDED per-query lists is row-local work:
    // each row holds both top-R arrays (best-first — rank = position+1,
    // the aggregator's (score desc, id asc) order), so the RRF credit
    // sum, the per-list rank columns, and the final top-k all fold in
    // one typed pass over O(rankCutoff) entries. The pre-r18 form
    // unrolled both arrays, re-aggregated by (qid, doc), ranked through
    // a second bounded agg and broadcast-joined the rank columns back —
    // five more exchanges/jobs per run to recompute what each row
    // already contained. Scale shape: one row per query, O(R log R)
    // per row, parallel over queries — correct at a 4-query fixture and
    // at a million-query batch alike. Pure integer arithmetic, same
    // total order as the mirror's rank windows (credit desc, id asc).
    val kk0 = k0
    val tk = topK
    val out = both
      .select(col("qid").cast("long").as("qid"), col("t1"), col("t2"))
      .as[(Long, Array[graft.functions.ScoredId], Array[graft.functions.ScoredId])]
      .flatMap { case (qid, t1, t2) =>
        val r1 = t1.iterator.zipWithIndex
          .map { case (e, i) => e.id -> (i + 1) }.toMap
        val r2 = t2.iterator.zipWithIndex
          .map { case (e, i) => e.id -> (i + 1) }.toMap
        val fused = (r1.keySet ++ r2.keySet).toArray.map { id =>
          val a = r1.getOrElse(id, 0)
          val bb = r2.getOrElse(id, 0)
          // Σ_present 1e6 div (k0 + r): integer division, absent -> 0
          val credit = (if (a > 0) 1000000L / (kk0 + a) else 0L) +
            (if (bb > 0) 1000000L / (kk0 + bb) else 0L)
          (id, a, bb, credit)
        }
        fused.sortBy { case (id, _, _, cr) => (-cr, id) }.iterator
          .take(tk).zipWithIndex
          .map { case ((id, a, bb, cr), i) => (qid, i + 1, id, cr, a, bb) }
      }
      .toDF("qid", "rnk", "doc_id", "rrf_micro", "bm25_rnk", "cos_rnk")
    (out, () => { c.tf.unpersist(false); c.dl.unpersist(false); () })
  }

  /** BM25 postings index for a RELEASED corpus — the retrieval analog
    * of [[graft.operators.Dedup.minhashBands]]: the corpus tokenizes,
    * counts and joins ONCE at release; every later query batch probes
    * the frozen postings ([[probeBm25]]) without touching released text
    * again. One denormalized row per (term, doc): `(term, doc_id, tf,
    * df, dl)` — df/dl repeat per posting but columnar encoding makes
    * that near-free, and the probe needs zero joins beyond the
    * broadcast query-term lookup. The corpus-level stats (N, Σdl,
    * #docs) ride the `tf` column's schema metadata (the stamped-index
    * discipline: they survive the parquet footer, load with zero jobs,
    * and a probe against a foreign/unstamped frame fails fast instead
    * of silently mis-scoring).
    */
  def bm25Postings(documents: DataFrame): DataFrame =
    bm25PostingsManaged(documents)._1

  /** [[bm25Postings]] with the [[bm25TopKManaged]] cache-release
    * convention: the postings build persists its tf frame (three
    * consumers) and the returned index is LAZY, so loops call the
    * thunk after the index is written/consumed to release the cache.
    */
  def bm25PostingsManaged(documents: DataFrame): (DataFrame, () => Unit) = {
    val tok = Dedup.spread(documents.select(col("doc_id"), col("text")))
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val df = tf.groupBy("term").agg(count(lit(1)).cast("long").as("df"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").cast("long").as("dl"))
    // three bounded scalars collected once at build time — in ONE
    // driver job: the doc-count branch and the dl-stats branch union
    // into a single 2-row collect (they share the cached tf's shuffle
    // where they can; separate head() calls each paid job scheduling)
    // rows selected by the -1 marker, not by position: Union preserving
    // child order is an implementation detail, and a silent swap here
    // would stamp wrong n/sdl/nd into the persisted index metadata that
    // every probeBm25 scoring pass reads
    val st = dl.agg(sum("dl").cast("long").as("a"),
        count(lit(1)).cast("long").as("b"))
      .unionByName(documents.agg(count(lit(1)).cast("long").as("a"))
        .select(col("a"), lit(-1L).as("b")))
      .collect()
    val dlRow = st.find(_.getLong(1) != -1L).getOrElse(
      sys.error("bm25Postings: dl-stats row missing from stats collect"))
    val nRow = st.find(_.getLong(1) == -1L).getOrElse(
      sys.error("bm25Postings: doc-count row missing from stats collect"))
    val (sdl, nd) = (dlRow.getLong(0), dlRow.getLong(1))
    val n = nRow.getLong(0)
    val idx = Dedup.stampIndexMeta(
      tf.join(df, "term").join(dl, "doc_id")
        .select(col("term"), col("doc_id"), col("tf").cast("long").as("tf"),
          col("df"), col("dl")),
      "tf", "bm25_postings",
      Map("n" -> n, "sdl" -> sdl, "nd" -> nd))
    (idx, () => { tf.unpersist(false); () })
  }

  /** Probe a frozen [[bm25Postings]] index with NEW term queries
    * `(qid, term)` — the steady-state retrieval path: the index is a
    * parquet scan (plan-gated via the loader), query terms broadcast
    * into the postings equi-join, and scoring is the same
    * integer-micro-credit BM25 as [[bm25TopK]] (round per (term, doc)
    * BEFORE the per-doc sum). Out-of-vocabulary query terms match no
    * postings and contribute exactly 0 — standard BM25 OOV behavior.
    * Corpus stats come off the index stamp (zero jobs); a frame without
    * the `bm25_postings` stamp is rejected.
    */
  def probeBm25(
      postings: DataFrame,
      queries: DataFrame,
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 10): DataFrame = {
    require(topK > 0, s"invalid topK=$topK")
    val f = postings.schema.fields.find(_.name == "tf").getOrElse(
      throw new IllegalArgumentException(
        "probeBm25: frame lacks a 'tf' column — not a bm25_postings index"))
    require(f.metadata.contains(Dedup.IndexKindKey) &&
      f.metadata.getString(Dedup.IndexKindKey) == "bm25_postings",
      "probeBm25: frame carries no 'bm25_postings' stamp on 'tf' — " +
        "build it with bm25Postings/loadBm25Index, not ad hoc")
    val n = f.metadata.getLong("graft.n")
    val avgdl =
      f.metadata.getLong("graft.sdl").toDouble / f.metadata.getLong("graft.nd")
    val hits = postings
      .join(broadcast(queries.select(col("qid"), col("term"))), "term")
      .select(col("qid"), col("doc_id"),
        floor(
          log((lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
            * (col("tf") * lit(k1 + 1.0))
            / (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
            * lit(1000000.0) + lit(0.5)).cast("long").as("s_micro"))
    val scores = hits.groupBy("qid", "doc_id")
      .agg(sum("s_micro").cast("long").as("bm25_micro"))
    topKByGroup(scores, "qid", "bm25_micro", "doc_id", topK)
  }

  /** PII pattern scrubbing: redact emails and URLs, emit match counts
    * and the redacted text — the standard privacy pass before a corpus
    * ships. One narrow projection (regexp_replace/extract_all are
    * codegen'd row-local expressions, no shuffle).
    *
    * The patterns use only explicit character classes and `{m,}` /
    * `+` / `?` quantifiers — the regex subset on which Java's engine
    * (Spark) and RE2 (DuckDB) agree exactly, which is what makes the
    * pass oracle-checkable; `\s`-style perl classes differ between the
    * two engines and are deliberately avoided. The URL terminator is
    * the explicit whitespace class `[^ \t\r\n]` (not just space): raw
    * corpus text carries tabs and line breaks, and a space-only class
    * would swallow the newline plus the next word into the URL.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^ \\t\\r\\n]+"

  /** Text normalization — the first pass of every cleaning pipeline:
    * lowercase, collapse whitespace runs (space/tab/CR/LF — the
    * whitespace real corpus text actually contains) to a single space,
    * trim. Emits the normalized-text md5 (full-output check, like
    * [[redactPii]]), a changed flag and the length delta, so downstream
    * stages can measure how dirty the source was. One narrow codegen'd
    * projection, no shuffle; the regex uses only an explicit character
    * class + `+` quantifier — `[ \t\r\n]`, NOT perl `\s` (whose
    * membership differs between Java regex and RE2; the explicit class
    * is the Java/RE2-agreeing subset, same constraint as the PII
    * patterns).
    */
  val WhitespaceRun = "[ \\t\\r\\n]+"

  /** The normalization transform itself, as a reusable Column — the
    * single definition [[normalize]] reports on and
    * [[TrainingPipeline]] feeds downstream stages with (one source of
    * truth, so the report and the pipeline can't drift).
    */
  def normalizedText(t: Column): Column =
    trim(regexp_replace(lower(t), WhitespaceRun, " "))

  def normalize(
      documents: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val cleaned = normalizedText(t)
    documents.select(
      col(idCol),
      md5(cleaned).as("norm_md5"),
      (cleaned =!= t).as("changed"),
      (length(t) - length(cleaned)).cast("int").as("delta"))
  }

  /** C4-style heuristic line cleaning (the public C4 corpus recipe,
    * Raffel et al. 2020 §2.2, scaled down to SQL-mirrorable rules): a
    * line survives only if it has at least `minWords` words, ends in a
    * terminal punctuation mark (`. ! ? "`), contains no blocklisted
    * phrase (case-insensitive), and contains no curly brace (the
    * leaked-code/JSON tell). Emits the cleaned document plus per-doc
    * line counts — the line-level companion to
    * [[graft.operators.Dedup.paragraphDedup]]'s cross-document
    * frequency rule: these rules are row-LOCAL, so unlike
    * paragraphDedup there is no corpus aggregation at all.
    *
    * One narrow typed map — split, judge, rejoin per document, zero
    * shuffles at any corpus size. Word counting splits on single
    * spaces (exactly SQL-mirrorable, the [[Sampling.packSequences]]
    * convention).
    */
  val C4BadPhrases: Seq[String] = Seq("lorem ipsum", "javascript")
  private val C4Terminal = Set('.', '!', '?', '"')

  def c4LineFilter(
      documents: DataFrame,
      minWords: Int = 3,
      badPhrases: Seq[String] = C4BadPhrases,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minWords > 0, s"invalid minWords=$minWords")
    val spark = documents.sparkSession
    import spark.implicits._
    val mw = minWords
    val bad = badPhrases.map(_.toLowerCase)
    Dedup.spread(documents.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .map { case (id, text) =>
        val lines = text.split("\n").map(_.trim).filter(_.nonEmpty)
        val kept = lines.filter { ln =>
          val lower = ln.toLowerCase
          ln.split(" ").count(_.nonEmpty) >= mw &&
            C4Terminal.contains(ln.charAt(ln.length - 1)) &&
            !bad.exists(lower.contains) &&
            ln.indexOf('{') < 0 && ln.indexOf('}') < 0
        }
        (id, kept.mkString("\n"), lines.length.toLong,
          (lines.length - kept.length).toLong)
      }
      .toDF(idCol, "clean_text", "n_lines", "n_removed")
  }

  /** URL domain statistics: extract every URL's host and aggregate
    * per-domain occurrence and document counts — the source-analysis
    * pass behind domain-level curation (blocklists, per-domain quotas
    * via [[Sampling.quotaPerKey]], provenance reporting). ONE regex
    * scan of the text (group-1 extraction pulls the host directly —
    * the previous URL-extract-then-host-extract form compiled and ran
    * a second regex per URL) + one hash aggregation; the domain regex
    * uses only explicit character classes (the Java/RE2-agreeing
    * subset, like the PII patterns). Scheme-only junk ("https:///x")
    * has no host and yields no row — the direct extraction drops it
    * where the two-stage form counted it under an empty domain.
    */
  val DomainPattern = "https?://([^/ \\t\\r\\n]+)"

  def urlDomains(
      documents: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    documents
      .select(col(idCol),
        explode(regexp_extract_all(col(textCol), lit(DomainPattern), lit(1)))
          .as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col(idCol)).as("n_docs"))

  def redactPii(
      documents: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    // literal-prefilter short-circuit: EmailPattern can only match text
    // containing '@' and UrlPattern text containing "http", so rows
    // without the literal skip the Java-regex pass entirely (a regex
    // scan is ~100x a contains scan; most corpus rows contain neither).
    // Exact: a skipped pass can never have matched, and the email
    // replacement ("<EMAIL>") cannot introduce or remove "http" when
    // the original text had none.
    val hasAt = t.contains("@")
    val hasHttp = t.contains("http")
    val emailRedacted =
      when(hasAt, regexp_replace(t, EmailPattern, "<EMAIL>")).otherwise(t)
    documents.select(
      col(idCol),
      when(hasAt, size(regexp_extract_all(t, lit(EmailPattern), lit(0))))
        .otherwise(lit(0)).as("n_emails"),
      when(hasHttp, size(regexp_extract_all(t, lit(UrlPattern), lit(0))))
        .otherwise(lit(0)).as("n_urls"),
      md5(when(hasHttp, regexp_replace(emailRedacted, UrlPattern, "<URL>"))
        .otherwise(emailRedacted)).as("redacted_md5"))
  }

  /** Within-document repetition (a standard LLM-corpus quality signal:
    * high duplicate-n-gram ratios mark boilerplate/spam/generation
    * loops): total vs distinct word-3-grams and the duplicate ratio.
    *
    * Runs as a typed map with a native loop, NOT as array HOFs: a
    * `transform(sequence(...), i -> ... ws ...)` formulation
    * re-evaluates the free `ws` subexpression (the whole tokenization)
    * once per gram — O(tokens^2) per row, measured 20x slower at sf0.1
    * (the exact interpreted-HOF trap TextHashing documents). The typed
    * map is linear, allocation-light, and stays a narrow pass.
    */
  def repetition(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Dedup.spread(documents.select(col("doc_id").cast("long"), col("text")))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = graft.functions.TextHashing.tokens(text)
        val n = math.max(toks.length - 2, 0)
        val seen = new java.util.HashSet[String]()
        var i = 0
        while (i + 2 < toks.length) {
          seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2)): Unit
          i += 1
        }
        val d = seen.size
        val ratio =
          if (n > 0) graft.functions.TextHashing.round4(1.0 - d.toDouble / n) else 0.0
        (id, n, d, ratio)
      }
      .toDF("doc_id", "n_grams", "n_distinct", "rep_ratio")
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

  /** Top-K word bigrams by occurrence count (document frequency carried
    * along) — the n>1 companion to [[vocabulary]] for tokenizer-merge
    * statistics and collocation mining. Same scale shape: one narrow
    * bigram explode (typed map — the window-join formulation would
    * shuffle the token stream on (doc, position)), one hash aggregation
    * keyed by bigram (a bigram's stats are ONE row however common it
    * is), then TakeOrderedAndProject for the global top-K — never a
    * full sort. Deterministic tiebreak by bigram text.
    */
  def topBigrams(documents: DataFrame, topK: Int = 200): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Dedup.spread(documents.select(col("doc_id").cast("long"), col("text")))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = graft.functions.TextHashing.tokens(text)
        var i = 0
        val out = Array.newBuilder[(Long, String)]
        while (i + 1 < toks.length) {
          out += ((id, toks(i) + " " + toks(i + 1)))
          i += 1
        }
        out.result()
      }
      .toDF("doc_id", "bigram")
      .groupBy("bigram")
      .agg(count(lit(1)).as("n_occurrences"), countDistinct("doc_id").as("df"))
      .orderBy(col("n_occurrences").desc, col("bigram"))
      .limit(topK)
  }

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
    * (deterministic tiebreak by profile order). Pure rational arithmetic,
    * so the identical computation is SQL-expressible for the oracle; a
    * real system would swap in full character n-gram profiles, same
    * operator shape.
    *
    * One typed-map pass over the tokens: the column-expression form
    * evaluated the tokenization ~3x per language per row (interpreted
    * HOFs share no subexpressions) — the native loop tokenizes once and
    * scores all profiles from it.
    */
  def languageId(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val profiles = LangProfiles
    val profSets = profiles.map { case (_, st) => st.toSet }
    val scored = Dedup.spread(
      documents.select(col("doc_id").cast("long"), col("lang"), col("text")))
      .as[(Long, String, String)]
      .map { case (id, lang, text) =>
        val toks = graft.functions.TextHashing.tokens(text)
        val scores = profSets.map { set =>
          if (toks.isEmpty) 0.0
          else {
            var h = 0
            toks.foreach(t => if (set(t)) h += 1)
            graft.functions.TextHashing.round4(h.toDouble / toks.length)
          }
        }
        val best = scores.max
        val pred = if (best <= 0) "und" else profiles(scores.indexOf(best))._1
        (id, lang, pred, scores.toArray)
      }
      .toDF("doc_id", "labeled_lang", "predicted_lang", "scores")
    scored.select(
      Seq(col("doc_id"), col("labeled_lang"), col("predicted_lang")) ++
        profiles.zipWithIndex.map { case ((l, _), i) =>
          col("scores")(i).as(s"score_$l")
        }: _*)
  }

  /** Mojibake artifacts of UTF-8 text decoded as Latin-1/cp1252: the
    * lead bytes C3/E2-80/C2 become `Ã`/`â€`/`Â ` sequences. The
    * alternation covers the most common casualties (accented Latin
    * vowels, curly quote, non-breaking space); written with escapes so
    * the source file itself stays ASCII.
    */
  private val MojibakePattern =
    "\u00C3[\u00A9\u00A8\u00A4\u00BC]|\u00E2\u20AC[\u2122\u201C]|\u00C2 "

  /** Encoding-quality screen — the corpus pass that catches decode
    * damage before it trains in: per document, counts of U+FFFD
    * replacement characters (lossy decode), C0 control characters
    * (binary contamination; tab/newline/CR excluded), mojibake
    * sequences ([[MojibakePattern]]), and non-ASCII codepoints (the
    * denominator signal — legitimate for non-Latin scripts, which is
    * why it is reported, not flagged). `bad_encoding` marks documents
    * any lossy/contamination counter hits; a pipeline drops or
    * re-decodes those. Pure regexp_count projections — narrow,
    * codegen'd, zero-exchange, and exactly mirrorable (RE2 and Java
    * regex agree on every class used here).
    */
  def encodingQuality(
      documents: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val cnt = (pat: String) => regexp_count(t, lit(pat)).cast("long")
    documents.select(
      col(idCol),
      cnt("\\uFFFD").as("n_replacement"),
      cnt("[\\x01-\\x08\\x0B\\x0C\\x0E-\\x1F]").as("n_control"),
      cnt(MojibakePattern).as("n_mojibake"),
      cnt("[^\\x00-\\x7F]").as("n_nonascii"))
      .withColumn("bad_encoding",
        col("n_replacement") + col("n_control") + col("n_mojibake") > 0)
  }

  /** Unigram language-model score — the deterministic core of a
    * CCNet-style perplexity filter (Wenzek et al. 2020 bucket web text
    * by LM perplexity and keep the head; here the LM is a Laplace-
    * smoothed unigram model estimated from the corpus itself, so the
    * operator is self-contained and exactly SQL-mirrorable, where a
    * KenLM binary would not be). Output per doc: token count and
    * `bits_per_token` = mean -log2 p(w) — low bits = typical text,
    * high bits = rare-token soup (gibberish, OCR noise, exotic
    * boilerplate). p(w) = (c(w)+1)/(N+V) over corpus token count N and
    * vocab size V.
    *
    * Scale shape: the token stream first collapses to (doc, w, k) —
    * a doc+token-keyed agg with map-side partials that cuts the join
    * input 2-5× on real text AND breaks unigram Zipf skew (without it
    * "the" alone is ~5% of the join's probe rows; after it a hot token
    * contributes at most one row PER DOC, spread across doc
    * partitions). Corpus counts are ONE token-keyed shuffle over the
    * collapsed frame; (N, V) reduce to a single broadcast row; scoring
    * joins the collapsed frame to the count table keyed by token — a
    * broadcast join while the vocab fits (natural-language vocab grows
    * sublinearly, Heaps' law), degrading to a shuffle join beyond,
    * which AQE picks per-run; the per-doc mean is one more keyed agg
    * with each token's contribution k-weighted. Nothing driver-side,
    * no pair blowup anywhere.
    */
  def unigramLogProb(
      documents: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val tok = documents
      .select(col(idCol).cast("long").as("doc_id"),
        explode(tokens(col(textCol))).as("w"))
    val dtok = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("k"))
    val cnt = dtok.groupBy("w").agg(sum(col("k")).as("c"))
    val tot = cnt.agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
    val scored = dtok
      .join(cnt, "w")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("k"),
        (col("k") * log((col("c") + lit(1.0)) / (col("n") + col("v"))))
          .as("lp"))
    scored.groupBy("doc_id")
      .agg(sum(col("k")).as("n_tokens"),
        (-sum(col("lp")) / sum(col("k")) / log(lit(2.0))).as("bits"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("bits"), 4).as("bits_per_token"))
  }

  /** Signal-correlation audit: Pearson correlations between the cheap
    * per-doc curation signals (whitespace tokens, BPE-ish token count,
    * char volume, the quality score) — the signal-redundancy review a
    * filter stack needs before adding a new rule ("does this signal
    * carry information the others don't?"). One row out.
    *
    * Scale shape: one narrow projection feeding a single global agg;
    * Spark's `corr` is a partial-aggregable co-moment accumulator
    * (map-side combine, constant state per partition), so the whole
    * audit is one pass and one single-row exchange. Round-4 absorbs
    * accumulation-order drift vs other engines.
    */
  def signalCorrelations(documents: DataFrame): DataFrame = {
    val words = tokens(col("text"))
    val nw = size(words)
    val q = when(nw > 0,
      graft.functions.GraftFunctions.round4(
        size(filter(words, w => w.isin(Stopwords: _*))).cast("double") / nw * 0.5
          + least(nw, lit(100)).cast("double") / 100 * 0.5))
      .otherwise(0.0)
    documents.select(
        nw.cast("double").as("t"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))
          .cast("double").as("b"),
        col("n_chars").cast("double").as("c"),
        q.as("q"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(corr(col("t"), col("b")), 4).as("corr_ws_bpe"),
        round(corr(col("t"), col("c")), 4).as("corr_ws_chars"),
        round(corr(col("q"), col("t")), 4).as("corr_quality_ws"))
  }

  /** Tokenizer fertility audit: per-group BPE-tokens-per-word — the
    * tokenizer-QA number multilingual pipelines track (a language whose
    * fertility is 2-3× the corpus mean is under-served by the merge
    * table: its texts cost that many more context slots per word, and
    * the usual fix is re-weighting the tokenizer training mix). One
    * row per group: doc/word/BPE-token volumes and
    * `fertility = n_bpe_tokens / n_words` (round-4; 0 for a group with
    * no words).
    *
    * Scale shape: [[bpeTokenize]]'s narrow zero-exchange pass joined
    * doc-keyed to the (group, id) projection, then ONE group-keyed agg
    * with map-side partials — #groups rows out.
    */
  def tokenizerFertility(
      documents: DataFrame,
      merges: Seq[(String, String)],
      groupCol: String = "lang",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = bpeTokenize(documents, merges, idCol, textCol)
      .select(col(idCol), col("n_words"), col("n_bpe_tokens"))
    documents.select(col(idCol).cast("long").as(idCol), col(groupCol))
      .join(toks, idCol)
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_bpe_tokens")).as("n_bpe_tokens"))
      .withColumn("fertility",
        when(col("n_words") > 0,
          round(col("n_bpe_tokens").cast("double") / col("n_words"), 4))
          .otherwise(0.0))
  }

  /** A trained corpus unigram LM: the token count table plus its
    * totals — the artifact a released corpus ships so steady-state
    * perplexity screening never re-estimates the model (the production
    * CCNet shape: the LM is trained ONCE on the reference corpus and
    * every incoming batch is scored against it). `counts` is
    * vocabulary-sized (Heaps' law), (n, v) are the Laplace denominator
    * terms frozen at training time.
    */
  final case class UnigramLm(counts: DataFrame, n: Long, v: Long)

  /** Estimate the unigram LM [[unigramLogProb]] builds internally, as
    * a reusable artifact: one (doc, w)-collapsed pass + one token-keyed
    * shuffle; the totals reduce to a single collected row. Persist with
    * [[TrainingPipeline.writeUnigramLm]].
    */
  def trainUnigramLm(
      documents: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): UnigramLm = {
    val dtok = documents
      .select(col(idCol).cast("long").as("doc_id"),
        explode(tokens(col(textCol))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("k"))
    val cnt = dtok.groupBy("w").agg(sum(col("k")).as("c"))
    val tot = cnt.agg(sum(col("c")), count(lit(1))).head()
    UnigramLm(cnt, tot.getLong(0), tot.getLong(1))
  }

  /** Score documents against a FIXED unigram LM — the steady-state
    * twin of [[unigramLogProb]] (which re-estimates the model from its
    * own input every call). Tokens outside the LM's vocabulary get the
    * Laplace floor c = 0 (the LEFT join the self-trained form never
    * needs); the denominator stays the trained (n + v), so scores are
    * comparable across batches — exactly why a release freezes the LM.
    * Same Zipf hardening: the (doc, w, k) collapse feeds the count
    * join, a hot token costs one probe row per doc.
    */
  def unigramLogProbWith(
      documents: DataFrame,
      lm: UnigramLm,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val dtok = documents
      .select(col(idCol).cast("long").as("doc_id"),
        explode(tokens(col(textCol))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("k"))
    val scored = dtok
      .join(lm.counts, Seq("w"), "left")
      .select(col("doc_id"), col("k"),
        (col("k") * log((coalesce(col("c"), lit(0L)) + lit(1.0))
          / lit((lm.n + lm.v).toDouble))).as("lp"))
    scored.groupBy("doc_id")
      .agg(sum(col("k")).as("n_tokens"),
        (-sum(col("lp")) / sum(col("k")) / log(lit(2.0))).as("bits"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("bits"), 4).as("bits_per_token"))
  }

  /** Bigram language-model score — [[unigramLogProb]] with one token of
    * context: per doc, `bits_per_token` = mean -log2 p(w_i | w_{i-1})
    * under a Laplace-smoothed bigram model estimated from the corpus
    * itself, p(b|a) = (c(a,b)+1)/(c(a)+V). Bigram surprisal separates
    * scrambled/boilerplate text from fluent text far more sharply than
    * unigram frequency (word-salad has typical WORDS but atypical
    * TRANSITIONS); the first token has no context and only transitions
    * are scored — docs under 2 tokens get 0 transitions and 0 bits.
    *
    * Scale shape mirrors txt_ppl's hardened form one order up: a typed
    * narrow pass emits adjacent pairs, which collapse IMMEDIATELY to
    * (doc, a, b, k) — a hot bigram ("of the") costs one row per doc,
    * not one per occurrence, before anything joins. Corpus bigram
    * counts are one (a, b)-keyed shuffle over the collapsed frame;
    * history counts c(a) FOLD INTO the (a, b) join while the vocab fits
    * `maxBroadcastVocab` (Heaps' law keeps natural-language vocab far
    * under it at any corpus size): c1 is computed once, collected
    * (gate-bounded), and served as a broadcast side of the c2 table, so
    * the scored frame never re-shuffles on the raw history token — the
    * single-key exchange where txt_ppl's Zipf head ("the" as history,
    * ~5% of distinct-bigram rows) would reappear one order down. Beyond
    * the gate the operator degrades to the two keyed joins with AQE
    * skew handling. The per-doc mean is a final doc-keyed agg,
    * k-weighted.
    */
  def bigramLogProb(
      documents: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxBroadcastVocab: Long = 2000000L): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val base = documents.select(col(idCol).cast("long").as("doc_id"), col(textCol))
    val pairs = Dedup.spread(base)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = graft.functions.TextHashing.tokens(text)
        val out = new Array[(Long, String, String)](math.max(t.length - 1, 0))
        var i = 0
        while (i + 1 < t.length) { out(i) = (id, t(i), t(i + 1)); i += 1 }
        out
      }
      .toDF("doc_id", "pa", "pb")
      // tokens leave the narrow pass as 64-bit avalanche hashes: every
      // downstream exchange/join shuffles two longs instead of two
      // strings (~2-3x fewer bytes on natural text). Distinct tokens
      // colliding would merge their counts — at a 2M-vocab gate the
      // probability is ~V^2/2^65 < 1e-7, the same accepted bound as the
      // SimHash/MinHash signature families.
      .select(col("doc_id"), xxhash64(col("pa")).as("ha"),
        xxhash64(col("pb")).as("hb"))
    val dt = pairs.groupBy("doc_id", "ha", "hb").agg(count(lit(1)).as("k"))
    val c2 = dt.groupBy("ha", "hb").agg(sum(col("k")).as("c2"))
    val tok = base.select(explode(tokens(col(textCol))).as("w"))
      .select(xxhash64(col("w")).as("ha"))
    val c1 = tok.groupBy("ha").agg(count(lit(1)).as("c1"))
    // gate probe = limit(gate + 1) in ONE job whose rows ARE the
    // history table when the vocab fits (r19: the previous
    // persist -> count -> collect chain paid two driver jobs for the
    // same information)
    val head = c1.limit(math.min(maxBroadcastVocab, Int.MaxValue - 1L).toInt + 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val lpRows =
      if (head.length <= maxBroadcastVocab) {
        // history fold: c1 is vocab-sized — broadcast it INTO the c2
        // table, so the scored frame joins once on (pa, pb) and never
        // exchanges on the raw history token. V is the exact
        // driver-side count.
        val vocab = head.length.toLong
        val c1Local = head.toSeq.toDF("ha", "c1")
        val c2x = c2.join(broadcast(c1Local), Seq("ha"))
        dt.join(c2x, Seq("ha", "hb"))
          .select(col("doc_id"), col("k"),
            (col("k") * log((col("c2") + lit(1.0)) / (col("c1") + lit(vocab.toDouble))))
              .as("lp"))
      } else {
        // vocab over the broadcast gate (non-linguistic key spaces):
        // two keyed joins, AQE skew-join on the Zipf head; c1 persists
        // here for its two consumers (the join and V)
        c1.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val vv = c1.agg(count(lit(1)).as("v"))
        dt.join(c2, Seq("ha", "hb"))
          .join(c1, Seq("ha"))
          .crossJoin(broadcast(vv))
          .select(col("doc_id"), col("k"),
            (col("k") * log((col("c2") + lit(1.0)) / (col("c1") + col("v"))))
              .as("lp"))
      }
    val scored = lpRows
      .groupBy("doc_id")
      .agg(sum(col("k")).as("n_trans"),
        (-sum(col("lp")) / sum(col("k")) / log(lit(2.0))).as("bits"))
    base.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trans"), lit(0L)).as("n_trans"),
        coalesce(round(col("bits"), 4), lit(0.0)).as("bits_per_token"))
  }

  /** Interpolated Kneser-Ney bigram score (Kneser & Ney 1995; Chen &
    * Goodman 1998's interpolated form — the KenLM default, public
    * algorithm) — the production-grade refinement of
    * [[bigramLogProb]]'s Laplace smoothing:
    *
    *   p(b|a) = max(c(a,b) − D, 0)/c(a·) + D·N₁₊(a,·)/c(a·) · p_cont(b)
    *   p_cont(b) = N₁₊(·,b) / N₁₊(·,·)
    *
    * with fixed discount D (0.75, the textbook value), history mass
    * c(a·) = Σ_b c(a,b), and the continuation distribution asking "how
    * many distinct histories precede b" rather than "how often does b
    * occur" — the correction that stops high-frequency-but-predictable
    * tokens ("Francisco") from leaking probability into novel contexts.
    * Self-trained on the scored corpus (the txt_ppl convention), so
    * every scored transition has c(a,b) ≥ 1 and p ∈ (0, 1) strictly.
    *
    * Cross-engine exactness: per (doc, a, b) row the k-weighted
    * surprisal rounds to integer MICRO-nats (`floor(k·(−ln p)·1e6+0.5)`,
    * −ln p > 0 so the x ≥ 0 emit rule applies) BEFORE the per-doc sum —
    * integer sums are partition-order-free where the txt_ppl family's
    * double sums lean on the final 4-dp round; one division chain at
    * the end.
    *
    * Scale shape: [[bigramLogProb]]'s hardened form — one narrow typed
    * pair pass collapsing immediately to (doc, a, b, k), one
    * (a, b)-keyed count exchange, and then ONLY vocab-sized frames:
    * c(a·)/N₁₊(a,·) fold into a single history agg, N₁₊(·,b) into a
    * continuation agg, both broadcast (Heaps' law keeps them far under
    * any broadcast gate on natural text) into the c2 table so the
    * scored frame joins once on (a, b) and never re-shuffles on a raw
    * token. The bigram-type frame persists for its four consumers —
    * callers that loop use [[knBigramLogProbManaged]]'s release hook.
    */
  def knBigramLogProb(
      documents: DataFrame,
      discount: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    knBigramLogProbManaged(documents, discount, idCol, textCol)._1

  /** [[knBigramLogProb]] with the [[bm25TopKManaged]] cache-release
    * convention for the persisted bigram-type frame.
    */
  def knBigramLogProbManaged(
      documents: DataFrame,
      discount: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxBroadcastVocab: Long = 2000000L): (DataFrame, () => Unit) = {
    require(discount > 0.0 && discount < 1.0, s"invalid discount=$discount")
    val spark = documents.sparkSession
    import spark.implicits._
    val base = documents.select(col(idCol).cast("long").as("doc_id"), col(textCol))
    val pairs = Dedup.spread(base)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = graft.functions.TextHashing.tokens(text)
        val out = new Array[(Long, String, String)](math.max(t.length - 1, 0))
        var i = 0
        while (i + 1 < t.length) { out(i) = (id, t(i), t(i + 1)); i += 1 }
        out
      }
      .toDF("doc_id", "pa", "pb")
      // 64-bit token hashes on every exchange (the bigramLogProb rule;
      // collision bound ~V²/2⁶⁵, the accepted signature-family bound)
      .select(col("doc_id"), xxhash64(col("pa")).as("ha"),
        xxhash64(col("pb")).as("hb"))
    // doc-keyed bigram counts: TWO consumers (the type fold below and
    // the scored join) — persisted so the corpus tokenize + pair
    // flatMap (the dominant cost at TB scale) runs exactly once;
    // released via the hook alongside c2/stats
    val dt = pairs.groupBy("doc_id", "ha", "hb").agg(count(lit(1)).as("k"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // bigram TYPES: four consumers (history agg, continuation agg, the
    // type total, the score join) — persisted, released via the hook
    val c2 = dt.groupBy("ha", "hb").agg(sum(col("k")).as("c2"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // ONE union-keyed stats pass over the persisted types frame covers
    // BOTH estimator tables — history (role 0: c(a·), N₁₊(a,·)) and
    // continuation (role 1: N₁₊(·,b)) — instead of two separate
    // aggregate jobs; the type total follows on the driver
    // (N₁₊(·,·) = Σ_a N₁₊(a,·)). The stats frame is vocab-sized, so it
    // localizes under the bigramLogProb gate (eager persist → count →
    // collect → unpersist); beyond the gate everything stays a
    // distributed frame with one more type-count aggregate.
    val stats = c2.select(col("ha").as("h"), lit(0).as("role"), col("c2"))
      .unionByName(c2.select(col("hb").as("h"), lit(1).as("role"), col("c2")))
      .groupBy("h", "role").agg(sum("c2").as("cs"), count(lit(1)).as("n1"))
    // gate probe = limit(gate + 1) in ONE job whose rows ARE both
    // estimator tables when the vocab fits (r19: previously a
    // persist -> count -> collect chain, two jobs for the same rows)
    val statsGate = 2L * maxBroadcastVocab
    val statsHead = stats
      .limit(math.min(statsGate, Int.MaxValue - 1L).toInt + 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val smallVocab = statsHead.length <= statsGate
    lazy val statsP =
      stats.persist(StorageLevel.MEMORY_AND_DISK)
    val (hist, cont, ntot: Column) =
      if (smallVocab) {
        val h = statsHead.filter(_._2 == 0).map(r => (r._1, r._3, r._4))
        val c = statsHead.filter(_._2 == 1).map(r => (r._1, r._4))
        (h.toSeq.toDF("ha", "ca", "n1a"), c.toSeq.toDF("hb", "n1b"),
          lit(h.map(_._3).sum))
      } else {
        (statsP.filter(col("role") === 0)
           .select(col("h").as("ha"), col("cs").as("ca"), col("n1").as("n1a")),
         statsP.filter(col("role") === 1)
           .select(col("h").as("hb"), col("n1").as("n1b")),
         col("n1tot"))
      }
    // broadcast() ONLY in the small-vocab branch (driver-collected,
    // vocab-bounded frames); beyond the gate hist/cont are >2M-row
    // distributed slices of `stats` — broadcasting them would collect
    // the very frames the gate exists to keep off the driver, so the
    // fallback joins on the (ha)/(hb) shuffle keys instead
    val c2j =
      if (smallVocab) c2.join(broadcast(hist), Seq("ha"))
        .join(broadcast(cont), Seq("hb"))
      else c2.join(hist, Seq("ha")).join(cont, Seq("hb"))
    val c2x =
      if (smallVocab) c2j
      else c2j.crossJoin(broadcast(c2.agg(count(lit(1)).as("n1tot"))))
    val p = greatest(col("c2") - lit(discount), lit(0.0)) / col("ca") +
      lit(discount) * col("n1a") / col("ca") * (col("n1b") / ntot)
    val scored = dt.join(c2x, Seq("ha", "hb"))
      .select(col("doc_id"), col("k"),
        floor(col("k") * (-log(p)) * lit(1000000.0) + lit(0.5))
          .cast("long").as("mic"))
      .groupBy("doc_id")
      .agg(sum("k").cast("long").as("n_trans"),
        round(sum("mic").cast("long") / lit(1000000.0)
          / sum("k").cast("long") / log(lit(2.0)), 4).as("bits"))
    val out = base.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trans"), lit(0L)).as("n_trans"),
        coalesce(col("bits"), lit(0.0)).as("bits_per_token"))
    (out, () => {
      dt.unpersist(false); c2.unpersist(false)
      if (!smallVocab) statsP.unpersist(false)
      ()
    })
  }

  /** Hashed-feature linear quality classifier — the Spark plumbing of a
    * fasttext-style filter (hash each token into a D-bucket weight
    * table, average the weights, threshold), the shape used for e.g.
    * Wikipedia-vs-CommonCrawl quality models. Real deployments load
    * trained weights; weights here are derived DETERMINISTICALLY from
    * the bucket index by an LCG step, which keeps the operator
    * self-contained and oracle-checkable while exercising the exact
    * runtime path a trained table would use (swap `weightOf` for a
    * broadcast lookup and nothing else changes).
    *
    * Everything is integer hashing + one average: a single narrow
    * codegen'd pass over the corpus, ZERO exchanges before the final
    * agg — the cheapest possible model-based filter at 100 TB.
    * Hashing reuses [[graft.functions.TextHashing.poly32]]'s avalanche
    * (via the SQL-mirrorable expression form used by the signature
    * mirrors).
    */
  def linearQualityScore(
      documents: DataFrame,
      dim: Int = 1024,
      threshold: Double = 0.0,
      idCol: String = "doc_id",
      textCol: String = "text",
      weights: Option[DataFrame] = None): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    require(dim > 0, s"invalid dim=$dim")
    val d = dim
    val th = threshold
    // Trained-table swap-in: a (bucket, weight) frame — dim-sized by
    // construction (fasttext-style tables are the hash dimension, not
    // the corpus) — collected into a broadcast array the typed map
    // indexes instead of the LCG formula. Missing buckets weigh 0.
    // Nothing else changes: same hashing, same mean, same plan shape
    // (the lookup is a broadcast read, not a join — the pass stays
    // zero-exchange; spec-pinned).
    val table: Option[org.apache.spark.broadcast.Broadcast[Array[Double]]] =
      weights.map { wdf =>
        val arr = new Array[Double](d)
        wdf.select(col("bucket").cast("long"), col("weight").cast("double"))
          .collect().foreach { r =>
            val b = r.getLong(0)
            require(b >= 0 && b < d, s"weight bucket $b outside [0, $d)")
            arr(b.toInt) = r.getDouble(1)
          }
        spark.sparkContext.broadcast(arr)
      }
    val scored = Dedup.spread(
      documents.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = graft.functions.TextHashing.tokens(text)
        val wArr = table.map(_.value).orNull
        var s = 0.0
        var i = 0
        while (i < toks.length) {
          val bucket = graft.functions.TextHashing.poly32(toks(i), 97L) % d
          // LCG-derived weight in [-1, 1): deterministic stand-in for a
          // trained table, identical in the SQL mirror
          val w =
            if (wArr != null) wArr(bucket.toInt)
            else ((bucket * 1103515245L + 12345L) % (2L * d)).toDouble / d - 1.0
          s += w
          i += 1
        }
        val margin = if (toks.isEmpty) 0.0 else s / toks.length
        (id, toks.length.toLong, graft.functions.TextHashing.round4(margin))
      }
      .toDF("doc_id", "n_tokens", "margin")
    scored.withColumn("keep", col("margin") > lit(th))
  }

  /** Round half away from zero at 6 dp — the gradient/weight precision
    * [[trainQualityWeights]] pins per iteration so both engines walk
    * bit-identical weight trajectories (DuckDB `round(x, 6)` parity;
    * the [[graft.functions.TextHashing.round4]] floor trick, two more
    * digits).
    */
  private[operators] def round6(x: Double): Double =
    math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6

  /** TRAIN the hashed-feature quality filter's weight table — the
    * missing half of [[linearQualityScore]]'s trained-table swap-in:
    * a linear probe over the same hashed bag-of-words features
    * (bucket = poly32(token, 97) % dim, value = occurrence fraction,
    * so margin = the exact mean [[linearQualityScore]] computes), fit
    * by full-batch gradient descent on squared loss. The logistic link
    * is deliberately omitted: `exp` is not correctly-rounded and
    * differs across libms, which would break exact cross-engine
    * mirroring — a linear probe is the standard cheap quality filter
    * shape and trains the identical feature pipeline; swap the link in
    * production if calibrated probabilities are needed.
    *
    * Determinism: no randomness anywhere (init w = 0, fixed lr/iters),
    * and both the mean gradient and the updated weight are rounded at
    * 6 dp per iteration, so the weight trajectory is identical across
    * engines and partitionings (an unrounded float sum's association
    * order could drift an ulp; the rounding absorbs it).
    *
    * Scale shape: ONE narrow pass builds the (doc, bucket, x)
    * incidence frame — vocabulary-bounded per doc — persisted
    * PRE-PARTITIONED on doc_id, so each iteration costs: a broadcast
    * join against the dim-sized weight table + an exchange-free
    * doc-keyed margin agg + an exchange-free doc-keyed error join +
    * ONE bucket-keyed gradient exchange, then a dim-sized driver
    * collect. The driver only ever holds the weight vector (dim
    * doubles); iterations are O(iters) jobs, not O(iters) corpus
    * scans.
    */
  def trainQualityWeights(
      documents: DataFrame,
      dim: Int = 1024,
      iters: Int = 3,
      lr: Double = 0.5,
      idCol: String = "doc_id",
      textCol: String = "text",
      labelCol: String = "label"): DataFrame = {
    require(dim > 0 && iters >= 1 && lr > 0, s"invalid dim=$dim iters=$iters lr=$lr")
    val spark = documents.sparkSession
    import spark.implicits._
    val d = dim
    val inc = Dedup.spread(documents.select(
        col(idCol).cast("long"), col(textCol), col(labelCol).cast("double")))
      .as[(Long, String, Double)]
      .flatMap { case (id, text, y) =>
        val toks = graft.functions.TextHashing.tokens(text)
        if (toks.isEmpty) Iterator.empty
        else {
          val counts = new scala.collection.mutable.HashMap[Int, Int]
          toks.foreach { t =>
            val b = (graft.functions.TextHashing.poly32(t, 97L) % d).toInt
            counts.update(b, counts.getOrElse(b, 0) + 1)
          }
          val n = toks.length.toDouble
          counts.iterator.map { case (b, k) => (id, b, k / n, y) }
        }
      }
      .toDF("doc_id", "bucket", "x", "y")
      .repartition(col("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val nDocs = inc.select("doc_id").distinct().count().toDouble
      var w = new Array[Double](d)
      var it = 0
      while (it < iters) {
        val wDf = w.zipWithIndex.map { case (v, b) => (b, v) }.toSeq
          .toDF("bucket", "weight")
        val err = inc.join(broadcast(wDf), "bucket")
          .groupBy("doc_id")
          .agg(first(col("y")).as("y"),
            sum(col("x") * col("weight")).as("margin"))
          .select(col("doc_id"), (col("margin") - col("y")).as("err"))
        val grad = inc.join(err, "doc_id")
          .groupBy("bucket")
          .agg(sum(col("x") * col("err")).as("g"))
          .collect()
        val gArr = new Array[Double](d)
        grad.foreach(r => gArr(r.getInt(0)) = r.getDouble(1))
        w = Array.tabulate(d)(b => round6(w(b) - lr * round6(gArr(b) / nDocs)))
        it += 1
      }
      // LocalRelation, not parallelize: plan-only weights table
      w.zipWithIndex.collect { case (v, b) if v != 0.0 => (b.toLong, v) }
        .toSeq.toDF("bucket", "weight")
    } finally { inc.unpersist(); () }
  }

  /** ITERATION-BATCHED twin of [[trainQualityWeights]]: collect the
    * sufficient statistics ONCE — the hashed-feature Gram matrix
    * A = XᵀX (at most dim² = ~1M doubles at the default 1024), the
    * label projection c = Xᵀy (dim-sized) and the doc count — then run
    * EVERY gradient step driver-side against them:
    * g = round6((A·w − c)/N), w ← round6(w − lr·g), the identical 6-dp
    * trajectory contract (spec-pinned equal to the iterative path).
    * Job count is O(1) in `iters` instead of one job chain per
    * iteration — the fix for iteration-job constants dominating
    * wall-time when `iters` grows (tr1's 3.9× vs its mirror at sf0.1
    * was all per-job scheduling, not data work).
    *
    * GUARD — when to use which: the Gram emission costs Σᵢ Vᵢ² narrow
    * rows (Vᵢ = distinct buckets of doc i, ≤ dim) against the
    * iterative path's Σᵢ Vᵢ per iteration, so batching wins when
    * iters ≳ mean(Vᵢ) or when per-job constants dominate (interactive
    * sessions, small corpora, many iterations); the iterative path
    * stays the default for few-iteration corpus-scale runs. The
    * collect is bounded by dim² regardless of corpus size.
    */
  def trainQualityWeightsBatched(
      documents: DataFrame,
      dim: Int = 1024,
      iters: Int = 3,
      lr: Double = 0.5,
      idCol: String = "doc_id",
      textCol: String = "text",
      labelCol: String = "label"): DataFrame = {
    require(dim > 0 && iters >= 1 && lr > 0, s"invalid dim=$dim iters=$iters lr=$lr")
    val spark = documents.sparkSession
    import spark.implicits._
    val d = dim
    // one narrow pass emits, per doc: the Vᵢ² Gram cells (b, b', x·x'),
    // the Vᵢ label cells (b, -1, x·y), and one count cell (-1, -1, 1) —
    // map-side partial sums collapse them; ONE exchange keyed (b, b')
    val stats = Dedup.spread(documents.select(
        col(idCol).cast("long"), col(textCol), col(labelCol).cast("double")))
      .as[(Long, String, Double)]
      .flatMap { case (_, text, y) =>
        val toks = graft.functions.TextHashing.tokens(text)
        if (toks.isEmpty) Iterator.empty
        else {
          val counts = new scala.collection.mutable.HashMap[Int, Int]
          toks.foreach { t =>
            val b = (graft.functions.TextHashing.poly32(t, 97L) % d).toInt
            counts.update(b, counts.getOrElse(b, 0) + 1)
          }
          val n = toks.length.toDouble
          val cells = counts.toArray
          val out = Iterator.newBuilder[(Int, Int, Double)]
          var i = 0
          while (i < cells.length) {
            val (bi, ki) = cells(i)
            val xi = ki / n
            var j = 0
            while (j < cells.length) {
              val (bj, kj) = cells(j)
              out += ((bi, bj, xi * (kj / n)))
              j += 1
            }
            out += ((bi, -1, xi * y))
            i += 1
          }
          out += ((-1, -1, 1.0))
          out.result()
        }
      }
      .toDF("b", "b2", "v")
      .groupBy("b", "b2").agg(sum(col("v")).as("v"))
      .collect()
    val gram = Array.ofDim[Double](d, d)
    val cVec = new Array[Double](d)
    var nDocs = 0.0
    stats.foreach { r =>
      val b = r.getInt(0); val b2 = r.getInt(1); val v = r.getDouble(2)
      if (b < 0) nDocs = v
      else if (b2 < 0) cVec(b) = v
      else gram(b)(b2) = v
    }
    require(nDocs > 0, "no labeled docs with tokens")
    var w = new Array[Double](d)
    var it = 0
    while (it < iters) {
      w = Array.tabulate(d) { b =>
        val row = gram(b)
        var g = 0.0
        var b2 = 0
        while (b2 < d) { g += row(b2) * w(b2); b2 += 1 }
        round6(w(b) - lr * round6((g - cVec(b)) / nDocs))
      }
      it += 1
    }
    // LocalRelation, not parallelize: plan-only weights table
    w.zipWithIndex.collect { case (v, b) if v != 0.0 => (b.toLong, v) }
      .toSeq.toDF("bucket", "weight")
  }

  /** Character-level statistics screen — the cheap "is this text or
    * noise" signals a pipeline runs before any token-level work:
    *   - `entropy_bits`: Shannon entropy of the character distribution
    *     (≈4.1 for English prose; ≪ for repeated filler like
    *     "aaaa...", ≈lg(charset) for random bytes — both tails are
    *     drop candidates);
    *   - `gram4_distinct / gram4_total` (`gram4_ratio`): distinct
    *     4-char-gram fraction, a deterministic stand-in for the gzip
    *     compression-ratio screen (low ratio = highly compressible =
    *     templated/repetitive text) that needs no codec dependency.
    * One narrow typed pass with native loops; empty/short docs get
    * entropy 0 and ratio 1 (nothing repeats in them).
    */
  def charStats(
      documents: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    Dedup.spread(documents.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .map { case (id, text) =>
        // CODEPOINT semantics throughout (not UTF-16 code units) — the
        // DuckDB mirror's string_split(text,'')/substr/length are all
        // codepoint-based, so astral-plane chars (emoji, supplementary
        // CJK) must count as ONE character here too
        val n = text.codePointCount(0, text.length)
        val counts = new scala.collection.mutable.HashMap[Int, Int]
        var i = 0
        while (i < text.length) {
          val cp = text.codePointAt(i)
          counts(cp) = counts.getOrElse(cp, 0) + 1
          i += Character.charCount(cp)
        }
        val e =
          if (n == 0) 0.0
          else -counts.valuesIterator.map { f =>
            val p = f.toDouble / n; p * math.log(p) / math.log(2)
          }.sum
        val total = math.max(n - 3, 0)
        val seen = new scala.collection.mutable.HashSet[String]
        if (total > 0) {
          // UTF-16 offset of each codepoint start, so 4-codepoint grams
          // slice by offset without re-scanning
          val off = new Array[Int](n + 1)
          var k = 0
          var o = 0
          while (k < n) { off(k) = o; o = text.offsetByCodePoints(o, 1); k += 1 }
          off(n) = text.length
          var j = 0
          while (j < total) { seen += text.substring(off(j), off(j + 4)); j += 1 }
        }
        val ratio = if (total == 0) 1.0 else seen.size.toDouble / total
        (id, n.toLong, graft.functions.TextHashing.round4(e),
          total.toLong, seen.size.toLong, graft.functions.TextHashing.round4(ratio))
      }
      .toDF("doc_id", "n_chars_obs", "entropy_bits",
        "gram4_total", "gram4_distinct", "gram4_ratio")
  }

  /** Per-source corpus card — the summary table a corpus release ships
    * (the "datasheet" row per source: volume, vocabulary, quality,
    * short-doc exposure). One row per source:
    *   - `n_docs`, `n_tokens`: volume in both units;
    *   - `n_langs`: distinct language tags;
    *   - `vocab`: distinct whitespace tokens (exact — the per-source
    *     type count Heaps'-law sizing reads off);
    *   - `mean_quality`: mean of the per-doc [[quality]] score;
    *   - `n_short`: docs under the Gopher 25-word floor (how much of
    *     the source a length rule would drop).
    *
    * Scale shape: the doc-level signals are one narrow pass feeding a
    * source-keyed agg (map-side partials; #sources rows out); vocab is
    * a (source, token)-keyed distinct then a source-keyed count — the
    * standard two-exchange exact-distinct, joined back broadcast
    * because the card is dimension-sized by construction.
    */
  /** Length-distribution audit: per-group percentiles of the per-doc
    * whitespace-token count — the release-datasheet numbers that size
    * packing budgets and chunking windows ([[Sampling.packSequences]] /
    * [[Sampling.chunkDocuments]] read their budget choices off exactly
    * this table). One row per group: (group, n_docs, p10, p50, p90).
    *
    * EXACT form (this function): Spark's `percentile` — linear
    * interpolation at rank p*(n-1), the same definition as DuckDB's
    * `quantile_cont`, so the mirror matches bit-for-bit after round-4.
    * Exact percentile buffers each group's values, so this is the
    * audit/oracle form for dimension-bounded groups (languages,
    * sources). At corpus scale use [[lengthQuantilesApprox]]: mergeable
    * bounded-memory sketches, map-side combinable — the q10/q10b
    * exact-vs-approx pairing applied to quantiles.
    */
  def lengthQuantiles(
      documents: DataFrame,
      groupCol: String = "lang",
      textCol: String = "text",
      probs: Seq[Double] = Seq(0.1, 0.5, 0.9)): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probs must be non-empty fractions in [0, 1]: $probs")
    lengthStats(documents, groupCol, textCol).groupBy(groupCol).agg(
      count(lit(1)).as("n_docs"),
      probs.map(p => round(percentile(col("nw"), lit(p)), 4)
        .as(s"p${(p * 100).round}")): _*)
  }

  /** The corpus-scale twin of [[lengthQuantiles]]: `approx_percentile`
    * (Greenwald-Khanna summaries — bounded memory per group, partial
    * aggregation across partitions; returns an observed value within
    * `1/accuracy` rank error of the true quantile, so no interpolation).
    * Spec-pinned against the exact form on the gate fixture; not
    * SQL-mirrored because the sketch's value choice is engine-specific
    * — the same reason q10b pairs with q10.
    */
  def lengthQuantilesApprox(
      documents: DataFrame,
      groupCol: String = "lang",
      textCol: String = "text",
      probs: Seq[Double] = Seq(0.1, 0.5, 0.9),
      accuracy: Int = 10000): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probs must be non-empty fractions in [0, 1]: $probs")
    require(accuracy > 0, s"invalid accuracy=$accuracy")
    lengthStats(documents, groupCol, textCol).groupBy(groupCol).agg(
      count(lit(1)).as("n_docs"),
      probs.map(p =>
        percentile_approx(col("nw"), lit(p), lit(accuracy))
          .cast("double").as(s"p${(p * 100).round}")): _*)
  }

  private def lengthStats(
      documents: DataFrame, groupCol: String, textCol: String): DataFrame =
    documents.select(
      col(groupCol), size(tokens(col(textCol))).cast("long").as("nw"))

  def corpusCard(documents: DataFrame): DataFrame = {
    val r4 = graft.functions.GraftFunctions.round4 _
    val words = tokens(col("text"))
    val nw = size(words)
    val score = r4(
      size(filter(words, w => w.isin(Stopwords: _*))).cast("double") / nw * 0.5
        + least(nw, lit(100)).cast("double") / 100 * 0.5)
    val perDoc = documents.select(
      col("source"), col("lang"), nw.cast("long").as("nw"), score.as("score"))
    // mean over EXACT deka-micro integers, one double division at the
    // end (the micro-average rule): avg() over doubles is partial-
    // aggregation-order-dependent and flipped a 4-dp rounding boundary
    // vs the single-threaded oracle fold at sf0.1 (round-16 find) —
    // score is round4 per doc, so score·1e4 round-trips exactly
    val agg = perDoc.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("nw")).as("n_tokens"),
      countDistinct(col("lang")).as("n_langs"),
      round(sum(round(col("score") * 10000).cast("long")) /
        (count(lit(1)) * 10000.0), 4).as("mean_quality"),
      sum(when(col("nw") < 25, 1L).otherwise(0L)).as("n_short"))
    val vocab = documents.select(col("source"), explode(words).as("w"))
      .distinct()
      .groupBy("source").agg(count(lit(1)).as("vocab"))
    agg.join(broadcast(vocab), "source")
      .select(col("source"), col("n_docs"), col("n_tokens"), col("vocab"),
        col("n_langs"), col("mean_quality"), col("n_short"))
  }

  /** CCNet-style perplexity bucketing: within each language, split the
    * corpus into head / middle / tail terciles of the unigram-LM
    * bits-per-token signal ([[unigramLogProb]]) — the standard
    * "keep head, sample middle, drop tail" curation gate
    * (CCNet, Wenzek et al. 2020). Ordering ties break on `doc_id`, so
    * the assignment is exactly reproducible; the tercile boundary is
    * EXACT (SQL `ntile`), which costs a per-language sort.
    *
    * Scale: `ntile` over `PARTITION BY lang` concentrates each
    * language in one task — fine while per-language volume fits a
    * task's spill budget, but English at web scale does not. That is
    * what [[pplBucketsApprox]] is for: sketch the two per-language
    * thresholds (mergeable `percentile_approx`, one partial-agg pass),
    * broadcast the lang-sized threshold table back, and assign buckets
    * in a narrow pass — no per-language sort anywhere. Same
    * exact/approx twin convention as [[lengthQuantiles]].
    */
  def pplBuckets(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = unigramLogProb(documents)
      .join(documents.select(col("doc_id").cast("long").as("doc_id"), col("lang")),
        "doc_id")
    val byLang = Window.partitionBy("lang")
      .orderBy(col("bits_per_token"), col("doc_id"))
    scored
      .withColumn("t", ntile(3).over(byLang))
      .select(col("doc_id"), col("lang"), col("bits_per_token"),
        when(col("t") === 1, "head")
          .when(col("t") === 2, "middle")
          .otherwise("tail").as("bucket"))
  }

  /** The scale path of [[pplBuckets]]: per-language tercile THRESHOLDS
    * via the mergeable percentile sketch, broadcast back, buckets
    * assigned narrowly. Boundary docs may land one bucket off vs the
    * exact form (sketch tolerance); the spec bands the agreement.
    */
  def pplBucketsApprox(documents: DataFrame, accuracy: Int = 10000): DataFrame = {
    val scored = unigramLogProb(documents)
      .join(documents.select(col("doc_id").cast("long").as("doc_id"), col("lang")),
        "doc_id")
    val thresholds = scored.groupBy("lang").agg(
      percentile_approx(col("bits_per_token"), lit(1.0 / 3), lit(accuracy)).as("t1"),
      percentile_approx(col("bits_per_token"), lit(2.0 / 3), lit(accuracy)).as("t2"))
    scored.join(broadcast(thresholds), "lang")
      .select(col("doc_id"), col("lang"), col("bits_per_token"),
        when(col("bits_per_token") <= col("t1"), "head")
          .when(col("bits_per_token") <= col("t2"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Keyword-taxonomy topic routing: count each topic's keyword
    * occurrences (substring counts over the lowercased text — the
    * `(len − len(replace)) / len(kw)` identity, exact and
    * engine-portable), assign the argmax topic when it clears
    * `minHits`, else `"other"`. Ties break by topic declaration order
    * (first wins) — deterministic. The cheap router used to stratify a
    * corpus for mixture design before a real classifier exists; the
    * trained upgrade is [[linearQualityScore]]'s weight table.
    *
    * Scale: ONE narrow pass — no explode, no shuffle, no UDF; every
    * count is codegen'd `length`/`replace` arithmetic. Topic count
    * multiplies expression width, not data volume.
    */
  def topicTag(
      documents: DataFrame,
      topics: Seq[(String, Seq[String])] = DefaultTopics,
      minHits: Int = 1): DataFrame = {
    val hitCols = topics.map { case (topic, kws) =>
      val n = kws.map { kw =>
        require(!kw.contains("'"), s"keyword must be quote-free: $kw")
        expr(s"(length(lower(text)) - length(replace(lower(text), '$kw', ''))) div ${kw.length}")
      }.reduce(_ + _)
      topic -> n.cast("long")
    }
    val withHits = documents.select(
      (col("doc_id").cast("long").as("doc_id") +: hitCols.map { case (t, c) => c.as(s"h_$t") }): _*)
    // argmax with first-declared-wins ties: fold a CASE chain
    val best = topics.map(_._1).foldRight(lit("other")) { (t, acc) =>
      val mine = col(s"h_$t")
      val beatsRest = topics.map(_._1).filter(_ != t).map { o =>
        // strictly greater than topics declared LATER, >= than EARLIER
        if (topics.indexWhere(_._1 == t) < topics.indexWhere(_._1 == o))
          mine >= col(s"h_$o")
        else mine > col(s"h_$o")
      }.reduce(_ && _)
      when(mine >= minHits && beatsRest, t).otherwise(acc)
    }
    withHits.select(
      (col("doc_id") +: topics.map(t => col(s"h_${t._1}"))) :+ best.as("topic"): _*)
  }

  /** Default taxonomy over the fixture vocabulary (TESTDATA.md). */
  val DefaultTopics: Seq[(String, Seq[String])] = Seq(
    "storage" -> Seq("table", "row", "column"),
    "compute" -> Seq("join", "agg", "sort"),
    "streaming" -> Seq("stream", "batch", "window"))

  /** FineWeb-style fused filter stack: quality score, 3-gram
    * repetition, char entropy and language-ID computed in ONE typed
    * pass (tokenize once, score everything), each rule emitted as its
    * own flag so the verdict is auditable per rule — which filter
    * killed a doc is the first question every curation post-mortem
    * asks. Signal formulas are the exact twins of [[quality]],
    * [[repetition]], [[charStats]] and [[languageId]] (spec-pinned),
    * with rule comparisons made on the ROUNDED (round-4) signals so
    * engine mirrors agree on the verdicts.
    *
    * Scale shape: one narrow typed map — the corpus is scanned and
    * tokenized ONCE for all four signals, where running the individual
    * operators would scan it four times. No shuffle, no driver state.
    */
  def filterStack(
      documents: DataFrame,
      minQuality: Double = 0.15,
      maxRepetition: Double = 0.05,
      minEntropy: Double = 3.5): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val profiles = LangProfiles
    val stops = Stopwords.toSet
    Dedup.spread(documents.select(col("doc_id").cast("long"), col("text")))
      .as[(Long, String)]
      .map { case (id, text) =>
        val r4 = graft.functions.TextHashing.round4 _
        val toks = graft.functions.TextHashing.tokens(text)
        val nw = toks.length
        val q =
          if (nw == 0) 0.0
          else r4(toks.count(stops.contains).toDouble / nw * 0.5
            + math.min(nw, 100).toDouble / 100 * 0.5)
        val nGrams = math.max(nw - 2, 0)
        val rep =
          if (nGrams == 0) 0.0
          else {
            val seen = new java.util.HashSet[String]()
            var i = 0
            while (i + 2 < nw) {
              seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2)): Unit
              i += 1
            }
            r4(1.0 - seen.size.toDouble / nGrams)
          }
        val ent =
          if (text.isEmpty) 0.0
          else {
            val freq = new java.util.HashMap[Char, Integer]()
            var i = 0
            while (i < text.length) {
              freq.merge(text.charAt(i), 1, (a, b) => a + b): Unit
              i += 1
            }
            var e = 0.0
            val it = freq.values().iterator()
            while (it.hasNext) {
              val p = it.next().toDouble / text.length
              e -= p * math.log(p) / math.log(2.0)
            }
            r4(e)
          }
        val lang =
          if (nw == 0) "und"
          else {
            val scores = profiles.map { case (l, st) =>
              val s = st.toSet
              (l, r4(toks.count(s.contains).toDouble / nw))
            }
            val best = scores.map(_._2).max
            if (best <= 0) "und" else scores.find(_._2 == best).get._1
          }
        val kq = q >= minQuality
        val kr = rep <= maxRepetition
        val ke = ent >= minEntropy
        val kl = lang != "und"
        (id, q, rep, ent, lang, kq, kr, ke, kl, kq && kr && ke && kl)
      }
      .toDF("doc_id", "quality_score", "rep_ratio", "entropy_bits",
        "predicted_lang", "keep_quality", "keep_repetition", "keep_entropy",
        "keep_lang", "keep")
  }
}
