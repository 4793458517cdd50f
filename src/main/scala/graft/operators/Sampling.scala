package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.IvfSearch.mix32

/** Corpus sampling / splitting / packing utilities — the bookkeeping
  * passes of an LLM training-data pipeline between cleaning and
  * tokenization. The reference system has no analog; these extend the
  * engine's declared training-pipeline surface (SURVEY.md §2.b
  * north-star slots) with the same design rules as the rest of the
  * family: deterministic (hash-derived, never rand()), expressible as
  * declarative plans Catalyst can optimize, and mirrorable in SQL so
  * every entry carries a full DuckDB oracle.
  *
  * Scale shapes:
  *   - [[hashSplit]] is a pure narrow projection (no shuffle at all);
  *   - [[quotaPerKey]] shuffles once on the stratum key — the minimum
  *     possible for an exact per-key quota; a pathologically hot
  *     stratum bounds one partition's sort, which stays fine while
  *     quota <<< stratum size (rank truncation short-circuits output,
  *     not the sort) — for extreme skew pre-filter with an approximate
  *     per-key sample first;
  *   - [[packSequences]] never orders the corpus globally: documents
  *     are hash-sharded first and the running-token cumsum windows
  *     WITHIN each shard, so the sort parallelism equals the shard
  *     count and packing stays embarrassingly parallel at any corpus
  *     size (each shard is an independent token stream — exactly how a
  *     multi-worker tokenizer consumes it downstream).
  *
  * OUTPUT ORDER IS UNSPECIFIED (as for any Spark relational operator):
  * a corpus-sized global ORDER BY inside an operator API would plan an
  * `Exchange rangepartitioning` + full sort of the whole table at
  * 100 TB. Callers that need deterministic output (the oracle harness)
  * sort at the edge — the QueryDef wrappers do — and `PlanSpec` pins
  * that bare operator calls plan ZERO exchanges of either kind.
  */
object Sampling {

  /** Deterministic train/val/test assignment by avalanche hash of the
    * id: `mix32(id) % 100` buckets against percentage thresholds. The
    * avalanche hash makes the split unbiased even when ids correlate
    * with content (ingest order, source, time); being id-derived, the
    * assignment is stable under corpus re-partitioning, re-ingestion
    * and incremental appends — the property that matters for
    * reproducible dataset releases. One narrow projection, no shuffle.
    */
  def hashSplit(
      documents: DataFrame,
      idCol: String = "doc_id",
      trainPct: Int = 90,
      valPct: Int = 5): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val bucket = pmod(mix32(col(idCol)), lit(100L))
    documents.select(
      col(idCol),
      bucket.as("bucket"),
      splitLabel(col(idCol), trainPct, valPct).as("split"))
  }

  /** The split-label expression [[hashSplit]] assigns, as a reusable
    * Column — being a pure function of the id, a pipeline that already
    * carries the id can compute the label in place instead of joining
    * against a hashSplit frame (one source of truth, so the two can't
    * drift; [[graft.operators.TrainingPipeline]] does exactly this).
    */
  def splitLabel(id: Column, trainPct: Int = 90, valPct: Int = 5): Column = {
    val bucket = pmod(mix32(id), lit(100L))
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Per-stratum quota sampling: keep at most `quota` documents per
    * `keyCol` value, chosen by hash order (unbiased within the stratum,
    * deterministic across runs) with the id as tiebreak. The standard
    * "at most N documents per domain/language/source" balancing pass.
    * One shuffle on the stratum key; rank truncation bounds the output
    * to quota x strata rows.
    */
  def quotaPerKey(
      documents: DataFrame,
      keyCol: String = "lang",
      idCol: String = "doc_id",
      quota: Int = 5): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(mix32(col(idCol)), col(idCol))
    documents
      .select(col(idCol), col(keyCol))
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= quota)
  }

  /** Sequence packing: assign documents to fixed token-budget bins —
    * the pass that turns a cleaned corpus into training context
    * windows. Documents are hash-sharded (`mix32(id) % shards`, each
    * shard an independent token stream), ordered by id within the
    * shard, and a running token count places each document at its
    * stream offset; its bin is `offset div budget` (offset-based
    * packing: a document whose tokens straddle a boundary belongs to
    * the bin where it starts, the contiguous-stream semantics —
    * deterministic, no first-fit search). Output: one row per document
    * with (shard, bin, stream offset, token count).
    *
    * The cumsum windows PER SHARD, so there is no global sort; `shards`
    * sets the packing parallelism independently of input partitioning
    * (set it to ~cluster cores at scale).
    */
  def packSequences(
      documents: DataFrame,
      budget: Int = 2048,
      shards: Int = 32,
      idCol: String = "doc_id",
      textCol: String = "text",
      tokenCol: Option[String] = None): DataFrame = {
    // tokenCol: feed REAL token counts (e.g. TextAnalysis.bpeTokenize's
    // n_bpe_tokens) instead of the whitespace approximation — budgets
    // are specified in tokenizer tokens, and whitespace counts misstate
    // them 1.3-1.5x on web text
    require(budget > 0 && shards > 0, s"invalid budget=$budget shards=$shards")
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nTok = tokenCol.map(c => col(c).cast("long"))
      .getOrElse(size(Dedup.tokens(col(textCol))).cast("long"))
    documents
      .select(
        col(idCol),
        pmod(mix32(col(idCol)), lit(shards.toLong)).as("shard"),
        nTok.as("n_tokens"))
      .withColumn("off", sum("n_tokens").over(w) - col("n_tokens"))
      .select(col(idCol), col("shard"), expr(s"off div $budget").as("bin"),
        col("off"), col("n_tokens"))
  }

  /** Packing efficiency card: per-shard bin counts and budget
    * utilization over a [[packSequences]] layout — the release-card
    * numbers ("how full are the context windows?") that decide whether
    * a budget/shard recipe wastes compute. Per shard: docs, tokens,
    * bins touched — derived from the END offsets, `ceil(max(off +
    * n_tokens) / budget)`, not from the bin a doc STARTS in: a long
    * document straddling past the last start-bin boundary spills tokens
    * into later bins, and counting start bins would let utilization
    * exceed 1.0 and overstate window fullness on the release card —
    * and `utilization` = tokens / (bins × budget), round-4.
    *
    * Scale shape: the packSequences windows plus ONE shard-keyed agg
    * with map-side partials — #shards rows out.
    */
  def packStats(
      documents: DataFrame,
      budget: Int = 2048,
      shards: Int = 32,
      idCol: String = "doc_id",
      textCol: String = "text",
      tokenCol: Option[String] = None): DataFrame =
    packSequences(documents, budget, shards, idCol, textCol, tokenCol)
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        // integer ceil-div; floor 1 so an all-empty shard prices as one
        // (empty) window instead of dividing utilization by zero
        greatest(
          expr(s"(max(off + n_tokens) + ${budget - 1}) div $budget"),
          lit(1L)).as("n_bins"))
      .withColumn("utilization",
        round(col("n_tokens").cast("double") / (col("n_bins") * budget), 4))

  /** Whole-document bin packing, next-fit in id order: where
    * [[packSequences]] assigns span offsets that let a document
    * STRADDLE a bin boundary (the concat-then-slice training layout),
    * this packs each document WHOLE into capacity-`budget` bins — the
    * layout for context-window batching where an example must not be
    * split. Within each hash shard, documents are placed in id order by
    * the greedy next-fit rule: open a new bin when the current one
    * can't fit the next document. Over-budget documents get a bin of
    * their own. (Next-fit's placement depends only on the running fill,
    * which is what makes the assignment exactly SQL-replayable — the
    * oracle walks the same recurrence; [[packBinsFirstFit]] is the
    * tighter-packing refinement whose open-bin state puts it beyond a
    * SQL mirror.)
    *
    * Scale shape: one keyed exchange (repartition by shard) + a
    * partition-local SORT (Spark's spillable sorter — no group is ever
    * materialized in memory, unlike a flatMapGroups array) + one
    * streaming sequential pass. The per-shard sequential dependence is
    * inherent to bin packing; sharding is what parallelizes it, the
    * same way [[packSequences]]'s windows do.
    */
  def packBinsWholeDoc(
      documents: DataFrame,
      budget: Int = 2048,
      shards: Int = 32,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budget > 0 && shards > 0, s"invalid budget=$budget shards=$shards")
    val spark = documents.sparkSession
    import spark.implicits._
    val b = budget.toLong
    documents
      .select(
        col(idCol).cast("long").as("doc_id"),
        pmod(mix32(col(idCol)), lit(shards.toLong)).as("shard"),
        size(Dedup.tokens(col(textCol))).cast("long").as("n_tokens"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var curShard = -1L
        var bin = 0L
        var fill = 0L
        it.map { case (id, shard, m) =>
          if (shard != curShard) { curShard = shard; bin = 0L; fill = 0L }
          else if (fill > 0L && fill + m > b) { bin += 1L; fill = 0L }
          val off = fill
          fill += m
          (id, shard, bin, off, m)
        }
      }
      .toDF(idCol, "shard", "bin", "off", "n_tokens")
  }

  /** Whole-document bin packing, first-fit-decreasing: the classic
    * offline refinement — place documents in descending token order,
    * each into the FIRST open bin with room, else open a new one. For
    * any fixed placement order first-fit never opens a bin next-fit
    * would not (it only ever places earlier), so this is spec-pinned
    * never-looser than [[packBinsWholeDoc]]'s recurrence run on the
    * same order, and in practice packs the small-doc tail into the
    * gaps big documents leave.
    *
    * The open-bin fill table is per-shard mutable state (O(bins per
    * shard) longs — size the shard count so a shard's token mass over
    * `budget` stays driver-of-thousands, not millions), which is
    * exactly what puts first-fit beyond a SQL window/recurrence mirror:
    * it is library surface with property specs, not an oracle query.
    */
  def packBinsFirstFit(
      documents: DataFrame,
      budget: Int = 2048,
      shards: Int = 32,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budget > 0 && shards > 0, s"invalid budget=$budget shards=$shards")
    val spark = documents.sparkSession
    import spark.implicits._
    val b = budget.toLong
    documents
      .select(
        col(idCol).cast("long").as("doc_id"),
        pmod(mix32(col(idCol)), lit(shards.toLong)).as("shard"),
        size(Dedup.tokens(col(textCol))).cast("long").as("n_tokens"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("n_tokens").desc, col("doc_id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var curShard = -1L
        var fills = new scala.collection.mutable.ArrayBuffer[Long]()
        it.map { case (id, shard, m) =>
          if (shard != curShard) {
            curShard = shard
            fills = new scala.collection.mutable.ArrayBuffer[Long]()
          }
          // descending order makes a linear first-fit scan cheap: most
          // docs land in the last few bins; over-budget docs fit nowhere
          // and open their own
          var bin = 0
          while (bin < fills.length && fills(bin) + m > b) bin += 1
          val off = if (bin < fills.length) fills(bin) else 0L
          if (bin < fills.length) fills(bin) += m else fills += m
          (id, shard, bin.toLong, off, m)
        }
      }
      .toDF(idCol, "shard", "bin", "off", "n_tokens")
  }

  /** Deterministic fixed-size uniform sample: the first `n` documents
    * in avalanche-hash order (id tiebreak) — "give me 10k random docs"
    * without randomness, stable across runs, re-partitioning and
    * appends-that-don't-displace. Plans as TakeOrderedAndProject (a
    * bounded heap per partition + driver merge of n-row heads), NOT a
    * full sort — the only way a global "random N" is affordable on a
    * corpus-scale table. The mix32 order makes it unbiased wrt any
    * content correlate of the id.
    */
  def sampleN(
      documents: DataFrame,
      n: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(n > 0, s"invalid sample size n=$n")
    documents
      .select(col(idCol), pmod(mix32(col(idCol)), lit(1000000L)).as("rk"))
      .orderBy(col("rk"), col(idCol))
      .limit(n)
      .select(col(idCol), col("rk"))
  }

  /** Document chunking: split each document's token stream into
    * overlapping fixed-size windows — the pre-tokenization pass that
    * turns long documents into model-sized contexts (the step BEFORE
    * [[packSequences]] bins them). Starts advance by
    * `chunkTokens - overlap`; the chunk count is
    * `ceil(max(n - overlap, 1) / step)`, so every token is covered and
    * no tail chunk is fully contained in its predecessor. Emits the
    * chunk's token span and the md5 of its joined text (full-content
    * check, the redactPii trick). One narrow typed flatMap — tokenize
    * once per document, emit chunk rows; no shuffle at any corpus size.
    */
  def chunkDocuments(
      documents: DataFrame,
      chunkTokens: Int = 512,
      overlap: Int = 64,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"invalid chunkTokens=$chunkTokens overlap=$overlap")
    val spark = documents.sparkSession
    import spark.implicits._
    val step = chunkTokens - overlap
    val ct = chunkTokens
    val ov = overlap
    Dedup.spread(documents.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val ws = graft.functions.TextHashing.tokens(text)
        val n = ws.length
        if (n == 0) Iterator.empty
        else {
          val nChunks = (math.max(n - ov, 1) + step - 1) / step
          (0 until nChunks).iterator.map { ci =>
            val start = ci * step
            val len = math.min(ct, n - start)
            val body = ws.slice(start, start + len).mkString(" ")
            (id, ci, start.toLong, len.toLong,
              graft.functions.TextHashing.md5Hex(body))
          }
        }
      }
      .toDF("doc_id", "chunk_idx", "start_tok", "n_tok", "chunk_md5")
  }

  /** Stratified rate sampling: keep each document with a per-stratum
    * probability — the corpus REBALANCING pass (e.g. downsample
    * over-represented languages to hit a target mix, the standard
    * data-mixture step before training). The decision is
    * `mix32(id) % 10000 < rate_k * 10000` — integer hash arithmetic,
    * deterministic, independent per document, stable under
    * re-partitioning and appends, exactly SQL-mirrorable. Strata
    * missing from `rates` keep everything (rate 1.0). One narrow
    * projection+filter, no shuffle — rebalancing a 100 TB corpus costs
    * one scan.
    */
  def stratifiedSample(
      documents: DataFrame,
      rates: Seq[(String, Double)],
      keyCol: String = "lang",
      idCol: String = "doc_id"): DataFrame = {
    require(rates.forall { case (_, r) => r >= 0.0 && r <= 1.0 },
      s"rates must be in [0,1]: $rates")
    // duplicate keys would silently diverge from a SQL CASE mirror:
    // the foldLeft makes the LAST entry win, a CASE chain the FIRST
    require(rates.map(_._1).distinct.size == rates.size,
      s"duplicate stratum keys in rates: ${rates.map(_._1)}")
    val thresh = rates.foldLeft(lit(10000L): org.apache.spark.sql.Column) {
      case (acc, (k, r)) =>
        when(col(keyCol) === k, lit(math.round(r * 10000))).otherwise(acc)
    }
    val bucket = pmod(mix32(col(idCol)), lit(10000L))
    documents
      .select(col(idCol), col(keyCol), bucket.as("bucket"), thresh.as("thresh"))
      .filter(col("bucket") < col("thresh"))
  }

  /** Largest feasible downsample-only domain mixture: given integer
    * target weights per domain (e.g. web 3 : code 1), keep a hash-rate
    * sample of each targeted domain so the OUTPUT proportions match the
    * weights, scaled to the largest total the data supports without
    * upsampling any domain. Domains absent from `weights` are dropped —
    * the mixture is exactly the targeted set.
    *
    * All arithmetic is integer (exact, engine-independent):
    *   smin  = min over targeted d of  floor(count_d * W / w_d)
    *           (the largest mixture total any single domain permits;
    *            the argmin domain is kept ~whole, the rest downsample)
    *   thr_d = floor(w_d * smin * 1e6 / (W * count_d))
    *   keep  = mix32(id) % 1e6 < thr_d
    * so the decision is deterministic, stable under re-partitioning and
    * appends, and exactly SQL-mirrorable. Realized counts are
    * hash-approximate (rate sampling, not exact quota — use
    * [[quotaPerKey]] when exactness beats a shuffle-free plan).
    *
    * Scale shape: one column-pruned count aggregation (output rows =
    * #domains, tiny — collected to the driver like any dimension
    * lookup) + one narrow projection+filter over the corpus. Two scans,
    * zero corpus shuffles. Weights should be small integers: the
    * threshold math needs w_d * smin * 1e6 to fit in a long, which
    * holds for weights up to ~9000 even at 1e12-row corpora.
    */
  def domainMixture(
      documents: DataFrame,
      weights: Seq[(String, Long)],
      keyCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty, "domainMixture needs at least one target weight")
    require(weights.forall(_._2 > 0), s"weights must be positive: $weights")
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate domain keys in weights: ${weights.map(_._1)}")
    val wSum = weights.map(_._2).sum
    val counts = documents.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val absent = weights.collect { case (k, _) if counts.getOrElse(k, 0L) == 0L => k }
    require(absent.isEmpty,
      s"targeted domains have no rows (mixture total would be zero): $absent")
    val smin = weights.map { case (k, w) => counts(k) * wSum / w }.min
    val thresholds = weights.map { case (k, w) =>
      k -> (w * smin * 1000000L) / (wSum * counts(k))
    }
    val thresh = thresholds.foldLeft(lit(0L): org.apache.spark.sql.Column) {
      case (acc, (k, t)) => when(col(keyCol) === k, lit(t)).otherwise(acc)
    }
    val bucket = pmod(mix32(col(idCol)), lit(1000000L))
    documents
      .select(col(idCol), col(keyCol), bucket.as("bucket"), thresh.as("thr"))
      .filter(col("bucket") < col("thr"))
      .select(col(idCol), col(keyCol), col("thr"))
  }

  /** Epoch-weighted mixture materialization: emit each document
    * `epochs(source)` times — the repeat-factor pass of pretraining
    * data recipes, where a mix is specified as "2.3 epochs of wiki,
    * 0.5 epochs of web" (the public LLaMA/Gopher-style recipe shape).
    * [[domainMixture]] downsamples toward target proportions without
    * upsampling; this is the complementary materializer for recipes
    * that DO repeat small high-quality sources.
    *
    * Weights are integer milli-epochs (2300 = 2.3 epochs) so the copy
    * arithmetic is exact end-to-end — no float thresholds to drift
    * between engines. A weight of w milli-epochs emits `w / 1000` full
    * copies of every doc, plus one more copy for the `(w % 1000)/1000`
    * fraction of docs chosen by the engine's standard integer hash
    * test (`mix32(id) % 1e6 < frac * 1000`) — deterministic per doc,
    * unbiased across docs, stable under re-partitioning and appends.
    * Sources absent from `milliEpochs` get `defaultMilliEpochs`
    * (1000 = pass through unchanged); weight 0 drops the source.
    *
    * Scale shape: ONE narrow pass — the weight table is a CASE
    * expression (dimension-sized by construction), the copy fan-out is
    * a per-row `explode(sequence)`, and nothing shuffles or collects.
    * Output rows carry (id, key, copy) with copy in 0..n-1; downstream
    * packing treats each copy as an independent document.
    */
  def epochUpsample(
      documents: DataFrame,
      milliEpochs: Seq[(String, Long)],
      keyCol: String = "source",
      idCol: String = "doc_id",
      defaultMilliEpochs: Long = 1000L): DataFrame = {
    require(milliEpochs.nonEmpty, "epochUpsample needs at least one weight")
    require(milliEpochs.forall(_._2 >= 0) && defaultMilliEpochs >= 0,
      s"negative epoch weight: $milliEpochs default=$defaultMilliEpochs")
    require(milliEpochs.map(_._1).distinct.size == milliEpochs.size,
      s"duplicate keys in weights: ${milliEpochs.map(_._1)}")
    documents
      .select(col(idCol), col(keyCol),
        copiesExpr(milliEpochs, keyCol, idCol, defaultMilliEpochs).as("n_copies"))
      .filter(col("n_copies") > 0)
      .select(col(idCol), col(keyCol),
        explode(sequence(lit(0), (col("n_copies") - 1L).cast("int"))).as("copy"))
  }

  /** The per-row weight (milli-epochs) as a CASE column — shared by
    * [[epochUpsample]] and [[mixtureAudit]] so recipe and audit can't
    * drift.
    */
  private def milliEpochExpr(
      milliEpochs: Seq[(String, Long)], keyCol: String,
      defaultMilliEpochs: Long): Column =
    milliEpochs.foldLeft(lit(defaultMilliEpochs)) {
      case (acc, (k, w)) => when(col(keyCol) === k, lit(w)).otherwise(acc)
    }

  /** The per-row copy count: floor(w) + the hash-Bernoulli fractional
    * copy (mix32(id) % 1e6 < frac * 1000).
    */
  private def copiesExpr(
      milliEpochs: Seq[(String, Long)], keyCol: String, idCol: String,
      defaultMilliEpochs: Long): Column = {
    val me = milliEpochExpr(milliEpochs, keyCol, defaultMilliEpochs)
    val bucket = pmod(mix32(col(idCol)), lit(1000000L))
    floor(me / 1000L).cast("long") +
      when(bucket < pmod(me, lit(1000L)) * 1000L, 1L).otherwise(0L)
  }

  /** Mixture audit card: per-source achieved vs target share under an
    * [[epochUpsample]] recipe — the reporting row a data-mix review
    * reads ("did the 2.3-epoch wiki slice actually land at its target
    * proportion, and how far off is the hash-Bernoulli remainder?").
    * Per key: base doc count, materialized copy count, `target_share`
    * (milli-epoch-weighted doc share: w_k·n_k / Σ w·n), `achieved_share`
    * (copy share of the materialized mix), and `dev` =
    * achieved − target (all shares round-6; dev round-6) — nonzero only
    * by the fractional-copy hash decision, shrinking as 1/√n_k.
    *
    * Scale shape: ONE corpus pass (the copy count is computed
    * arithmetically per row — the audit never materializes copies),
    * one key-keyed agg with map-side partials, totals via a broadcast
    * singleton — #sources rows out.
    */
  def mixtureAudit(
      documents: DataFrame,
      milliEpochs: Seq[(String, Long)],
      keyCol: String = "source",
      idCol: String = "doc_id",
      defaultMilliEpochs: Long = 1000L): DataFrame = {
    require(milliEpochs.nonEmpty, "mixtureAudit needs at least one weight")
    require(milliEpochs.forall(_._2 >= 0) && defaultMilliEpochs >= 0,
      s"negative epoch weight: $milliEpochs default=$defaultMilliEpochs")
    require(milliEpochs.exists(_._2 > 0) || defaultMilliEpochs > 0,
      "all-zero weights: the mixture is empty and shares are undefined")
    val me = milliEpochExpr(milliEpochs, keyCol, defaultMilliEpochs)
    val per = documents
      .select(col(idCol), col(keyCol), me.as("me"),
        copiesExpr(milliEpochs, keyCol, idCol, defaultMilliEpochs).as("nc"))
      .groupBy(keyCol).agg(
        count(lit(1)).as("n_docs"),
        sum(col("nc")).as("n_copies"),
        sum(col("me")).as("tw"))
    val tot = per.agg(
      sum(col("n_copies")).as("tot_copies"), sum(col("tw")).as("tot_tw"))
    per.crossJoin(broadcast(tot))
      .select(col(keyCol), col("n_docs"), col("n_copies"),
        round(col("tw").cast("double") / col("tot_tw"), 6).as("target_share"),
        round(col("n_copies").cast("double") / col("tot_copies"), 6)
          .as("achieved_share"))
      .withColumn("dev",
        round(col("achieved_share") - col("target_share"), 6))
  }

  /** Temperature-scaled domain sampling — the corpus-flattening recipe
    * multilingual/multi-source LLM corpora use (sample domain d with
    * probability proportional to count_d^alpha, alpha < 1, so head
    * domains shrink toward the tail; the alpha-sampling idea from the
    * public mC4/XLM-R line of work). Under the no-upsampling
    * constraint (every kept doc exists; the smallest domain is kept
    * whole) the normalizer cancels and the per-domain keep probability
    * closes to
    *
    *   p_d = (n_min / n_d)^(1 - alpha)
    *
    * decided per doc by the engine's standard integer hash test
    * `mix32(id) % 1e6 < floor(p_d * 1e6)` — deterministic, stable
    * under re-partitioning and appends.
    *
    * ORACLE PARITY: the default alpha = 0.5 computes p_d via
    * `math.sqrt`, which IEEE 754 requires to be CORRECTLY ROUNDED —
    * DuckDB's `sqrt` and the JVM's agree bit for bit on identical
    * inputs, so the thresholds mirror exactly (no cross-domain float
    * sums exist to reorder: the closed form needs only n_min / n_d).
    * Other alphas go through `math.pow`, which carries no such
    * guarantee — spec-covered, not oracle-pinned.
    *
    * Scale shape: one column-pruned count aggregation (dimension-sized,
    * collected like any lookup) + one narrow projection+filter. Two
    * scans, zero corpus shuffles — [[domainMixture]]'s shape with
    * derived rather than declared weights.
    */
  def temperatureSample(
      documents: DataFrame,
      alpha: Double = 0.5,
      keyCol: String = "lang",
      idCol: String = "doc_id"): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val counts = documents.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "temperatureSample needs at least one domain")
    val nMin = counts.values.min
    def pd(n: Long): Double =
      if (alpha == 0.5) math.sqrt(nMin.toDouble / n.toDouble)
      else math.pow(nMin.toDouble / n.toDouble, 1.0 - alpha)
    val thresholds = counts.toSeq.map { case (k, n) =>
      k -> math.floor(pd(n) * 1000000.0).toLong
    }
    val thresh = thresholds.foldLeft(lit(0L): org.apache.spark.sql.Column) {
      case (acc, (k, t)) => when(col(keyCol) === k, lit(t)).otherwise(acc)
    }
    val bucket = pmod(mix32(col(idCol)), lit(1000000L))
    documents
      .select(col(idCol), col(keyCol), bucket.as("bucket"), thresh.as("thr"))
      .filter(col("bucket") < col("thr"))
      .select(col(idCol), col(keyCol), col("thr"))
  }

  /** Weight-proportional Bernoulli downsampling: keep each document
    * with probability `min(weight, cap) / cap`, decided by integer
    * hash arithmetic — `mix32(id) % cap < min(weight, cap)` — so the
    * decision is deterministic, exactly SQL-mirrorable (no floats, no
    * rand()), stable under re-partitioning/re-ingestion, and
    * independent per document (no coordination, unlike quota
    * sampling). The standard quality/length-weighted corpus thinning
    * pass: with `weightCol = n_chars, cap = 2000`, a 500-char doc
    * survives with p = 0.25, a 2000+-char doc always survives.
    * One narrow projection+filter, no shuffle.
    */
  def weightedDownsample(
      documents: DataFrame,
      weightCol: String = "n_chars",
      idCol: String = "doc_id",
      cap: Int = 2000): DataFrame = {
    require(cap > 0, s"invalid cap=$cap")
    val w = least(col(weightCol), lit(cap)).cast("long")
    val bucket = pmod(mix32(col(idCol)), lit(cap.toLong))
    documents
      .select(col(idCol), w.as("w"), bucket.as("bucket"))
      .filter(col("bucket") < col("w"))
  }

  /** Per-domain token-budget selection: keep documents, in unbiased
    * hash order within each `keyCol` stratum, until the stratum's
    * cumulative token count reaches `budget` — the "N billion tokens
    * per source" mixture-building pass (the token-denominated
    * counterpart of [[quotaPerKey]]'s row quota, which is what data
    * mixes are actually specified in). A document is kept only if it
    * fits WHOLLY under the remaining budget of its prefix (inclusive
    * running sum <= budget), so the selection is a deterministic
    * prefix of the stratum's hash-ordered stream: stable under
    * re-partitioning and incremental re-runs.
    *
    * Scale shape: one keyed exchange on the stratum + a partitioned
    * window cumsum — never a global sort; the per-stratum sort is
    * Spark's spillable window sorter. Skew caveat as on
    * [[quotaPerKey]]: a pathologically hot stratum serializes its own
    * window; pre-thin with [[weightedDownsample]] if one domain is
    * orders of magnitude over budget.
    */
  def tokenBudgetPerKey(
      documents: DataFrame,
      budget: Long = 2000L,
      keyCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text",
      tokenCol: Option[String] = None): DataFrame = {
    // tokenCol: see packSequences — real tokenizer counts over the
    // whitespace approximation when the caller has them
    require(budget > 0, s"invalid budget=$budget")
    val w = Window.partitionBy(keyCol).orderBy(mix32(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nTok = tokenCol.map(c => col(c).cast("long"))
      .getOrElse(size(Dedup.tokens(col(textCol))).cast("long"))
    documents
      .select(col(idCol), col(keyCol), nTok.as("n_tokens"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Fill-in-the-middle transform (Bavarian et al. 2022, arXiv:
    * 2207.14255): for a hash-selected `fimPct`% of documents, split the
    * token stream at two hash-derived cut points into prefix / middle /
    * suffix and re-emit in PSM order —
    * `<PRE> prefix <SUF> suffix <MID> middle` — so an autoregressive
    * model learns infilling; the rest pass through in natural order.
    * All decisions (selection, both cuts) derive from `mix32(id)`, so
    * the transform is deterministic, stable under re-partitioning, and
    * exactly SQL-mirrorable — no rand() anywhere, unlike the paper's
    * sampler, by the family's reproducible-release rule.
    *
    * Cut derivation: `lo = h % (n+1)`, `hi = lo + (h div 97) % (n-lo+1)`
    * — every (lo, hi) with 0 <= lo <= hi <= n is reachable, including
    * empty prefix/middle/suffix edges. Output carries the cuts and the
    * md5 of the transformed text (full-content check, the redactPii
    * trick — the oracle verifies the actual reordered string, not just
    * the arithmetic). One narrow projection: no shuffle at any corpus
    * size, tokenize-once per document.
    */
  def fimTransform(
      documents: DataFrame,
      fimPct: Int = 50,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(fimPct >= 0 && fimPct <= 100, s"invalid fimPct=$fimPct")
    val join = (a: Column) => array_join(a, " ")
    documents
      .select(col(idCol), mix32(col(idCol)).as("hs"),
        Dedup.tokens(col(textCol)).as("ws"))
      .withColumn("n", size(col("ws")).cast("long"))
      .withColumn("lo", pmod(col("hs"), col("n") + 1L))
      .withColumn("hi",
        col("lo") + pmod(expr("hs div 97"), col("n") - col("lo") + 1L))
      .withColumn("fim", pmod(col("hs"), lit(100L)) < fimPct)
      .select(
        col(idCol), col("fim"), col("n").as("n_tokens"),
        col("lo").as("cut_lo"), col("hi").as("cut_hi"),
        md5(when(col("fim"),
          concat(lit("<PRE>"), join(slice(col("ws"), lit(1), col("lo"))),
            lit("<SUF>"), join(slice(col("ws"), col("hi") + 1, col("n") - col("hi"))),
            lit("<MID>"), join(slice(col("ws"), col("lo") + 1, col("hi") - col("lo")))))
          .otherwise(join(col("ws")))).as("out_md5"))
  }

  /** Curriculum phase assignment — the two-phase schedule modern
    * pretraining runs use (bulk pretrain corpus, then an "anneal" /
    * mid-training tail drawn from the highest-quality slice): a doc
    * joins the anneal set iff its [[TextAnalysis.quality]] score clears
    * `qualityMin` AND its hash bucket falls under `annealPct` (so the
    * anneal set is an unbiased, deterministic sample of the
    * high-quality slice, not "the first N"). `order_key` is a SECOND
    * independent avalanche (id offset by a large odd constant before
    * mixing) giving the data-loader shuffle order — independent of the
    * phase-decision hash, so anneal membership does not bias position.
    *
    * Pure per-row integer/rational arithmetic over the id and token
    * stats: one narrow codegen'd pass, zero exchanges, any corpus size.
    */
  def curriculum(
      documents: DataFrame,
      qualityMin: Double = 0.5,
      annealPct: Int = 30,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(annealPct >= 0 && annealPct <= 100, s"invalid annealPct=$annealPct")
    val r4 = graft.functions.GraftFunctions.round4 _
    val words = Dedup.tokens(col(textCol))
    val nw = size(words)
    val score = r4(
      size(filter(words, w => w.isin(TextAnalysis.Stopwords: _*))).cast("double") / nw * 0.5
        + least(nw, lit(100)).cast("double") / 100 * 0.5)
    documents.select(
      col(idCol),
      score.as("quality_score"),
      when(score >= qualityMin && pmod(mix32(col(idCol)), lit(100L)) < annealPct,
        lit("anneal")).otherwise(lit("pretrain")).as("phase"),
      mix32(col(idCol) + lit(1000003L)).as("order_key"))
  }
}
