package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.TextHashing

/** Deduplication operators for large text/embedding corpora.
  *
  * Scale design: every variant avoids the O(n^2) all-pairs comparison —
  *   - exact: single hash-groupBy (one shuffle on the content hash);
  *   - MinHash-LSH: per-row signature in a typed map (native loops —
  *     see [[TextHashing]] for why not higher-order expressions), then an
  *     equi-join on (band, bandHash) buckets, then exact verification
  *     only on candidate pairs;
  *   - SimHash: per-row 64-bit signature, banded into 8 bytes; a pair
  *     within Hamming distance <= 7 must share at least one band
  *     (pigeonhole), so the band equi-join has guaranteed recall;
  *   - embedding near-dup keeps a brute-force form here (the oracle
  *     baseline); the ANN path for scale lives in [[Similarity]].
  *
  * Signature stages call [[spread]] first: a single parquet file
  * arrives as one partition and the hash work must fan out across the
  * cluster — but ONLY when the source is actually under-partitioned.
  * `repartition` always inserts a full round-robin shuffle of the
  * corpus regardless of input partitioning, so at scale (where the
  * table is already thousands of splits) it must be skipped, not
  * relied on to be free.
  *
  * Signature stages are `persist(MEMORY_AND_DISK)`ed when they feed
  * multiple consumers (band join sides + hot-key cap + verification
  * joins): Spark's ReuseExchange only deduplicates subtrees that share
  * a canonical exchange, so without the persist the expensive typed
  * map re-executes once per consumer. Repeated calls with the same
  * input reuse the same cache entry (CacheManager canonicalizes), so
  * the entries don't accumulate; batch harnesses that run many
  * unrelated queries (Bench/Verify) clear the cache between queries.
  *
  * OUTPUT ORDER IS UNSPECIFIED: dd1's output is corpus-sized (one row
  * per distinct text) and the pair lists are unbounded on dup-heavy
  * corpora, so an embedded ORDER BY would plan a full range-exchange
  * sort of the result at scale. Determinism sorts live in the QueryDef
  * wrappers (the oracle edge).
  */
object Dedup {

  /** Fan a narrow source out to `defaultParallelism` partitions ONLY if
    * it arrives with fewer — the local single-file case. A well-split
    * source (any real at-scale table) passes through untouched; an
    * unconditional `repartition` here would be a gratuitous full
    * shuffle of the corpus text.
    *
    * MID-PIPELINE frames (any join/aggregate/window/sort upstream) skip
    * the probe entirely: their partitioning already comes from shuffle
    * stages, and the partition-count probe (`toRdd`) EAGERLY
    * MATERIALIZES those stages under AQE — executing the upstream
    * subtree once for the probe and again for the real action (the rf1
    * refresh paid ~0.8 s/batch to exactly this before round 12).
    */
  private[graft] def spread(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, Sort, Window => WindowNode}
    val midPipeline = df.queryExecution.analyzed.exists {
      case _: Join | _: Aggregate | _: Sort | _: WindowNode => true
      case _ => false
    }
    if (midPipeline) df
    else {
      val par = df.sparkSession.sparkContext.defaultParallelism
      // toRdd, NOT .rdd: same partition count, skips building the
      // deserialization RDD — and crucially does not fire a
      // QueryExecutionListener "rdd" completion, which would latch any
      // upstream Dataset.observe Observation with never-run (all-zero)
      // accumulators before a real action can report the true counts
      if (df.queryExecution.toRdd.getNumPartitions < par) df.repartition(par) else df
    }
  }

  /** Whitespace tokens with empty strings dropped — expression form for
    * oracle-checked column pipelines (parity documented in QueryDef).
    */
  def tokens(text: Column): Column =
    filter(split(text, " "), w => length(w) > 0)

  /** Exact dedup: group identical texts by content hash. One row per
    * distinct content with the representative (min doc id) and
    * multiplicity — the standard "keep one copy" shape.
    */
  def exact(documents: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    documents
      .groupBy(md5(col(textCol)).as("h"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))

  /** Per-doc (shingle set, LSH band hashes) via one typed narrow map. */
  private def signatures(documents: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    spread(documents.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .map { case (id, text) =>
        val sh = TextHashing.shingles(TextHashing.tokens(text))
        val sig = TextHashing.minhashSignature(sh, MinhashParams.value(numHashes))
        (id, sh, TextHashing.bandHashes(sig, bands))
      }
      .toDF("doc_id", "sh", "band_hashes")
  }

  /** The banded LSH index frame (doc_id, band, band_hash) with the
    * hot-bucket cap applied — the table [[minhashLsh]] joins on itself,
    * exposed so a released corpus can persist it once
    * ([[TrainingPipeline.writeMinhashBands]]) and every incoming batch
    * can probe it without re-signaturing the corpus
    * ([[incrementalNearDup]]). The cap counts CORPUS members only (the
    * index freezes at write time; a batch probes, it doesn't re-cap).
    */
  def minhashBands(
      documents: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 64,
      bands: Int = 32,
      maxBucket: Int = 1000): DataFrame =
    stampIndexMeta(
      capDocFreq(
        signatures(documents, idCol, textCol, numHashes, bands)
          .select(col("doc_id"), posexplode(col("band_hashes")))
          .toDF("doc_id", "band", "band_hash"),
        Seq("band", "band_hash"), maxBucket, Some(MinhashOccupancyMetric)),
      "band_hash", "minhash_bands",
      Map("numHashes" -> numHashes.toLong, "bands" -> bands.toLong,
        "maxBucket" -> maxBucket.toLong))

  /** Index parameter metadata riding the SCHEMA (Spark persists column
    * metadata in the parquet footer, so it round-trips through
    * [[TrainingPipeline.writeMinhashBands]]-style artifacts for free —
    * no sidecar file, no extra job). Rationale: a probe built with
    * mismatched LSH parameters (numHashes/bands) yields ~zero
    * candidates SILENTLY — quiet recall collapse, the worst failure
    * mode an index can have. Stamping the build parameters on the
    * signature column and checking them at probe time turns that into
    * a fail-fast, the same discipline as the unigram-LM artifact's
    * versioned magic header.
    */
  private[graft] val IndexKindKey = "graft.index_kind"

  private[graft] def stampIndexMeta(
      index: DataFrame, sigCol: String, kind: String,
      params: Map[String, Long]): DataFrame = {
    val b = new org.apache.spark.sql.types.MetadataBuilder()
      .putString(IndexKindKey, kind)
    params.foreach { case (k, v) => b.putLong(s"graft.$k", v) }
    index.withColumn(sigCol, col(sigCol).as(sigCol, b.build()))
  }

  /** Probe-time check: if the index frame carries a kind stamp it must
    * name the expected index family and agree on every parameter the
    * probe re-derives on its own side; an unstamped frame (caller-built
    * ad hoc) passes untouched. Loaders REQUIRE the stamp instead — see
    * [[TrainingPipeline.loadMinhashBands]].
    */
  private[graft] def checkIndexMeta(
      index: DataFrame, sigCol: String, kind: String,
      params: Map[String, Long]): Unit =
    index.schema.fields.find(_.name == sigCol).foreach { f =>
      if (f.metadata.contains(IndexKindKey)) {
        val got = f.metadata.getString(IndexKindKey)
        require(got == kind,
          s"index kind mismatch: expected '$kind', artifact is '$got'")
        params.foreach { case (k, v) =>
          if (f.metadata.contains(s"graft.$k")) {
            val gv = f.metadata.getLong(s"graft.$k")
            require(gv == v,
              s"index parameter mismatch on '$k': probe built with $v, " +
                s"index built with $gv — probing would silently yield " +
                "near-zero candidates")
          }
        }
      }
    }

  private[graft] def requireIndexKind(
      index: DataFrame, sigCol: String, kind: String, what: String): DataFrame = {
    val ok = index.schema.fields.find(_.name == sigCol)
      .exists(f => f.metadata.contains(IndexKindKey) &&
        f.metadata.getString(IndexKindKey) == kind)
    require(ok, s"$what: parquet at this path carries no '$kind' stamp " +
      s"on column '$sigCol' — not a graft index artifact (or written by " +
      "a pre-metadata release; rebuild the index)")
    index
  }

  /** Incremental near-dup: which released-corpus documents does this
    * batch near-duplicate — the LSH analog of [[bloomPrefilterDedup]]'s
    * exact screen, and the missing near-dup half of the weekly refresh
    * (refresh drops exact corpus-dups; this names the J >= 0.5 ones).
    *
    * The corpus side is the PERSISTED band index (`corpusBands`) — the
    * released corpus is never re-signatured. The batch is signatured
    * once (batch-sized narrow pass), probes the index with a
    * (band, band_hash) equi-join, and candidates are verified with the
    * exact shingle Jaccard; corpus shingle sets are recomputed ONLY
    * for candidate docs (LeftSemi against the candidate ids —
    * candidate-sized, plan-gated), the same verify as [[minhashLsh]].
    * Output: (da = corpus id, db = batch id, jaccard >= 0.5).
    */
  def incrementalNearDup(
      batch: DataFrame,
      released: DataFrame,
      corpusBands: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 64,
      bands: Int = 32): DataFrame = {
    checkIndexMeta(corpusBands, "band_hash", "minhash_bands",
      Map("numHashes" -> numHashes.toLong, "bands" -> bands.toLong))
    // eager localCheckpoint, not persist: the batch signature frame is
    // consumed twice (band probe + verify), but a persist here has no
    // unpersist point in a lazily-returned plan — under a streaming
    // foreachBatch that leaks one cached block set per micro-batch.
    // localCheckpoint blocks are freed by the ContextCleaner when the
    // frame is GC'd (the duplicateClusters convention); materialization
    // is batch-sized work the probe pays anyway.
    val bsig = signatures(batch, idCol, textCol, numHashes, bands)
      .localCheckpoint(eager = true)
    val bband = bsig.select(col("doc_id"), posexplode(col("band_hashes")))
      .toDF("doc_id", "band", "band_hash")
    val cand = corpusBands.as("c")
      .join(bband.as("b"),
        col("c.band") === col("b.band") &&
          col("c.band_hash") === col("b.band_hash"))
      .select(col("c.doc_id").as("da"), col("b.doc_id").as("db")).distinct()
    // no .distinct() on the semi-join build side (r20): LeftSemi is
    // membership and the hash relation dedupes keys at build time — the
    // explicit distinct planned an extra candidate-keyed exchange
    val candCorpus = released.join(
      cand.select(col("da").as(idCol)), Seq(idCol), "left_semi")
    val csh = signatures(candCorpus, idCol, textCol, numHashes, bands)
      .select(col("doc_id").as("da"), col("sh").as("sha"))
    val bsh = bsig.select(col("doc_id").as("db"), col("sh").as("shb"))
    cand.join(csh, "da").join(bsh, "db")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("uni", size(col("sha")) + size(col("shb")) - col("inter"))
      .filter(col("inter") * 2 >= col("uni") && col("uni") > 0)
      .select(col("da"), col("db"),
        round(col("inter").cast("double") / col("uni"), 4).as("jaccard"))
  }

  /** MinHash + LSH near-duplicate pairs.
    *
    * numHashes=64 split into 32 bands of 2 rows: P(candidate) at
    * Jaccard 0.5 is 1-(1-0.25)^32 ≈ 0.9999, so recall at the 0.5
    * verification threshold is effectively total while random pairs
    * (J≈0.01) almost never collide. Candidates are then verified with
    * the exact shingle-set Jaccard; `2*inter >= union` is the
    * integer-exact form of J >= 0.5.
    */
  def minhashLsh(
      documents: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 64,
      bands: Int = 32,
      maxBucket: Int = 1000): DataFrame = {
    // The signature stage (64 universal hashes per shingle) feeds FOUR
    // consumers: the hot-bucket cap aggregation, the anti-join's keyed
    // side, and the two verification-join sides. None of those share a
    // canonical exchange subtree, so without the persist the typed map
    // re-executes per consumer (observed 4.7x on the full query).
    val sigs = signatures(documents, idCol, textCol, numHashes, bands)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Bucket-size cap: a boilerplate-heavy corpus (or a pile of empty
    // docs, whose signatures are identical) lands thousands of docs in
    // ONE (band, band_hash) bucket -> a bucket-sized^2 candidate block.
    // Oversized buckets are dropped; members can still pair through any
    // of the other 31 bands, so recall degrades only for docs that are
    // near-dup along EVERY band with >cap companions — exactly the
    // boilerplate mass-dup case where exact dedup (dd1) is the right tool.
    //
    // r20: candidates come from ONE (band, band_hash) exchange — the
    // keyedSetJaccard/lshNearDupPairs grouped form. The old shape paid
    // the capDocFreq count aggregation + broadcast anti-join AND a
    // banded self-join whose two sides relied on ReuseExchange (which
    // AQE does not reliably fire across join branches — the r19 dd16
    // forensic); here the size-bounded collect ([[graft.functions
    // .BoundedDocsAgg]], buffers capped at cap+1 ids) IS the cap, the
    // occupancy observe rides the same aggregation, and each surviving
    // bucket emits its intra-bucket pairs with a double explode —
    // per-bucket fan-out identically cap²-bounded, no second shuffle.
    val collectCapped = udaf(new graft.functions.BoundedDocsAgg(
      graft.functions.BoundedDocsAgg.keepFor(maxBucket)))
    val candidates = sigs
      .select(col("doc_id"), posexplode(col("band_hashes")))
      .toDF("doc_id", "band", "band_hash")
      .groupBy("band", "band_hash")
      .agg(collectCapped(col("doc_id")).as("ids"))
      .observe(MinhashOccupancyMetric,
        count(lit(1)).as("n_buckets"),
        sum(when(size(col("ids")) > maxBucket, 1L).otherwise(0L))
          .as("n_dropped"),
        sum(when(size(col("ids")) <= maxBucket &&
            size(col("ids")).cast("long") * 10L >= lit(maxBucket.toLong * 9L),
            1L).otherwise(0L))
          .as("n_near_cap"))
      .filter(size(col("ids")) <= maxBucket && size(col("ids")) >= 2)
      .select(col("ids"), explode(col("ids")).as("da"))
      .select(col("da"), explode(col("ids")).as("db"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db")).distinct()

    val sa = sigs.select(col("doc_id").as("da"), col("sh").as("sha"))
    val sb = sigs.select(col("doc_id").as("db"), col("sh").as("shb"))
    candidates.join(sa, "da").join(sb, "db")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("uni", size(col("sha")) + size(col("shb")) - col("inter"))
      .filter(col("inter") * 2 >= col("uni") && col("uni") > 0)
      .select(col("da"), col("db"),
        round(col("inter").cast("double") / col("uni"), 4).as("jaccard"))
  }

  /** Exact word-3-gram Jaccard over all qualifying pairs, via shingle
    * explode + equi-self-join (the shuffle is on the shingle value, so
    * co-occurring docs meet without an n^2 cross join). This is the
    * oracle-checked exact counterpart of [[minhashLsh]].
    *
    * When the doc-frequency cap engages (any shingle in > maxDocFreq
    * docs), the reported `jaccard` is Jaccard over the CAPPED shingle
    * sets — ubiquitous shingles carry no discriminative signal, so this
    * is the intended semantics, and the DuckDB oracle mirrors the cap
    * (sizes computed post-cap) so engine and check agree at any scale.
    */
  /** Drop join keys whose document frequency exceeds `cap`: one
    * ubiquitous key (a stop-phrase shingle, a boilerplate fingerprint)
    * otherwise yields a df^2 hot candidate block in the self-join — the
    * classic quadratic skew bomb at corpus scale. Ubiquitous keys carry
    * no discriminative signal, so capping also improves precision. The
    * hot set is tiny by construction (keys in > cap docs), so the
    * anti-join broadcasts.
    */
  private[operators] def capDocFreq(
      keyed: DataFrame, keyCols: Seq[String], cap: Int,
      occupancyMetric: Option[String] = None): DataFrame = {
    val counts = keyed.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("df"))
    // occupancy observability (the lshNearDupPairs r18 discipline):
    // the observe rides the hot-key aggregation the anti-join builds
    // anyway — zero extra jobs. n_dropped > 0 / rising n_near_cap is
    // the switch-to-wider-bands (or wider-signature) signal a caller
    // reads BEFORE recall collapses silently.
    val observed = occupancyMetric.fold(counts)(name =>
      counts.observe(name,
        count(lit(1)).as("n_buckets"),
        sum(when(col("df") > cap, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("df") <= cap &&
            col("df") * 10L >= lit(cap.toLong * 9L), 1L).otherwise(0L))
          .as("n_near_cap")))
    val hot = observed.filter(col("df") > cap).select(keyCols.map(col): _*)
    keyed.join(broadcast(hot), keyCols, "left_anti")
  }

  def ngramJaccard(
      documents: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.5,
      maxDocFreq: Int = 1000): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    keyedSetJaccard(spread(documents.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        TextHashing.shingles(TextHashing.tokens(text)).map(s => (id, s))
      }
      .toDF("doc_id", "s"), threshold, maxDocFreq)
  }

  /** Exact set-Jaccard pairs over any keyed signature frame (doc_id, s)
    * — [[ngramJaccard]]'s core (s = text shingle; mm_video inlines a
    * window-count variant of the same shape). Rows must be distinct per
    * (doc_id, s).
    *
    * ONE exchange of the signature frame does everything the previous
    * shape (hot-key agg + broadcast anti-join + shingle-keyed
    * self-join) paid two full shuffles and a tokenize replay for: the
    * frame groups by `s` under a SIZE-BOUNDED collect
    * ([[graft.functions.BoundedDocsAgg]], buffers capped at cap+1 ids —
    * a ubiquitous shingle costs one bounded buffer, never a group-sized
    * array), groups that saturated the buffer are the over-cap keys and
    * are dropped (the exactness argument is on the Aggregator), and
    * every surviving group emits its intra-group pairs with a double
    * explode — per-key fan-out identically df^2-capped as the old
    * self-join, but generated from the grouped row with no second
    * shuffle of the shingle strings. The grouped frame is persisted
    * because both the pair generation and the post-cap size counts read
    * it.
    */
  private[operators] def keyedSetJaccard(
      keyed: DataFrame, threshold: Double, maxDocFreq: Int): DataFrame = {
    val collectCapped = udaf(new graft.functions.BoundedDocsAgg(graft.functions.BoundedDocsAgg.keepFor(maxDocFreq)))
    val groups = keyed.groupBy("s")
      .agg(collectCapped(col("doc_id")).as("docs"))
      .filter(size(col("docs")) <= maxDocFreq)
      .select("docs")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val inter = groups
      .filter(size(col("docs")) >= 2)
      .select(col("docs"), explode(col("docs")).as("da"))
      .select(col("da"), explode(col("docs")).as("db"))
      .filter(col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("inter"))
    // post-cap set size per doc: singleton groups still count
    val sizes = groups.select(explode(col("docs")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    inter
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      // J >= threshold in exact integer arithmetic at 4-dp threshold
      // precision: inter * 10000 >= round(threshold*10000) * union.
      // (The earlier inter * (1/threshold).toLong >= union form was
      // only correct when 1/threshold is integral — threshold 0.4
      // silently filtered at 0.5.) Counts are shingle-bounded, so the
      // 1e4 scale cannot overflow a long.
      .filter(col("inter") * lit(10000L) >=
        lit(math.round(threshold * 10000)) * col("uni"))
      .select(col("da"), col("db"),
        round(col("inter").cast("double") / col("uni"), 4).as("jaccard"))
  }

  /** Directional containment near-dup (Broder's containment
    * coefficient): pairs (contained, container, containment) where
    * C(A, B) = |sh(A) ∩ sh(B)| / |sh(A)| >= threshold. Catches the
    * asymmetric duplication symmetric Jaccard misses — a truncated
    * variant or a document embedded in a larger aggregation page has
    * J = |A|/|B| (arbitrarily small as the container grows) but
    * C = 1.0. The production precision pass keeps the container and
    * drops the contained copy.
    *
    * Scale shape: IDENTICAL to [[ngramJaccard]]'s one-exchange
    * bounded-group core (shingle-keyed groups, df cap, df^2-capped
    * pair fan-out); the only differences are the |A| denominator and
    * that BOTH orientations of each co-shingled pair are tested — a
    * pair can emit twice only when the capped shingle sets are
    * mutually contained.
    */
  def containment(
      documents: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.8,
      maxDocFreq: Int = 1000): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    keyedContainment(spread(documents.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        TextHashing.shingles(TextHashing.tokens(text)).map(s => (id, s))
      }
      .toDF("doc_id", "s"), threshold, maxDocFreq)
  }

  /** [[containment]]'s core over any distinct (doc_id, s) frame — the
    * [[keyedSetJaccard]] group/pair machinery with the directional
    * containment predicate. Threshold compares in exact integer
    * arithmetic at 4-dp precision (the keyedSetJaccard convention).
    */
  private[operators] def keyedContainment(
      keyed: DataFrame, threshold: Double, maxDocFreq: Int): DataFrame = {
    val collectCapped = udaf(new graft.functions.BoundedDocsAgg(graft.functions.BoundedDocsAgg.keepFor(maxDocFreq)))
    val groups = keyed.groupBy("s")
      .agg(collectCapped(col("doc_id")).as("docs"))
      .filter(size(col("docs")) <= maxDocFreq)
      .select("docs")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val inter = groups
      .filter(size(col("docs")) >= 2)
      .select(col("docs"), explode(col("docs")).as("da"))
      .select(col("da"), explode(col("docs")).as("db"))
      .filter(col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("inter"))
    val sizes = groups.select(explode(col("docs")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    val joined = inter
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), "db")
    val thr = lit(math.round(threshold * 10000))
    // both orientations emitted from ONE pass over the joined pair
    // frame: the earlier dir1.unionByName(dir2) form re-evaluated the
    // whole explode^2 + inter-aggregate + size-join subtree per
    // direction (no exchange reuse fired across the union branches —
    // the round-19 dd16 plan carried 23 Exchanges / 0 ReusedExchange).
    // Same rows, row order irrelevant (union order was arbitrary).
    joined
      .select(explode(array(
        struct(col("da").as("contained"), col("db").as("container"),
          col("inter"), col("na").as("n")),
        struct(col("db").as("contained"), col("da").as("container"),
          col("inter"), col("nb").as("n")))).as("e"))
      .filter(col("e.inter") * lit(10000L) >= thr * col("e.n"))
      .select(col("e.contained").as("contained"),
        col("e.container").as("container"),
        round(col("e.inter").cast("double") / col("e.n"), 4).as("containment"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming.
    *
    * Banding: the 64 bits split into 8 bytes; any pair within Hamming
    * distance 7 shares at least one identical byte (pigeonhole), so
    * joining on (byteIdx, byteValue) has guaranteed recall for
    * maxHamming <= 7 — no n^2 stage at any scale.
    */
  /** Observe-metric name carried by every banded Hamming join's
    * hot-key aggregation (n_buckets / n_dropped / n_near_cap — read it
    * off `result.queryExecution.observedMetrics` after any action).
    */
  val HammingOccupancyMetric = "graft.hamming.bucket_occupancy"

  /** The MinHash band family's occupancy metric ([[minhashLsh]] and the
    * [[minhashBands]] index builder) — same triple as
    * [[HammingOccupancyMetric]]; with 2^32 band-hash buckets the
    * n_dropped signal here means "mass-duplicate blocks are being
    * capped", not banding saturation.
    */
  val MinhashOccupancyMetric = "graft.minhash.bucket_occupancy"

  def simhashPairs(
      documents: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 7,
      maxBucket: Int = 1000,
      nBits: Int = 64): DataFrame = {
    require(maxHamming <= 7, "banding guarantees recall only for maxHamming <= 7")
    require(nBits == 64 || nBits == 128 || nBits == 256,
      s"simhashPairs: nBits=$nBits not in {64, 128, 256}")
    val spark = documents.sparkSession
    import spark.implicits._
    if (nBits == 64) {
      // signature packed into ONE long: candidate rows are (long, long) and
      // the Hamming check is the codegen'd bit_count(xor) — no arrays ever
      // cross the band-join shuffle (which can be hot when the corpus
      // vocabulary clusters signatures). persist: feeds the cap's hot-key
      // aggregation and the anti-join's keyed side.
      val sigs = spread(documents.select(col(idCol).cast("long"), col(textCol)))
        .as[(Long, String)]
        .map { case (id, text) =>
          val bits = TextHashing.simhashBits(TextHashing.tokens(text))
          var sig = 0L
          var i = 0
          while (i < 64) { sig = (sig << 1) | bits(i); i += 1 }
          (id, sig, TextHashing.byteBands(bits))
        }
        .toDF("doc_id", "sig", "bytes")
        .persist(StorageLevel.MEMORY_AND_DISK)
      bandedHammingJoin(sigs, maxHamming, maxBucket)
    } else simhashPairsWide(documents, idCol, textCol, maxHamming, maxBucket, nBits)
  }

  /** The WIDE-SIGNATURE simhash path (r19 — the fix for the skew
    * soak's measured saturation mode): nBits ∈ {128, 256}, still 8
    * bands (bandBits = nBits/8), so the Hamming <= 7 pigeonhole
    * guarantee is UNCHANGED while buckets per band grow 256× per step
    * — 65536 at 128 bits, 4.3e9 at 256. The 64-bit default's 256
    * buckets/band saturate around 256·cap documents, at which point
    * the cap correctly drops most buckets and recall collapses
    * silently (SCALE_SKEW.json `skew_dd4_simhash`: 1.00/0.08/0.00 at
    * ×1/×10/×100 with wall flat); the wide signature keeps a sub-cap
    * duplicate group's buckets sparse at any web-corpus size. Hamming
    * is measured over the FULL nBits-bit signature (so a fixed
    * `maxHamming` is a relatively tighter similarity bar at 128/256
    * bits than at 64 — near-dup thresholds tuned on the 64-bit scale
    * transfer as maxHamming × nBits/64).
    *
    * Signature = nBits/64 packed longs; the Hamming check stays
    * codegen'd (element_at + bit_count(xor) summed per word — never a
    * HOF). Occupancy rides the cap's hot-key aggregation
    * ([[HammingOccupancyMetric]]).
    */
  private def simhashPairsWide(
      documents: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, maxBucket: Int, nBits: Int): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val nb = nBits
    val words = nBits / 64
    val sigs = spread(documents.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bits = TextHashing.simhashBitsN(TextHashing.tokens(text), nb)
        val ws = new Array[Long](nb / 64)
        var w = 0
        while (w < ws.length) {
          var sig = 0L; var i = w * 64
          while (i < (w + 1) * 64) { sig = (sig << 1) | bits(i); i += 1 }
          ws(w) = sig; w += 1
        }
        (id, ws, TextHashing.bandsLong(bits, nb / 8))
      }
      .toDF("doc_id", "sigs", "bytes")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val banded = capDocFreq(
      sigs.select(col("doc_id"), col("sigs"), posexplode(col("bytes")))
        .toDF("doc_id", "sigs", "band", "band_val"),
      Seq("band", "band_val"), maxBucket, Some(HammingOccupancyMetric))
    val ham = (1 to words)
      .map(i => bit_count(element_at(col("l.sigs"), i)
        .bitwiseXOR(element_at(col("r.sigs"), i))))
      .reduce(_ + _)
    banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") &&
          col("l.band_val") === col("r.band_val") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("da"), col("r.doc_id").as("db"),
        ham.as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** The banded Hamming pair join shared by [[simhashPairs]] (text) and
    * [[Multimodal.dhashPairs]] (images): `sigs` = (doc_id, sig: 64-bit
    * long, bytes: 8 byte-bands). Any pair within Hamming distance 7
    * shares at least one band (pigeonhole), so the (band, byte) equi
    * join has guaranteed recall and there is no n^2 stage; the
    * bucket-size cap guards against mass-duplicate signature clusters
    * making one bucket quadratic (same guard as minhashLsh's bands).
    *
    * Scale note (the dd5c band-width knob, Hamming edition): byte
    * bands give 256 buckets each, which saturate around ~10^5 rows of
    * near-uniform signatures — the cap then DROPS hot buckets, i.e.
    * recall degrades silently rather than the join exploding. Widening
    * to 16-bit bands (4 bands of a 64-bit signature, 65536 buckets
    * each — [[graft.functions.TextHashing.bands]]) defers saturation
    * 256×, but by the same pigeonhole the guarantee tightens to
    * Hamming <= 3; past that, the right move is a wider SIGNATURE —
    * which the text family now has: [[simhashPairs]] `nBits = 128/256`
    * keeps 8 bands (guarantee unchanged at Hamming <= 7) over 65536 /
    * 4.3e9 buckets per band (oracle-pinned by dd4b, soak-proven exact
    * under planted Zipf skew at ×100). The sign-LSH family exposes the
    * same pair of knobs ([[Similarity.lshNearDupPairs]] nBits/bandBits,
    * oracle-pinned by dd5c); the perceptual hashes pin 8×8 because
    * their 64-bit signatures and Hamming-7 contract are part of the
    * published algorithms the mirrors replay.
    *
    * Saturation is OBSERVABLE on every path through this join:
    * [[HammingOccupancyMetric]] rides the cap's hot-key aggregation.
    */
  private[operators] def bandedHammingJoin(
      sigs: DataFrame, maxHamming: Int, maxBucket: Int): DataFrame = {
    require(maxHamming <= 7, "banding guarantees recall only for maxHamming <= 7")
    val banded = capDocFreq(
      sigs.select(col("doc_id"), col("sig"), posexplode(col("bytes")))
        .toDF("doc_id", "sig", "band", "byte_val"),
      Seq("band", "byte_val"), maxBucket, Some(HammingOccupancyMetric))
    // alias after the join -> one banded exchange feeds both sides
    banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") &&
          col("l.byte_val") === col("r.byte_val") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("da"), col("r.doc_id").as("db"),
        bit_count(col("l.sig").bitwiseXOR(col("r.sig"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** The capped banded form of a Hamming signature frame — the
    * persistable index side of [[bandedHammingJoin]] (cap frozen over
    * index members, the [[minhashBands]] discipline): one row per
    * (doc, band) carrying the full signature so probes verify without
    * a second join.
    */
  private[operators] def bandedHammingIndex(
      sigs: DataFrame, maxBucket: Int): DataFrame =
    capDocFreq(
      sigs.select(col("doc_id"), col("sig"), posexplode(col("bytes")))
        .toDF("doc_id", "sig", "band", "byte_val"),
      Seq("band", "byte_val"), maxBucket)

  /** Probe a persisted Hamming band index with a batch signature
    * frame: (band, byte_val) equi-join, exact Hamming verify from the
    * signatures both sides already carry — the incremental form of
    * [[bandedHammingJoin]] (da = index id, db = batch id).
    */
  private[operators] def bandedHammingProbe(
      index: DataFrame, batchSigs: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= 7, "banding guarantees recall only for maxHamming <= 7")
    val bband = batchSigs
      .select(col("doc_id"), col("sig"), posexplode(col("bytes")))
      .toDF("doc_id", "sig", "band", "byte_val")
    index.as("l")
      .join(bband.as("r"),
        col("l.band") === col("r.band") &&
          col("l.byte_val") === col("r.byte_val"))
      .select(col("l.doc_id").as("da"), col("r.doc_id").as("db"),
        bit_count(col("l.sig").bitwiseXOR(col("r.sig"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Fragment-level overlap via winnowing fingerprints: documents that
    * share any sufficiently long passage (>= k+w-1 tokens) share at
    * least one fingerprint, so the fingerprint equi-join finds
    * copied/moved fragments that whole-document similarity misses.
    * Same scale shape as [[ngramJaccard]]: explode + equi-join, no n^2.
    */
  def fragmentOverlap(
      documents: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minShared: Int = 2,
      maxDocFreq: Int = 1000): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    // persist: the capped fingerprint set feeds the per-doc count
    // aggregation AND the self-join sides
    val fp = capDocFreq(spread(documents.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        TextHashing.winnow(TextHashing.tokens(text)).map(f => (id, f))
      }
      .toDF("doc_id", "fp"), Seq("fp"), maxDocFreq)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = fp.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // alias after the join -> identical canonical exchanges -> one
    // fingerprint stage feeds both join sides (ReuseExchange)
    fp.as("l")
      .join(fp.as("r"), col("l.fp") === col("r.fp") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("da"), col("r.doc_id").as("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .join(counts.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(counts.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .select(col("da"), col("db"), col("shared"),
        round(col("shared").cast("double") / least(col("na"), col("nb")), 4)
          .as("containment"))
  }

  /** Embedding cosine near-duplicate pairs — brute-force O(n^2) baseline
    * (oracle-checked). The dot product runs as a native-loop UDF: at 2k
    * vectors that is 2M pairs in ~1s/core; for corpus-scale data use
    * [[Similarity.lshTopK]]'s bucketed path instead.
    */
  def embeddingNearDup(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.45): DataFrame = {
    val e = embeddings.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
    val a = spread(e).select(col(idCol).as("va"), col("v").as("x"))
    val b = e.select(col(idCol).as("vb"), col("v").as("y"))
    a.crossJoin(broadcast(b)).filter(col("va") < col("vb"))
      .withColumn("sim", graft.functions.GraftFunctions.cosine_similarity(col("x"), col("y")))
      .filter(col("sim") > threshold)
      .select(col("va"), col("vb"), round(col("sim"), 4).as("sim"))
  }

  /** Duplicate-cluster assignment: connected components over a near-dup
    * pair graph (the output of [[minhashLsh]]/[[ngramJaccard]]/
    * [[simhashPairs]]) — the decision layer that turns pairwise
    * evidence into "keep one document per cluster". A pair list alone
    * under-deletes: A~B and B~C pairs must collapse {A,B,C} into ONE
    * cluster even when A~C was never emitted.
    *
    * Algorithm: hash-min label propagation with pointer jumping. Every
    * member starts labelled with its own id; each round, labels flow
    * across edges (both directions — the edge frame is symmetrized) AND
    * each node is offered the label OF its current label (labels are
    * always ids inside the same component, so the lookup is a self-join
    * of the label frame); each node keeps the minimum seen; converged
    * when no label changes. The jump is what makes long chains cheap:
    * neighbor propagation alone moves a label one hop per round (rounds
    * = diameter), while the jump roughly doubles the reached distance
    * per round — rounds = O(log diameter) (the shortcutting idea from
    * the same public CC-in-MapReduce literature, Kiveris et al.'s
    * hash-min family). Near-dup graphs are piles of small dense
    * clusters (diameter 2-4) where this saves one or two rounds per
    * query; on adversarial chains it is the difference between linear
    * and logarithmic round counts. The jump is FREE in shuffle terms:
    * label-pointer rows (lbl -> id) are unioned into the propagation
    * join's edge side, so the same single keyed join computes both the
    * neighbor labels and the label-of-label — measured on the dd8
    * fixture, a separate labels-self-join per round cost +40% wall,
    * the union form is at par with the jump-free loop while removing
    * rounds on chains.
    *
    * Each round is ONE Spark action: the propagation and jump rows feed
    * a single min-aggregation that carries the previous label
    * alongside, and a per-row change counter (accumulator) is collected
    * as a side effect of materializing the round — there is no separate
    * convergence-probe job (task retries can only over-count changes,
    * never report zero when a label actually moved, so the zero/nonzero
    * convergence test is retry-safe). All shuffles are keyed; nothing
    * row-shaped ever reaches the driver.
    *
    * Lineage/memory discipline: each round's labels are checkpointed
    * eagerly (an iterative DataFrame's plan otherwise doubles per
    * round — measured OOM at ~7 rounds from plan bookkeeping alone),
    * and the PREVIOUS round's materialized blocks are freed as soon as
    * the new round lands, so block-manager usage stays one-round-sized
    * in a long-lived session; the edge cache is dropped on completion.
    * Pass `checkpointDir` to use reliable `checkpoint()` on a durable
    * directory (restart-safe, the right mode for a long cluster
    * deployment); the default `localCheckpoint` trades restart safety
    * for zero-configuration local/batch runs.
    *
    * Output: (doc_id, cluster, cluster_size) for every document that
    * appears in at least one pair; cluster = min doc id of the
    * component (deterministic canonical representative; the kept doc),
    * singletons are absent (they were never duplicate evidence).
    *
    * SMALL-GRAPH FAST PATH: when the (symmetrized, distinct) edge count
    * is at most `smallGraphMaxEdges`, the component computation runs as
    * a driver-side union-find over the collected edge list instead of
    * the iterative loop — the same size-based strategy choice Spark
    * itself makes between broadcast-hash and sort-merge joins. The
    * near-dup graph of a corpus is orders of magnitude smaller than the
    * corpus (it holds only documents with duplicate EVIDENCE), so even
    * 100 TB inputs routinely produce fast-path-sized graphs; when they
    * don't, the count check routes to the loop and nothing row-shaped
    * reaches the driver. The default cap (2^20 edges ≈ 16 MB collected,
    * union-find arrays a few hundred MB worst-case) is far under
    * driver headroom, the result is bit-identical to the loop (min-id
    * labels either way), and the edge count is read off the already-
    * persisted edge frame, so the check costs one cheap action. Pass
    * `smallGraphMaxEdges = 0` to force the distributed loop (the
    * job-audit specs do, to pin the loop's action shape).
    */
  def duplicateClusters(
      pairs: DataFrame,
      aCol: String = "da",
      bCol: String = "db",
      maxIters: Int = 25,
      checkpointDir: Option[String] = None,
      smallGraphMaxEdges: Long = 1L << 20): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    checkpointDir.foreach { dir =>
      if (spark.sparkContext.getCheckpointDir.isEmpty)
        spark.sparkContext.setCheckpointDir(dir)
    }
    // reliable mode: persist BEFORE checkpoint — checkpoint(eager)'s
    // file-writing pass otherwise RECOMPUTES the round from lineage (a
    // 2x cost the cache absorbs); the transient cache is dropped once
    // the files exist. Deployments should also set
    // spark.cleaner.referenceTracking.cleanCheckpoints=true so old
    // rounds' checkpoint files are GC'd with their RDDs.
    def snap(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) {
        val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
        val ck = cached.checkpoint(eager = true)
        cached.unpersist()
        ck
      } else df.localCheckpoint(eager = true)
    // free the materialized blocks behind a checkpointed frame no round
    // references anymore (safe: every consumer reads the NEXT, already
    // materialized, checkpoint — the freed one is unreachable)
    def free(df: DataFrame): Unit =
      df.queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
        case _ => ()
      }
    // transient persist of the INPUT pair frame: the symmetrizing union
    // references `pairs` twice, and when the pair list is itself an
    // expensive query (a banded jaccard join, as in the composed
    // pipeline) relying on ReuseExchange to dedup the two branches is
    // fragile — the cache makes the reuse unconditional; dropped as
    // soon as the edge frame is materialized by the first snap
    val pairsC = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    val edges = pairsC.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .unionByName(pairsC.select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // ONE take(cap+1) job both decides the route AND delivers the
    // fast path's edge list (the probePqCodes gate discipline, r20):
    // a result at or under the cap is provably the complete edge set,
    // so the former count-then-collect pair of driver jobs collapses
    // to one. The take materializes the persisted edge frame — the
    // work the loop's init aggregation would spend anyway.
    val gateOn = smallGraphMaxEdges > 0 && smallGraphMaxEdges < Int.MaxValue.toLong
    val gateEdges: Array[(Long, Long)] =
      if (gateOn) edges.as[(Long, Long)].take(smallGraphMaxEdges.toInt + 1)
      else Array.empty
    if (gateOn && gateEdges.length <= smallGraphMaxEdges) {
      // one direction carries the full graph (src <= dst keeps
      // defensive self-loop nodes); the symmetric twin adds nothing
      val ePairs = gateEdges.filter { case (a, b) => a <= b }
      edges.unpersist()
      pairsC.unpersist()
      val parent = new java.util.HashMap[Long, java.lang.Long]()
      def find(x0: Long): Long = {
        var x = x0
        var p = Option(parent.get(x)).fold(x)(_.longValue)
        while (p != x) {
          val gp = Option(parent.get(p)).fold(p)(_.longValue)
          parent.put(x, gp) // path halving
          x = gp
          p = Option(parent.get(x)).fold(x)(_.longValue)
        }
        x
      }
      ePairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        // min-id root: the canonical representative falls out of the
        // union order, no second relabel pass needed
        if (ra < rb) parent.put(rb, ra) else if (rb < ra) parent.put(ra, rb)
      }
      val members = ePairs.iterator.flatMap(p => Iterator(p._1, p._2)).toArray.distinct
      val roots = members.map(find)
      val sizes = roots.groupBy(identity).map { case (r, g) => (r, g.length.toLong) }
      val rows = members.indices.map(k => (members(k), roots(k), sizes(roots(k))))
      return spark.createDataset(rows).toDF("doc_id", "cluster", "cluster_size")
    }
    val changes = spark.sparkContext.longAccumulator("graft.cc.labelChanges")
    // initial labels fold the would-be first round in: min(id, min
    // neighbor) is ONE aggregation over the symmetric edge frame — the
    // identity-label round's join would produce exactly this, so the
    // loop starts one round ahead for free
    var labels = snap(edges.groupBy(col("src")).agg(min(col("dst")).as("mn"))
      .select(col("src").as("id"), least(col("src"), col("mn")).as("lbl")))
    pairsC.unpersist()
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      changes.reset()
      // pointer-jump rows ride the SAME join: a row (src = lbl(v),
      // dst = v) matches the label frame at id = lbl(v) and emits
      // (v, lbl(lbl(v))) — the distance-doubling label-of-label —
      // through the one keyed shuffle the neighbor propagation already
      // pays (every label value is an id present in the frame, so the
      // lookup always hits)
      val hops = edges.unionByName(
        labels.select(col("lbl").as("src"), col("id").as("dst")))
      val prop = hops.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("lbl"))
      // self rows carry the old label in `self` (exactly one per id, the
      // id set is fixed); max(self) recovers it through the same
      // aggregation that takes the min — one shuffle, no second join
      val merged = labels.select(col("id"), col("lbl"), col("lbl").as("self"))
        .unionByName(prop.select(col("id"), col("lbl"),
          lit(null).cast("long").as("self")))
        .groupBy("id").agg(min("lbl").as("new_lbl"), max("self").as("old_lbl"))
      val next = snap(merged.as[(Long, Long, Long)]
        .map { case (id, newLbl, oldLbl) =>
          if (newLbl < oldLbl) changes.add(1L)
          (id, newLbl)
        }
        .toDF("id", "lbl"))
      free(labels)
      labels = next
      converged = changes.value == 0L
      i += 1
    }
    require(converged, s"label propagation did not converge in $maxIters rounds")
    edges.unpersist()
    val sizes = labels.groupBy("lbl").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "lbl")
      .select(col("id").as("doc_id"), col("lbl").as("cluster"), col("cluster_size"))
  }

  /** Paragraph-level dedup — the pass document-level dedup misses:
    * boilerplate paragraphs (navigation, subscribe prompts, license
    * blocks) repeat across thousands of otherwise-unique documents, and
    * real corpus cleaning (the C4 / RefinedWeb line-dedup idea, public
    * literature) removes the REPEATED PARAGRAPH, not the document.
    *
    * Semantics: paragraphs are newline-run-separated spans, space-
    * trimmed, empties dropped; a paragraph whose distinct-document
    * frequency exceeds `maxDocFreq` is boilerplate and is removed from
    * every document. Output is one row per document that has at least
    * one non-empty paragraph: the cleaned text (kept paragraphs
    * re-joined with a blank line, original order), the paragraph count
    * and the removed count — docs whose every paragraph was boilerplate
    * surface with empty `clean_text`, so the caller can drop them.
    *
    * Scale shape: one narrow explode, one hash aggregation keyed on the
    * paragraph digest (md5 — 128-bit, content-exact like dd1; the
    * digest crosses the shuffle instead of the paragraph body), and the
    * hot set (paragraphs in > maxDocFreq docs) is tiny by construction
    * so the flagging join BROADCASTS; reassembly is one groupBy on
    * doc_id. Same shape as [[exact]] plus a keyed regroup — no
    * all-pairs stage, nothing driver-sided, at any corpus size.
    */
  def paragraphDedup(
      documents: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxDocFreq: Int = 1000): DataFrame = {
    // the exploded paragraph frame feeds the hot-set aggregation AND
    // the flagging join: persist, same multi-consumer discipline as
    // the signature stages above
    val paras = spread(documents.select(col(idCol).cast("long").as("doc_id"), col(textCol)))
      .select(col("doc_id"), posexplode(split(col(textCol), "\\n+")))
      .toDF("doc_id", "idx", "para_raw")
      .select(col("doc_id"), col("idx"), trim(col("para_raw")).as("para"))
      .filter(length(col("para")) > 0)
      .withColumn("h", md5(col("para")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val hot = paras.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") > maxDocFreq)
      .select(col("h"), lit(true).as("boiler"))
    paras.join(broadcast(hot), Seq("h"), "left")
      .select(col("doc_id"), col("idx"), col("para"),
        coalesce(col("boiler"), lit(false)).as("boiler"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_paras"),
        sum(col("boiler").cast("long")).as("n_removed"),
        // collect_list drops nulls, so removed paragraphs vanish here;
        // array_sort on (idx, para) structs restores original order
        array_join(
          transform(
            array_sort(collect_list(when(!col("boiler"),
              struct(col("idx"), col("para"))))),
            s => s.getField("para")),
          "\n\n").as("clean_text"))
      .select(col("doc_id"), col("clean_text"), col("n_paras"), col("n_removed"))
  }

  /** Incremental exact dedup against an existing corpus with a Bloom
    * prefilter — the "is this new document already in the released
    * dataset" pass of an append-only corpus pipeline, where the naive
    * form (semi-join every new batch against the full corpus) shuffles
    * corpus-scale data per batch.
    *
    * Scale shape: ONE pass over the corpus builds a Bloom filter of
    * content hashes (`df.stat.bloomFilter` — a distributed treeAggregate;
    * the sketch is ~1.2 GB per 1e9 docs at 1% fpp, well inside a task
    * binary); the new batch is then prefiltered by a codegen'd sketch
    * probe ([[graft.functions.BloomMightContain]]) that is NARROW — no
    * false negatives, so at 1% fpp ~99% of genuinely-new documents never
    * reach the confirm join. The confirm then clears Bloom false
    * positives AND xxhash64 collisions exactly — the operator's RESULT
    * is exactly "new docs whose text exists in the corpus", with the
    * sketch as a pure performance layer.
    *
    * The confirm NEVER shuffles the corpus: the post-bloom candidate
    * set is tiny (true dups + fpp stragglers of the new batch), so it
    * broadcasts into a semi-join whose STREAMED side is a narrow
    * text-only corpus scan, and the corpus texts that matched broadcast
    * back to semi-filter the candidates. Both passes are
    * BroadcastHashJoins — zero `Exchange hashpartitioning` of corpus
    * data in the whole plan (gated in PlanSpec). The earlier form
    * (`corpus.select(text).distinct()` as a semi-join build side)
    * re-shuffled the full corpus text per incremental batch — the exact
    * cost the sketch exists to avoid.
    *
    * BROADCAST BOUNDS (the operator's contract is incremental batch
    * <<< corpus): the candidates broadcast is bounded by the post-bloom
    * share of the NEW BATCH (≈ dup fraction + fpp), and the matched
    * broadcast by the corpus multiplicity of those candidate texts —
    * run exact dedup ([[exact]]) on the corpus once before going
    * incremental (the release pipeline this operator serves does
    * exactly that) and the bound is the candidate count itself. A
    * batch that is itself corpus-scale (a full re-ingest, mostly dups)
    * breaks the small-broadcast premise; that job is a one-shot
    * corpus-vs-corpus semi-join, not this operator.
    *
    * The corpus count for sizing the sketch is one parquet-metadata-
    * cheap action; pass `expectedItems` to skip it when the caller
    * already knows the cardinality.
    */
  def bloomPrefilterDedup(
      corpus: DataFrame,
      newDocs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      fpp: Double = 0.01,
      expectedItems: Long = -1L): DataFrame =
    bloomPrefilterDedupWithSketch(corpus, newDocs, idCol, textCol,
      contentSketch(corpus, textCol, fpp, expectedItems))

  /** One pass over the corpus -> the serialized Bloom sketch of its
    * content hashes. Build it ONCE and reuse across incremental
    * batches / micro-batches (see [[bloomPrefilterDedupWithSketch]] and
    * [[graft.streaming.StreamingDedup]]); rebuilding per batch would
    * re-aggregate the corpus each time.
    */
  def contentSketch(
      corpus: DataFrame,
      textCol: String = "text",
      fpp: Double = 0.01,
      expectedItems: Long = -1L): Array[Byte] = {
    val expected =
      if (expectedItems > 0) expectedItems else math.max(corpus.count(), 1L)
    val bf = corpus.select(xxhash64(col(textCol)).as("h"))
      .stat.bloomFilter("h", expected, fpp)
    graft.functions.BloomMightContain.serialize(bf)
  }

  /** Prebuilt-sketch variant: the probe + two broadcast-candidate
    * confirm passes, with the sketch supplied by the caller (batch
    * loops and streaming foreachBatch reuse one sketch across calls).
    */
  def bloomPrefilterDedupWithSketch(
      corpus: DataFrame,
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      sketch: Array[Byte]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val candidates = newDocs.filter(
      graft.functions.GraftFunctions.bloom_might_contain(
        lit(sketch), xxhash64(col(textCol))))
    // the first confirm pass keeps one row per matching CORPUS copy;
    // on a corpus that was not pre-deduped, a hot duplicated text
    // would multiply the driver-collected broadcast below. A
    // partition-local distinct (narrow mapPartitions — NO exchange,
    // the zero-shuffle plan gate stays intact) bounds the broadcast
    // by (distinct matched texts x partitions), in practice the
    // candidate-set size, regardless of corpus duplication.
    val matched = corpus.select(col(textCol).as("t"))
      .join(broadcast(candidates.select(col(textCol).as("t"))), Seq("t"), "left_semi")
      .as[String]
      .mapPartitions { it =>
        val seen = new java.util.HashSet[String]()
        it.filter(seen.add)
      }
      .toDF(textCol)
    candidates
      .join(broadcast(matched), Seq(textCol), "left_semi")
      .select(col(idCol), md5(col(textCol)).as("h"))
  }

  /** URL canonical form for crawl-level dedup: lowercase scheme+host,
    * strip `www.`, default ports, fragments and tracking parameters
    * (`utm_*`, `fbclid`, `gclid`), sort the surviving query params, and
    * drop trailing slashes — the normalization a crawler applies before
    * "have I fetched this page already". Pure string expression (regex
    * + array ops, no UDF), so it stays inside whole-stage codegen and
    * is exactly replayable in the SQL oracle. Parameter ORDER is
    * canonicalized by sorting (a?b=1&a=2 == a?a=2&b=1), which plain
    * regex stripping cannot do.
    */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val base = split_part(noFrag, lit("?"), lit(1))
    val query = split_part(noFrag, lit("?"), lit(2))
    val prefix = regexp_extract(base, "^[a-zA-Z]+://[^/]*", 0)
    val path = base.substr(length(prefix) + 1, length(base))
    val prefixC = regexp_replace(
      regexp_replace(lower(prefix), "://www\\.", "://"), ":(80|443)$", "")
    val pathC = regexp_replace(path, "/+$", "")
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike("^(utm_[a-z]+|fbclid|gclid)=")))
    val queryC = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    concat(prefixC, pathC, queryC)
  }

  /** URL-level dedup: group raw URLs by [[canonicalUrl]] and keep one
    * representative per canonical page — the crawl-frontier companion
    * of content-level [[exact]] (same keyed-agg shape: one shuffle on
    * the canonical key, map-side partial agg, no joins). `n_urls` is
    * the group's raw multiplicity, `n_variants` the distinct raw
    * spellings that collapsed, `keep_id` the min id representative.
    */
  def urlDedup(
      documents: DataFrame,
      urlCol: String = "url",
      idCol: String = "doc_id"): DataFrame =
    documents
      .select(col(idCol), canonicalUrl(col(urlCol)).as("canonical_url"),
        col(urlCol))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col(urlCol)).as("n_variants"),
        min(col(idCol)).as("keep_id"))

  /** Repeated-SPAN detection — the substring-granularity dedup between
    * whole-document ([[exact]]/[[minhashLsh]]) and paragraph ([[
    * paragraphDedup]]) levels, after Lee et al. 2021 ("Deduplicating
    * Training Data Makes Language Models Better"), which removes
    * verbatim token runs repeated across a corpus (license headers,
    * navigation chrome, quoted chain-mails) that are too short to make
    * the whole documents near-duplicates. Their suffix-array scan is a
    * single-machine algorithm; the Spark-first equivalent detects every
    * run of >= k tokens shared by >= minDf docs via positional
    * k-shingles:
    *
    *   1. one typed pass emits (doc, start, k-gram) for every token
    *      position and hashes the gram to 64 bits IN THE SAME STAGE
    *      (the [[Decontamination.exactSubstringLeaks]] rule) — the
    *      persisted frame and every downstream exchange carry three
    *      longs per position, never the ~80-byte 8-token string; a
    *      cross-gram collision adds a false duplicated position at
    *      ~|grams|²/2⁶⁵ — the accepted signature-family bound
    *      (round-16 forensic: the string-keyed form spilled its cache
    *      and shuffles at 500k docs, the 12x x10→x100 cliff behind
    *      pipe2's 18.6x SCALE outlier);
    *   2. corpus document-frequency per gram hash — ONE shuffle keyed
    *      by the hash (map-side partial agg; a hot gram costs one
    *      count, never a pair fan-out);
    *   3. positions of duplicated grams survive a left-semi join keyed
    *      by the hash (semi = zero fan-out on hot grams, each position
    *      row emitted at most once);
    *   4. surviving positions merge into maximal spans with a
    *      gaps-and-islands window PARTITIONED BY doc (lag + running
    *      sum) — per-doc state only, no global sort.
    *
    * Every duplicated token run of length L >= k appears as L-k+1
    * consecutive duplicated starts, so islands reconstruct the full
    * run exactly; two runs merge iff their duplicated starts are
    * adjacent (gap <= 1), i.e. the text between them is itself covered
    * by duplicated grams. Spans are reported as 1-based inclusive
    * token indices; trimming is the caller's policy (report-only here,
    * matching the reference pipelines that log spans before cutting).
    */
  def repeatedSpans(
      documents: DataFrame,
      k: Int = 8,
      minDf: Int = 2,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k >= 2 && minDf >= 2, s"invalid repeatedSpans params k=$k minDf=$minDf")
    val spark = documents.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val kk = k
    // positional k-grams: unlike TextHashing.shingles this keeps every
    // START INDEX (1-based) and does not distinct — positions are the
    // payload here
    val pos = spread(documents.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = TextHashing.tokens(text)
        val n = toks.length - kk + 1
        val out = new Array[(Long, Long, String)](math.max(n, 0))
        var i = 0
        while (i < n) {
          out(i) = (id, (i + 1).toLong, toks.slice(i, i + kk).mkString(" "))
          i += 1
        }
        out
      }
      .toDF("doc_id", "i", "s")
      // hash in the SAME stage as the flatMap: strings never reach the
      // cache or an exchange (see step 1 of the scaladoc)
      .select(col("doc_id"), col("i"), xxhash64(col("s")).as("h"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // document frequency per gram — count DISTINCT DOCS so a gram
    // repeated inside one doc is not corpus-duplicated. Spark plans
    // the single-distinct agg as partial dedup on (h, doc_id) →
    // exchange (h, doc_id) → exchange (h): hash on BOTH keys spreads a
    // hot gram across partitions, and the h-exchange carries at most
    // one partial row per (h, partition). (Probed against the
    // distinct()-then-count form: identical exchange structure in
    // Spark 4.1 — this form just states the intent in one aggregate.)
    val dup = pos.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDf)
      .select(col("h"))
    val hits = pos.join(dup, Seq("h"), "left_semi")
    val byDoc = Window.partitionBy("doc_id").orderBy("i")
    val flagged = hits
      .withColumn("gap", col("i") - lag(col("i"), 1, null).over(byDoc))
      .withColumn("f", when(col("gap").isNull || col("gap") <= 1, lit(0)).otherwise(lit(1)))
      .withColumn("island", sum(col("f")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("doc_id"), col("island"))
      .agg(min(col("i")).as("span_start"), (max(col("i")) + (kk - 1)).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("n_tokens"))
  }

  /** The DROP-DECISION form of [[repeatedSpans]] (the relationship
    * [[Decontamination.contaminatedIds]] has to `overlapWith`): per doc,
    * the fraction of tokens covered by corpus-duplicated spans, and the
    * keep/drop flag a pipeline consumes (RefinedWeb drops documents
    * whose duplicated fraction crosses a threshold rather than
    * surgically trimming them).
    *
    * Island STARTS are disjoint, but each span extends k-1 tokens past
    * its last duplicated start, so two islands whose start-gap is in
    * [2, k-1] (the bridging grams fell under minDf) produce OVERLAPPING
    * spans. dup_tokens is therefore the UNION coverage, not the sum of
    * span lengths: span_end is strictly increasing per doc (islands
    * partition the sorted starts), so clamping each span's start to the
    * previous span's end + 1 before summing counts every covered token
    * exactly once and dup_frac can never exceed 1.0.
    *
    * Scale shape: [[repeatedSpans]]'s shuffles plus ONE doc-keyed left
    * join of the span aggregate onto the narrow token-count projection
    * — span-free docs surface with fraction 0 and keep=true.
    */
  def spanDupFraction(
      documents: DataFrame,
      k: Int = 8,
      minDf: Int = 2,
      maxDupFrac: Double = 0.3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spans = repeatedSpans(documents, k, minDf, idCol, textCol)
    val bySpan = Window.partitionBy("doc_id").orderBy("span_start")
    val perDoc = spans
      .withColumn("cov_start", greatest(col("span_start"),
        coalesce(lag(col("span_end"), 1).over(bySpan) + 1, col("span_start"))))
      .groupBy("doc_id")
      .agg(sum(col("span_end") - col("cov_start") + 1).as("dup_tokens"))
    val lens = documents.select(col(idCol).cast("long").as("doc_id"),
      size(tokens(col(textCol))).cast("long").as("n_tokens"))
    lens.join(perDoc, Seq("doc_id"), "left")
      .withColumn("dup_tokens", coalesce(col("dup_tokens"), lit(0L)))
      .withColumn("dup_frac",
        round(col("dup_tokens").cast("double") / col("n_tokens"), 4))
      .withColumn("drop", col("dup_frac") > maxDupFrac)
  }

  /** Two-signal near-duplicate CONSENSUS: keep only pairs flagged by
    * BOTH the lexical path (any (da, db, ...) pair frame — MinHash-LSH,
    * n-gram Jaccard, SimHash) and embedding cosine similarity. The
    * precision pass production dedup runs before destructive drops:
    * lexical LSH alone false-positives on shared boilerplate with
    * different content, embedding similarity alone on paraphrases that
    * are legitimately distinct documents — demanding both signals cuts
    * each family's false positives with the other's evidence.
    *
    * Scale shape: the pair frame is (by construction of its producers)
    * already sub-quadratic; the consensus adds two keyed joins against
    * the narrow (id, vector) projection and a row-local cosine — no new
    * pair generation anywhere. Pairs where either side lacks an
    * embedding drop out (consensus is only defined where both signals
    * exist); run the lexical verdict alone for coverage of the rest.
    */
  def consensusNearDup(
      lexPairs: DataFrame,
      embeddings: DataFrame,
      simThreshold: Double = 0.5,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val e = embeddings.select(
      col(idCol).cast("long").as("id"), col(vecCol).cast("array<double>").as("v"))
    val ea = e.toDF("da", "x")
    val eb = e.toDF("db", "y")
    val rest = lexPairs.columns.filterNot(c => c == "da" || c == "db").toSeq
    lexPairs.join(ea, "da").join(eb, "db")
      .withColumn("cos_sim",
        round(graft.functions.GraftFunctions.cosine_similarity(col("x"), col("y")), 4))
      .filter(col("cos_sim") > simThreshold)
      .select(("da" +: "db" +: rest :+ "cos_sim").map(col): _*)
  }

  /** Duplicate-cluster CANONICALIZATION — the step a pipeline runs
    * after [[duplicateClusters]]: per connected component keep exactly
    * one member and drop the rest. The keep rule is the common
    * production one (longest member wins, ties to the smallest id —
    * "longest" because near-dup clusters usually contain truncated
    * variants of one original). One row per cluster.
    *
    * Scale shape: token counts are a narrow projection of the already-
    * clustered frame joined back on doc id (one keyed join), and the
    * argmax is a window PARTITIONED BY cluster — no global sort, no
    * driver-side group materialization.
    */
  def canonicalize(
      clusters: DataFrame,
      documents: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lens = documents.select(col(idCol).cast("long").as("doc_id"),
      size(tokens(col(textCol))).cast("long").as("n_toks"))
    val ranked = clusters.join(lens, "doc_id")
      .withColumn("rn", row_number().over(
        Window.partitionBy("cluster").orderBy(col("n_toks").desc, col("doc_id"))))
    ranked.filter(col("rn") === 1)
      .select(col("cluster"), col("doc_id").as("keep_id"),
        col("n_toks").as("keep_toks"),
        (col("cluster_size") - 1).cast("long").as("n_dropped"))
  }

  /** MinHash calibration audit: over the LSH candidate set, compare
    * the ESTIMATED Jaccard (fraction of the 64 signature rows that
    * agree — what the index believes) against the TRUE shingle Jaccard
    * (what verification computes), micro-averaged per estimate decile.
    * The acceptance card a near-dup index ships with: a mis-sized hash
    * family or broken band arithmetic shows up as decile rows whose
    * estimate and truth diverge, before any corpus is harmed. (The
    * vector-side twin is [[Similarity.annRecall]].)
    *
    * Micro-averages are INTEGER sums (Σagree, Σ|∩|, Σ|∪|) divided
    * once, so the doubles match across engines bit-for-bit before the
    * round-4 edge — no order-dependent float accumulation.
    *
    * Scale shape: identical to [[minhashLsh]] (signature pass,
    * capped band self-join) plus one 64-row-per-pair signature
    * comparison folded as a codegen'd `zip_with`/`aggregate` — output
    * is 11 rows.
    */
  def minhashCalibration(
      documents: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 64,
      bands: Int = 32,
      maxBucket: Int = 1000): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val sigs = spread(documents.select(col(idCol).cast("long"), col(textCol)))
      .as[(Long, String)]
      .map { case (id, text) =>
        val sh = TextHashing.shingles(TextHashing.tokens(text))
        val sig = TextHashing.minhashSignature(sh, MinhashParams.value(numHashes))
        (id, sh, sig, TextHashing.bandHashes(sig, bands))
      }
      .toDF("doc_id", "sh", "sig", "band_hashes")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one (band, band_hash) exchange, size-bounded collect, intra-bucket
    // pair explode — the minhashLsh r20 candidate form (no capDocFreq
    // anti-join, no banded self-join)
    val collectCapped = udaf(new graft.functions.BoundedDocsAgg(
      graft.functions.BoundedDocsAgg.keepFor(maxBucket)))
    val candidates = sigs
      .select(col("doc_id"), posexplode(col("band_hashes")))
      .toDF("doc_id", "band", "band_hash")
      .groupBy("band", "band_hash")
      .agg(collectCapped(col("doc_id")).as("ids"))
      .filter(size(col("ids")) <= maxBucket && size(col("ids")) >= 2)
      .select(col("ids"), explode(col("ids")).as("da"))
      .select(col("da"), explode(col("ids")).as("db"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db")).distinct()
    val sa = sigs.select(col("doc_id").as("da"), col("sh").as("sha"), col("sig").as("siga"))
    val sb = sigs.select(col("doc_id").as("db"), col("sh").as("shb"), col("sig").as("sigb"))
    val pair = candidates.join(sa, "da").join(sb, "db")
      .withColumn("agree", expr(
        """aggregate(zip_with(siga, sigb,
          |  (x, y) -> IF(x = y, CAST(1 AS BIGINT), CAST(0 AS BIGINT))),
          |  CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("u",
        (size(col("sha")) + size(col("shb"))).cast("long") - col("inter"))
      .filter(col("u") > 0)
    pair
      .groupBy(expr(s"CAST((agree * 10) div $numHashes AS INT)").as("bin"))
      .agg(count(lit(1)).as("n_pairs"), sum("agree").as("sag"),
        sum("inter").as("si"), sum("u").as("su"))
      .select(col("bin"), col("n_pairs"),
        round(col("sag").cast("double") / (col("n_pairs") * numHashes), 4)
          .as("est_jaccard"),
        round(col("si").cast("double") / col("su"), 4).as("true_jaccard"))
  }

  /** Template-spam detection: documents that share a SHAPE (text with
    * every digit run collapsed to `0`, case-folded) are instances of
    * one fill-in template — invoices, listings, log lines, SEO spam —
    * which exact dedup misses (the fills differ) and near-dup treats
    * too leniently (large templates swamp MinHash bands). Emits every
    * doc with its shape digest, template-group size, and the
    * `is_template` verdict at `minGroup`.
    *
    * Scale shape: one narrow shape-digest projection, then ONE
    * shape-keyed exchange for the whole-partition count window (no
    * sort — the frame is the full partition). Group sizes are
    * Zipf-bounded by real template populations; a pathological
    * mega-template bounds one task's count, not a sort.
    */
  def templateSpam(
      documents: DataFrame,
      minGroup: Int = 5,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shape = md5(regexp_replace(lower(col(textCol)), "[0-9]+", "0"))
    val w = Window.partitionBy("shape_md5")
    documents
      .select(col(idCol).cast("long").as("doc_id"), shape.as("shape_md5"))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_template", col("group_size") >= minGroup)
  }
}

/** MinHash parameter table, computed once per JVM per size. */
private object MinhashParams {
  @transient private var cache: Map[Int, Array[(Long, Long)]] = Map.empty
  def value(n: Int): Array[(Long, Long)] = synchronized {
    cache.getOrElse(n, {
      val p = TextHashing.minhashParams(n)
      cache += (n -> p); p
    })
  }
}
