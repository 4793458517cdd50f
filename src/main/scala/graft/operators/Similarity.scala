package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small)
  *     query set against the corpus; one narrow pass over the corpus plus
  *     a per-query top-k window, no corpus self-shuffle. The oracle
  *     baseline.
  *   - [[lshTopK]]: random-hyperplane LSH — per-row signature, candidates
  *     restricted to the query's bucket (and its 1-bit neighbors for
  *     recall), so corpus work scales with bucket size, not corpus size.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector.
    *
    * Ranking is on the 4-decimal-rounded similarity with the id as
    * tiebreak, so result order is deterministic and engine-independent.
    */
  def bruteForceTopK(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val e = Dedup.spread(
      embeddings.select(col(idCol), col(vecCol).cast("array<double>").as("v")))
    val q = e.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("qid"), col("v").as("qv"))
    val scored = e.join(broadcast(q), col(idCol) =!= col("qid"))
      .withColumn("sim",
        round(graft.functions.GraftFunctions.cosine_similarity(col("qv"), col("v")), 4))
    // bounded partial top-k, not a qid rank window: every corpus
    // partition reduces to <= k candidates per query before the
    // shuffle (see TopK — the window form sorted the whole corpus
    // inside #queries partitions)
    TopK.bySimDesc(scored, "qid", "sim", idCol, k)
  }

  /** Exact squared-L2 top-k — the metric-matched baseline for the PQ
    * family ([[PqSearch]] quantizes L2, so its recall audit must
    * compare against exact L2, not cosine). Same shape as
    * [[bruteForceTopK]]: broadcast query set, one corpus pass, per-query
    * top-k window. Distances cross the engine boundary as integer
    * MICRO-L2 (`floor(d²·1e6 + 0.5)`): the raw double folds in ascending
    * dim order on both engines (the codegen
    * [[graft.functions.SquaredL2]] loop vs `list_sum(list_transform)`),
    * so the integer is exact — no final rounding edge.
    */
  def bruteForceTopKL2(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val e = Dedup.spread(
      embeddings.select(col(idCol), col(vecCol).cast("array<double>").as("v")))
    val q = e.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("qid"), col("v").as("qv"))
    val scored = e.join(broadcast(q), col(idCol) =!= col("qid"))
      .withColumn("dist_micro",
        floor(graft.functions.GraftFunctions.squared_l2(col("qv"), col("v")) * lit(1e6)
          + lit(0.5)).cast("long"))
    // bounded partial top-k (ascending distance) — see bruteForceTopK
    TopK.byGroupAsc(scored.select(col("qid"), col("dist_micro"), col(idCol)),
      "qid", "dist_micro", idCol, k)
      .select(col("qid"), col("rnk"), col(idCol), col("dist_micro"))
  }

  /** Hard-negative mining for contrastive training — per query, the
    * top-k NEAREST candidates that are NOT positives, where "positive"
    * = anything closer than `dupThreshMicro` (near-duplicates and
    * same-source variants must never be served as negatives; the
    * standard in-batch-negatives curation step). Emits `n_pos` (how
    * many candidates the positive band excluded) alongside each row so
    * the band's effect is visible — and hash-checked — in the output.
    *
    * Scale shape: [[bruteForceTopKL2]]'s broadcast-query single corpus
    * pass (the documented brute baseline; swap an IVF/PQ candidate
    * frame in at corpus scale), with the positive count folded into the
    * SAME bounded top-k aggregate as the rank (see [[TopK]]) — one
    * exchange total, ≤ k buffered entries per query per partition.
    * Distances are integer micro-L2 end to end.
    */
  def hardNegatives(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      dupThreshMicro: Long = 1400000L,
      k: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(dupThreshMicro >= 0, s"invalid dupThreshMicro=$dupThreshMicro")
    val e = Dedup.spread(
      embeddings.select(col(idCol), col(vecCol).cast("array<double>").as("v")))
    val q = e.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("qid"), col("v").as("qv"))
    val scored = e.join(broadcast(q), col(idCol) =!= col("qid"))
      .withColumn("dist_micro",
        floor(graft.functions.GraftFunctions.squared_l2(col("qv"), col("v")) * lit(1e6)
          + lit(0.5)).cast("long"))
    // ONE bounded aggregate does double duty (the window form's single
    // pass, kept — but with <= k buffered entries per query instead of
    // a full qid-partition sort): positives enter the top-k with a
    // Long.MinValue score so they sort AFTER every negative (ranks
    // 1..#negatives are exactly the nearest non-positives, as before)
    // and are dropped post-explode, while n_pos folds into the same
    // groupBy as a plain conditional sum.
    val topk = udaf(new graft.functions.TopKScoredAgg(k))
    scored.groupBy("qid")
      .agg(
        topk(when(col("dist_micro") < dupThreshMicro, lit(Long.MinValue))
            .otherwise(-col("dist_micro")), col(idCol)).as("top"),
        sum(when(col("dist_micro") < dupThreshMicro, 1L).otherwise(0L))
          .cast("long").as("n_pos"))
      .select(col("qid"), col("n_pos"), posexplode(col("top")))
      .filter(col("col.score") =!= Long.MinValue)
      .select(col("qid"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.id").as(idCol), (-col("col.score")).as("dist_micro"),
        col("n_pos"))
  }

  /** Label-noise screen: for each audited vector, the majority label of
    * its k nearest neighbors vs its own — the neighborhood-agreement
    * mislabel detector (the intuition behind confident-learning-style
    * label QA: a point whose neighborhood votes against its tag is a
    * probable annotation error or an out-of-distribution straggler).
    * Output per query id: (qid, own_label, top_label, votes, agree),
    * ties in the vote broken toward the lower label id.
    *
    * Scale shape: audits run on a query SAMPLE (`queryIds`, the ANN
    * convention) — the default pair frame is [[bruteForceTopK]]'s
    * broadcast-query scan (ONE corpus pass, the labelled brute
    * baseline); at corpus scale pass `pairs =` an
    * [[IvfSearch.ivfTopK]] result (same (qid, rnk, vec_id, sim)
    * shape) and the vote/argmax stages reuse it unchanged — they are
    * keyed aggs on a #queries×k frame, dimension-sized by
    * construction.
    */
  def labelNoiseScreen(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      labelCol: String = "label",
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      pairs: Option[DataFrame] = None): DataFrame = {
    val topk = pairs.getOrElse(bruteForceTopK(embeddings, queryIds, k, idCol, vecCol))
    val labels = embeddings.select(
      col(idCol).cast("long").as(idCol), col(labelCol).cast("int").as("lbl"))
    val votes = topk.select(col("qid").cast("long").as("qid"), col(idCol))
      .join(labels, idCol)
      .groupBy("qid", "lbl").agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy("qid").orderBy(col("votes").desc, col("lbl"))
    val top = votes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("qid"), col("lbl").as("top_label"), col("votes"))
    embeddings.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).cast("long").as("qid"),
        col(labelCol).cast("int").as("own_label"))
      .join(top, "qid")
      .select(col("qid"), col("own_label"), col("top_label"), col("votes"),
        (col("own_label") === col("top_label")).as("agree"))
  }

  /** Random-hyperplane signature: bit i = sign(v . h_i), with hyperplanes
    * drawn from a fixed-seed Gaussian so plans are deterministic across
    * runs and executors. Public so the DuckDB oracle SQL is generated
    * from the SAME constants (no drift between engine and check).
    */
  def hyperplanes(dim: Int, nBits: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(nBits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Probe ring: every bucket XOR mask at Hamming distance <= 2
    * (1 + nBits + C(nBits,2) masks). Near-orthogonal corpora (the worst
    * case for sign-LSH) need the wider ring for recall.
    */
  def probeFlips(nBits: Int): Seq[Int] = 0 +:
    (0 until nBits).map(1 << _) ++:
    (for { i <- 0 until nBits; j <- i + 1 until nBits } yield (1 << i) | (1 << j))

  /** Sub-quadratic embedding near-duplicate PAIRS (the scale path whose
    * oracle baseline is [[Dedup.embeddingNearDup]]'s brute force): an
    * `nBits` random-hyperplane signature per vector, banded like
    * SimHash (`nBits/bandBits` bands of `bandBits` bits; default 8×8,
    * the dd5b shape — dd5c pins the 128×16 wide shape whose 65536
    * buckets/band survive corpus sizes that saturate byte bands),
    * bucket-size-capped candidate pairs generated per bucket (one
    * groupBy shuffle, narrow pair fan-out), then exact cosine
    * verification of candidates only. Recall at sim s is
    * 1-(1-p^bandBits)^nBands with p = 1 - arccos(s)/pi (e.g. ~0.94 at
    * s = 0.9 for 8×8); every candidate is verified, so precision is
    * exact.
    *
    * The signature loop runs as a typed map with native folds (64 dots
    * of 64 dims/row; interpreted HOFs would be ~100x slower), ascending
    * index order so the SQL mirror's list_inner_product matches bit for
    * bit. Vectors must have exactly `dim` entries (checked per row — a
    * longer vector would silently truncate against the hyperplanes).
    *
    * The (id, vector) projection feeds three consumers (the signature
    * map and both verification-join sides), which share no canonical
    * exchange — so it is persisted to run the scan/shuffle once. At
    * extreme corpus scale MEMORY_AND_DISK spills the projection to
    * local disk; that is still one materialization instead of three
    * full passes.
    *
    * BANDING DEFAULT POLICY: the 64×8 default is sized for corpora up
    * to ~10^5 vectors — beyond that its 256 buckets/band saturate
    * (every bucket fills toward `maxBucket`, candidates go quadratic,
    * then the cap starts DROPPING whole buckets and recall collapses
    * quietly). For larger corpora pass `nBits = 128, bandBits = 16`
    * (the dd5c shape: same 8 bands, 65536 buckets each, recall curve
    * concentrated on high-sim pairs — soaked sub-linear at 2×10^5
    * where the default could not finish). Saturation is OBSERVABLE:
    * after any action, `result.queryExecution.observedMetrics
    * ("graft.lsh.bucket_occupancy")` carries (n_buckets, n_dropped,
    * n_near_cap); treat a nonzero n_dropped or a rising n_near_cap on
    * organic data as the switch-to-wide-bands signal.
    */
  def lshNearDupPairs(
      embeddings: DataFrame,
      threshold: Double = 0.45,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxBucket: Int = 1000,
      nBits: Int = 64,
      bandBits: Int = 8): DataFrame = {
    // the scale knob (see TextHashing.bands): buckets per band =
    // 2^bandBits. The 64×8 default saturates its 256 buckets around
    // ~10^5 random vectors (every bucket fills toward the cap and the
    // per-bucket pair fan-out goes quadratic — the r16 soak forensic);
    // the 128×16 wide shape (dd5c) keeps nBands=8 with 65536 buckets
    // per band, pushing saturation out by 256× at a recall curve
    // shifted toward higher-sim pairs.
    require(nBits >= bandBits && nBits % bandBits == 0,
      s"bad banding: $nBits bits into $bandBits-bit bands")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val planes: Array[Array[Double]] =
      hyperplanes(dim, nBits).map(_.toArray).toArray
    val e = Dedup.spread(embeddings
      .select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<double>").as("v")))
      .as[(Long, Array[Double])]
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ps = planes
    val d = dim
    val nb = nBits
    val bb = bandBits
    val sigs = e.map { case (id, v) =>
      require(v.length == d,
        s"lshNearDupPairs: vector for id=$id has ${v.length} dims, hyperplanes have $d")
      val bits = new Array[Int](nb)
      var i = 0
      while (i < nb) {
        var s = 0.0; var j = 0
        while (j < v.length) { s += v(j) * ps(i)(j); j += 1 }
        bits(i) = if (s >= 0) 1 else 0
        i += 1
      }
      // bandsLong (r19): same values as bands() for bandBits <= 30 —
      // no re-bucketing — but carries band widths up to 62 bits, so
      // skew soaks / extreme corpora can run e.g. 128×32 (4.3e9
      // buckets/band) where even 16-bit bands would contaminate
      (id, graft.functions.TextHashing.bandsLong(bits, bb))
    }.toDF("id", "bytes")
    // Candidate generation is ONE shuffle: group the banded rows by
    // bucket, collect the member ids, and emit each bucket's pairs with
    // a narrow flatMap — the classic LSH bucket-pair shape. The cap is
    // the same keep rule as [[Dedup.capDocFreq]] (buckets with more than
    // `maxBucket` members drop entirely), enforced through the
    // size-bounded collector ([[graft.functions.BoundedDocsAgg]], the
    // keyedSetJaccard pattern — r18: the plain collect_list buffered a
    // SATURATED bucket in full before the size filter could drop it;
    // the bounded agg stops at cap+1, so a 10M-member bucket costs one
    // cap-sized buffer), which bounds both the buffer memory and the
    // pair fan-out (<= cap^2/2 per bucket) at any corpus size. This
    // replaces the banded self-join, whose bucket-keyed exchange Spark
    // planned TWICE (no exchange reuse once one side broadcast).
    //
    // SATURATION OBSERVABILITY (the dd5c banding policy): after any
    // action on the returned frame, `queryExecution.observedMetrics
    // ("graft.lsh.bucket_occupancy")` reports (n_buckets, n_dropped,
    // n_near_cap — buckets at >= 90% of cap). A rising n_near_cap /
    // n_dropped is the signal to widen the banding BEFORE recall
    // collapses: the 64×8 default saturates its 256 buckets/band
    // around ~10^5 random vectors; switch to nBits=128, bandBits=16
    // (the dd5c shape, 65536 buckets/band) for corpora beyond that.
    val collectCapped = udaf(new graft.functions.BoundedDocsAgg(graft.functions.BoundedDocsAgg.keepFor(maxBucket)))
    val cand = sigs
      .select(col("id"), posexplode(col("bytes"))).toDF("id", "band", "byte_val")
      .groupBy("band", "byte_val").agg(collectCapped(col("id")).as("ids"))
      .observe("graft.lsh.bucket_occupancy",
        count(lit(1)).as("n_buckets"),
        sum(when(size(col("ids")) > maxBucket, 1L).otherwise(0L))
          .as("n_dropped"),
        sum(when(size(col("ids")) <= maxBucket &&
            size(col("ids")).cast("long") * 10L >= lit(maxBucket.toLong * 9L),
            1L).otherwise(0L))
          .as("n_near_cap"))
      .filter(size(col("ids")) <= maxBucket && size(col("ids")) > 1)
      .select(col("ids"))
      .as[Seq[Long]]
      .flatMap { ids =>
        val sorted = ids.sorted
        for { i <- sorted.indices; j <- i + 1 until sorted.length }
          yield (sorted(i), sorted(j))
      }
      .toDF("va", "vb").distinct()
    val ea = e.toDF("va", "x")
    val eb = e.toDF("vb", "y")
    // (ea/eb scan the persisted projection, not the source table)
    cand.join(ea, "va").join(eb, "vb")
      .withColumn("sim", graft.functions.GraftFunctions.cosine_similarity(col("x"), col("y")))
      .filter(col("sim") > threshold)
      .select(col("va"), col("vb"), round(col("sim"), 4).as("sim"))
  }

  /** Approximate top-k: candidates share the query's LSH bucket or any
    * bucket in its Hamming<=2 probe ring, then exact cosine + top-k
    * within candidates.
    *
    * Scale shape: the probe ring is expanded on the QUERY side (|Q| rows
    * -> |Q| x 37), never on the corpus — the corpus is scanned exactly
    * once, signed, and equi-joined against the broadcast probe list. A
    * corpus row can match a query through at most one mask (distinct
    * masks give distinct probe buckets), so no dedup shuffle is needed
    * after the join.
    */
  def lshTopK(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      nBits: Int = 8,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(dim, nBits)
    val planeCols = planes.map(p => array(p.map(lit): _*))
    val e = Dedup.spread(
      embeddings.select(col(idCol), col(vecCol).cast("array<double>").as("v")))
    def signature = planeCols.zipWithIndex
      .map { case (p, i) => when(dot(col("v"), p) >= 0, lit(1 << i)).otherwise(lit(0)) }
      .reduce(_ + _)
    val sig = e.withColumn("bucket", signature)

    val q = sig.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("qid"), col("v").as("qv"), col("bucket").as("qbucket"))
    val probes = q
      .select(col("qid"), col("qv"),
        explode(array(probeFlips(nBits).map(lit): _*)).as("flip"), col("qbucket"))
      .select(col("qid"), col("qv"), expr("qbucket ^ flip").as("probe_bucket"))

    val scored = sig.join(broadcast(probes),
        col("bucket") === col("probe_bucket") && col(idCol) =!= col("qid"))
      .withColumn("sim",
        round(graft.functions.GraftFunctions.cosine_similarity(col("qv"), col("v")), 4))
    // bounded partial top-k over the bucket-bounded candidates
    TopK.bySimDesc(scored, "qid", "sim", idCol, k)
  }

  /** Sparse random projection (Achlioptas 2003): reduce `embedding`
    * to `k` dimensions through a deterministic ±1/0 matrix derived
    * arithmetically from (i, j) — no materialized matrix, no
    * randomness source, so any worker (or engine) regenerates the
    * identical projection. `R(i,j) = ((i·1315423911 + j·2654435761)
    * mod 1000003) mod 3 − 1 ∈ {−1, 0, 1}`; `out[j] = Σᵢ v[i]·R(i,j)`
    * folded in index order (bit-reproducible), round-6 at the edge.
    *
    * Scale shape: a PURE NARROW pass — the fold is a codegen'd
    * higher-order `aggregate` over `zip_with(embedding, sequence)`;
    * no shuffle, no UDF, no driver state. The standard prefilter
    * before ANN/clustering when 64→8 dims keeps enough cosine
    * geometry (Johnson–Lindenstrauss).
    */
  def randomProjection(
      embeddings: DataFrame,
      k: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val outCols = (0 until k).map { j =>
      expr(
        s"""round(aggregate(
           |  zip_with($vecCol, sequence(0, size($vecCol) - 1),
           |    (x, i) -> CAST(x AS DOUBLE) *
           |      CAST(((CAST(i AS BIGINT) * 1315423911 + $j * 2654435761) % 1000003) % 3 - 1 AS DOUBLE)),
           |  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x), 6)""".stripMargin)
        .as(s"p$j")
    }
    embeddings.select(col(idCol) +: outCols: _*)
  }

  /** Matryoshka truncation audit: per label, how much of each vector's
    * L2 mass lives in the first `k` dimensions — the feasibility card
    * before switching ANN/clustering to cheap prefix-dim embeddings
    * (Kusupati et al. 2022). Per-vector mass is a round-4 double
    * computed by an index-ordered fold (bit-reproducible); the label
    * rollup uses only ORDER-FREE aggregates over those rounded values
    * (count, min, max, threshold count), so no cross-engine float
    * accumulation exists anywhere. One narrow pass + a label-keyed
    * partial agg; output is label-count-sized.
    */
  def matryoshkaAudit(
      embeddings: DataFrame,
      k: Int = 16,
      minMass: Double = 0.5,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val mass = expr(
      s"""round(
         |  aggregate(slice($vecCol, 1, $k), CAST(0.0 AS DOUBLE),
         |    (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
         |  / aggregate($vecCol, CAST(0.0 AS DOUBLE),
         |      (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 4)""".stripMargin)
    embeddings
      .select(col("label"), mass.as("mass"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("mass") >= minMass, 1L).otherwise(0L)).as("n_concentrated"),
        min("mass").as("min_mass"),
        max("mass").as("max_mass"))
  }

  /** ANN index QA: recall@k of an approximate result set against the
    * exact one — the acceptance number an IVF/LSH index ships with
    * (and re-checks after every re-fit). Both inputs are (qid, rnk,
    * id, …) top-k frames; output one row per query with hit count and
    * recall. One qid-keyed left join + rollup over k×|queries| rows —
    * probe-sample-sized, never corpus-sized: at scale you audit a
    * sampled query panel, not every vector.
    */
  def annRecall(
      exact: DataFrame,
      approx: DataFrame,
      k: Int,
      idCol: String = "vec_id"): DataFrame = {
    val hits = approx.select(col("qid"), col(idCol), lit(1L).as("hit"))
    exact.select(col("qid"), col(idCol))
      .join(hits, Seq("qid", idCol), "left")
      .groupBy("qid")
      .agg(sum(coalesce(col("hit"), lit(0L))).cast("long").as("n_hit"))
      .select(col("qid"), col("n_hit"),
        round(col("n_hit") / k, 4).as(s"recall_at_$k"))
  }
}
