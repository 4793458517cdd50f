package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Product-quantization ANN (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011 — public
  * algorithm) — the compressed-domain scale path of the similarity
  * family, next to [[IvfSearch]] (cell-pruned exact vectors) and
  * [[Similarity.lshTopK]] (bucket-pruned exact vectors): PQ replaces
  * the vectors themselves. The vector space is split into `m`
  * subspaces; each subspace gets its own tiny k-means codebook; a
  * vector is stored as `m` small codes (here 8×3 bits vs 64×32-bit
  * floats — a 96× compression at production parameters of 8×8 bits vs
  * 768×32); queries score the whole corpus through per-query lookup
  * tables without ever touching a float vector again (asymmetric
  * distance computation, ADC).
  *
  * Determinism/mirroring discipline (the [[Clustering.kmeans]] Lloyd
  * contract, per subspace): init = the k smallest ids' subvectors;
  * per-step squared-L2 argmin ROUNDED at 6 dp before comparison, ties
  * to the lower code; mean updates rounded at 6 dp; empty codes drop.
  * ADC distances cross the engine boundary as integer MICRO-distances
  * (round-6 per-subspace distance × 1e6, rinted to a long): the
  * per-pair score is a SUM OF m INTEGERS, so fold order cannot move
  * it — the [[Dedup]] micro-sum pattern that keeps doubles bit-equal
  * across engines without a final rounding edge.
  *
  * Scale shape (100 TB corpus, 1000 executors):
  *   - codebook fit: `iters` narrow corpus passes (broadcast m×k×subDim
  *     doubles — ~4 KB here, ~1 MB at production 8×256×96) with the
  *     update exchange collapsed map-side to partitions × m×k×subDim
  *     partial rows; the driver only ever holds the codebook. At
  *     corpus scale the fit runs on a hash-sample exactly like
  *     [[IvfSearch.fitCentroids]]'s `fitSampleMod` — the full-corpus
  *     fit here keeps the oracle replayable at test SF.
  *   - encode + score: ONE narrow typed pass over the corpus — per row,
  *     m argmins (encode) then, per query, m lookups into the broadcast
  *     distance tables (#queries × m × k longs) and an integer add.
  *     No join, no shuffle; the only exchange is the final
  *     per-query top-k (the [[Similarity.bruteForceTopK]] window,
  *     #queries-bounded partitions). In a production store the encode
  *     runs ONCE at release (codes persisted like the dd15 band index)
  *     and queries pay only the table-lookup scan.
  */
object PqSearch {

  /** Squared L2 over a subvector range, rounded at 6 dp — the
    * comparison value every argmin and every ADC table entry uses.
    */
  private[operators] def subDist(
      v: Array[Double], off: Int, c: Array[Double]): Double = {
    val n = math.min(c.length, math.max(v.length - off, 0))
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = v(off + i) - c(i)
      s += d * d
      i += 1
    }
    TextAnalysis.round6(s)
  }

  /** Round-6 argmin over one subspace's codes, ties to the lower code
    * (codes arrive in code order — the [[Clustering.nearest]] rule).
    */
  private[operators] def nearestCode(
      codes: Array[(Int, Array[Double])], v: Array[Double], off: Int): Int = {
    var best = -1
    var bestD = Double.MaxValue
    var c = 0
    while (c < codes.length) {
      val d = subDist(v, off, codes(c)._2)
      if (d < bestD) { bestD = d; best = codes(c)._1 }
      c += 1
    }
    best
  }

  /** PQ top-k by asymmetric distance: fit per-subspace codebooks,
    * encode the corpus, score every (query, vector) pair through the
    * query's micro-integer distance tables, return the k nearest by
    * (approx distance asc, vec_id) per query.
    *
    * @param queryIds probe fixture ids (the ANN convention); bounded —
    *                 their raw vectors and distance tables live on the
    *                 driver/broadcast (#queries × m × k longs)
    * @return (qid, rnk, vec_id, adist_micro) — adist_micro the integer
    *         micro-L2 ADC distance (sum of m round-6 subspace
    *         distances × 1e6), exact across engines
    */
  def pqTopK(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      m: Int = 8,
      k: Int = 8,
      iters: Int = 2,
      topK: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(m > 0 && k > 0 && iters >= 1, s"invalid m=$m k=$k iters=$iters")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = Dedup.spread(embeddings.select(
        col(idCol).cast("long").as("vec_id"),
        col(vecCol).cast("array<double>").as("v"))
        .filter(col("v").isNotNull))
      .as[(Long, Array[Double])]
      .persist(StorageLevel.MEMORY_AND_DISK)

    // init: the k smallest ids' subvectors, per subspace (k rows to the
    // driver — never the corpus); the same collect yields the dimension.
    // ONE fixture job replaces the r19 pair (TakeOrdered seeds job +
    // qRows filter-collect job): each partition emits its k smallest-id
    // rows (a superset of the global k smallest) plus its queryId
    // matches — partitions × (k + |queryIds|) rows to the driver, no
    // exchange. The union-limit merge was rejected in r19 on plan
    // grounds (limit(orderBy) inside a union loses TakeOrderedAndProject
    // and plans a global sort); this partition-local form keeps both
    // originals' bounded-rows-to-driver property with zero plan cost.
    val qSet = queryIds.toSet
    val kk = k
    val fixture = e.mapPartitions { it =>
      val heap = new scala.collection.mutable.PriorityQueue[(Long, Array[Double])]()(
        Ordering.by(_._1))
      val qs = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
      it.foreach { r =>
        if (qSet.contains(r._1)) qs += r
        heap.enqueue(r)
        if (heap.size > kk) { heap.dequeue(); () }
      }
      (heap.iterator ++ qs.iterator).toMap.iterator // dedupe by id
    }.collect()
    val fixtureRows = fixture.toSeq.distinctBy(_._1)
    val seeds = fixtureRows.sortBy(_._1).take(kk).map(_._2).toArray
    val dim = seeds.head.length
    require(dim % m == 0, s"dim=$dim not divisible into m=$m subspaces")
    val subDim = dim / m
    var books: Array[Array[(Int, Array[Double])]] =
      Array.tabulate(m) { sub =>
        seeds.zipWithIndex.map { case (v, i) =>
          (i, v.slice(sub * subDim, (sub + 1) * subDim))
        }
      }

    // Lloyd updates: ONE corpus pass covers all m subspaces — each row
    // explodes to m×subDim (sub, code, i, x) cells; map-side partials
    // collapse the exchange to partitions × m×k×subDim rows and only
    // m×k×subDim means reach the driver, rounded 6 dp. Empty codes drop
    // (the cl1 empty-cluster rule).
    var it = 1
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(books)
      val means =
        try {
          e.flatMap { case (_, v) =>
            val bks = bc.value
            val sd = bks(0)(0)._2.length
            (0 until bks.length).iterator.flatMap { sub =>
              val code = nearestCode(bks(sub), v, sub * sd)
              (0 until sd).iterator.map(i => (sub, code, i, v(sub * sd + i)))
            }
          }.toDF("sub", "code", "i", "x")
            .groupBy("sub", "code", "i")
            .agg(avg("x").as("mn"))
            .collect()
        } finally bc.destroy()
      books = means.groupBy(_.getInt(0)).toArray.sortBy(_._1).map {
        case (_, subRows) =>
          subRows.groupBy(_.getInt(1)).toArray.sortBy(_._1).map {
            case (code, rows) =>
              val arr = new Array[Double](subDim)
              rows.foreach(r => arr(r.getInt(2)) = TextAnalysis.round6(r.getDouble(3)))
              (code, arr)
          }
      }
      it += 1
    }

    // query fixture vectors (bounded by |queryIds|) -> per-query ADC
    // distance tables: micro-long d(q_sub, codebook[sub][code]);
    // already on the driver from the merged fixture job above
    val qRows = fixtureRows.filter(r => qSet.contains(r._1)).sortBy(_._1).toArray
    val finalBooks = books
    val tables: Array[(Long, Array[Array[Long]])] = qRows.map { case (qid, qv) =>
      val t = Array.tabulate(m) { sub =>
        val byCode = finalBooks(sub)
        val row = new Array[Long](byCode.map(_._1).max + 1)
        byCode.foreach { case (code, c) =>
          row(code) = math.rint(subDist(qv, sub * subDim, c) * 1e6).toLong
        }
        row
      }
      (qid, t)
    }

    // encode + score in ONE narrow pass: m argmins per row, then per
    // query m table lookups and an integer add — the ADC scan. The
    // only exchange after this is the #queries-partition top-k window.
    val bcBooks = spark.sparkContext.broadcast(finalBooks)
    val bcTables = spark.sparkContext.broadcast(tables)
    val scored = e.flatMap { case (vid, v) =>
      val bks = bcBooks.value
      val sd = bks(0)(0)._2.length
      val codes = Array.tabulate(bks.length)(sub => nearestCode(bks(sub), v, sub * sd))
      bcTables.value.iterator.collect {
        case (qid, t) if qid != vid =>
          var ad = 0L
          var sub = 0
          while (sub < codes.length) { ad += t(sub)(codes(sub)); sub += 1 }
          (qid, vid, ad)
      }
    }.toDF("qid", "vec_id", "adist_micro")
    e.unpersist(blocking = false)
    // bounded partial top-k (ascending ADC distance) — see TopK: the
    // qid rank window capped parallelism at the query count
    TopK.byGroupAsc(scored.select(col("qid"), col("adist_micro"), col("vec_id")),
      "qid", "adist_micro", "vec_id", topK)
      .select(col("qid"), col("rnk"), col("vec_id"), col("adist_micro"))
  }

  /** Driver-side per-subspace Lloyd fit over an already-bounded sample —
    * the [[pqTopK]] fit arithmetic (first-k-ids init, round-6 argmin with
    * lower-code ties, round-6 means, empty codes drop) with the
    * distributed update pass collapsed to a driver loop: over a bounded
    * sample the pass is pure scheduling overhead (the
    * [[IvfSearch.fitCentroids]] rationale). Summation runs in ascending
    * sample-id order; round-6 keeps it interchangeable with the
    * partition-order avg() of the distributed fit and with SQL.
    */
  private[operators] def fitCodebooksOnSample(
      sample: Array[(Long, Array[Double])],
      m: Int,
      k: Int,
      iters: Int): Array[Array[(Int, Array[Double])]] = {
    require(sample.nonEmpty, "PQ fit sample is empty")
    val dim = sample.head._2.length
    require(dim % m == 0, s"dim=$dim not divisible into m=$m subspaces")
    val subDim = dim / m
    var books: Array[Array[(Int, Array[Double])]] =
      Array.tabulate(m) { sub =>
        sample.take(k).zipWithIndex.map { case ((_, v), i) =>
          (i, v.slice(sub * subDim, (sub + 1) * subDim))
        }
      }
    var it = 1
    while (it < iters) {
      val prev = books
      books = Array.tabulate(m) { sub =>
        val byCode = prev(sub)
        val maxCode = byCode.map(_._1).max
        val sums = Array.fill(maxCode + 1)(new Array[Double](subDim))
        val counts = new Array[Long](maxCode + 1)
        sample.foreach { case (_, v) =>
          val code = nearestCode(byCode, v, sub * subDim)
          counts(code) += 1
          var j = 0
          while (j < subDim) { sums(code)(j) += v(sub * subDim + j); j += 1 }
        }
        (0 to maxCode).iterator.filter(counts(_) > 0).map { code =>
          (code, sums(code).map(s => TextAnalysis.round6(s / counts(code))))
        }.toArray
      }
      it += 1
    }
    books
  }

  /** A fitted IVF-PQ model: the coarse cell centroids plus the m
    * per-subspace codebooks — everything a probe needs besides the
    * encoded codes frame. Driver-bounded by construction
    * (nClusters×dim + m×k×subDim doubles).
    */
  final case class PqModel(
      centroids: Array[Array[Double]],
      books: Array[Array[(Int, Array[Double])]]) {
    def m: Int = books.length
    def subDim: Int = books(0)(0)._2.length
    def dim: Int = centroids(0).length
    def nClusters: Int = centroids.length
  }

  private[operators] def project(
      df: DataFrame, idCol: String, vecCol: String) = {
    val spark = df.sparkSession
    import spark.implicits._
    Dedup.spread(df.select(
        col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
        .filter(col("v").isNotNull))
      .as[(Long, Array[Double])]
  }

  /** Fit both quantizers from ONE bounded deterministic hash sample
    * ([[IvfSearch.collectFitSample]]) — the model-building half of
    * [[ivfPqTopK]], exposed so a release can fit ONCE and persist
    * ([[savePqModel]]); at corpus scale set `fitSampleMod` so the
    * sample filter prunes the scan.
    */
  def fitPqModel(
      corpus: DataFrame,
      m: Int = 8,
      k: Int = 8,
      nClusters: Int = 16,
      lloydIter: Int = 3,
      pqIters: Int = 2,
      fitSampleMod: Long = 1,
      fitMaxRows: Int = 4096,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): PqModel = {
    val sample = IvfSearch.collectFitSample(
      project(corpus, idCol, vecCol), fitSampleMod, fitMaxRows)
    val dim = sample.head._2.length
    require(dim % m == 0, s"dim=$dim not divisible into m=$m subspaces")
    PqModel(
      IvfSearch.fitCentroidsOnSample(sample, nClusters, lloydIter),
      fitCodebooksOnSample(sample, m, k, pqIters))
  }

  /** Encode a corpus against a fitted model: ONE narrow pass emitting
    * (vec_id, cell, codes) — the compressed index frame. The model
    * parameters ride the `codes` column metadata (the
    * [[Dedup.minhashBands]] stamp discipline) so a probe built with
    * mismatched m/k/nClusters fails fast instead of silently returning
    * garbage distances.
    */
  def encodePq(
      corpus: DataFrame,
      model: PqModel,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bcCs = spark.sparkContext.broadcast(model.centroids)
    val bcBooks = spark.sparkContext.broadcast(model.books)
    Dedup.stampIndexMeta(
      project(corpus, idCol, vecCol).map { case (vid, v) =>
        val cs = bcCs.value
        val bks = bcBooks.value
        val sd = bks(0)(0)._2.length
        val codes = Array.tabulate(bks.length)(sub =>
          nearestCode(bks(sub), v, sub * sd))
        (vid, IvfSearch.nearestCell(v, cs), codes)
      }.toDF("vec_id", "cell", "codes"),
      "codes", "pq_codes",
      Map("m" -> model.m.toLong, "k" -> model.books.map(_.length).max.toLong,
        "nClusters" -> model.nClusters.toLong, "dim" -> model.dim.toLong))
  }

  /** Incremental ADC probe of a PERSISTED code index: every batch
    * vector becomes a query — probe cells from the model's coarse
    * centroids, integer micro-distance tables against the codebooks,
    * then a broadcast equi-join on the cell id into the codes frame.
    * The released corpus is NEVER re-encoded (the
    * [[Dedup.incrementalNearDup]] steady-state contract: index frozen
    * at release, batches only probe).
    *
    * Driver state is COUNT-GATED (the [[Decontamination]] discipline):
    * batches of at most `maxDriverBatchRows` are collected to build the
    * per-query tables — batch-bounded driver state (#batch × m × k
    * longs), the bound every ANN fixture here carries, scored through a
    * broadcast lookup with zero extra exchanges. A larger batch never
    * touches the driver: it switches to the RELATIONAL ADC the oracle
    * replays — probe cells and the (qid, sub, code, µdist) table are
    * computed distributively from the batch itself, the codes frame
    * posexplodes its m codes, and the per-pair score is a (qid, vec_id)
    * partial-agg integer sum. Same integer arithmetic, same
    * (adist_micro, vec_id) tie order — the two paths are row-identical
    * (spec-pinned), the fallback just pays the m-fold explode and one
    * keyed exchange the broadcast path avoids.
    */
  def probePqCodes(
      batch: DataFrame,
      model: PqModel,
      codes: DataFrame,
      nProbe: Int = 4,
      topK: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxDriverBatchRows: Int = 65536): DataFrame = {
    require(nProbe > 0 && nProbe <= model.nClusters,
      s"invalid nProbe=$nProbe for nClusters=${model.nClusters}")
    require(maxDriverBatchRows > 0,
      s"invalid maxDriverBatchRows=$maxDriverBatchRows")
    Dedup.checkIndexMeta(codes, "codes", "pq_codes",
      Map("m" -> model.m.toLong,
        "k" -> model.books.map(_.length).max.toLong,
        "nClusters" -> model.nClusters.toLong,
        "dim" -> model.dim.toLong))
    val spark = batch.sparkSession
    import spark.implicits._
    val m = model.m
    val subDim = model.subDim
    val q = project(batch, idCol, vecCol)
    // ONE take(cap+1) job both decides the path and supplies the
    // broadcast rows (stops at cap+1 — never a full count of a huge
    // batch): a separate count-then-collect re-evaluated the source, so
    // a non-deterministic batch could pass the gate yet exceed the cap
    // at collect time, and every probe paid an extra Spark job
    val gateRows = q.take(maxDriverBatchRows + 1)
    val scored =
      if (gateRows.length <= maxDriverBatchRows) {
        val qRows = gateRows.sortBy(_._1)
        val probes = qRows.flatMap { case (qid, qv) =>
          IvfSearch.probeCellsOf(qv, model.centroids, nProbe).map(c => (qid, c))
        }.toSeq.toDF("qid", "cell")
        val tables: Map[Long, Array[Array[Long]]] = qRows.map { case (qid, qv) =>
          qid -> Array.tabulate(m) { sub =>
            val byCode = model.books(sub)
            val row = new Array[Long](byCode.map(_._1).max + 1)
            byCode.foreach { case (code, c) =>
              row(code) = math.rint(subDist(qv, sub * subDim, c) * 1e6).toLong
            }
            row
          }
        }.toMap
        val bcTables = spark.sparkContext.broadcast(tables)
        val adc = udf { (qid: Long, cs: Seq[Int]) =>
          val t = bcTables.value(qid)
          var s = 0L
          var sub = 0
          while (sub < t.length) { s += t(sub)(cs(sub)); sub += 1 }
          s
        }
        codes.join(broadcast(probes), "cell")
          .filter(col("vec_id") =!= col("qid"))
          .withColumn("adist_micro", adc(col("qid"), col("codes")))
      } else {
        // distributed fallback: nothing batch-sized on the driver — the
        // model (m×k×subDim + nClusters×dim doubles) broadcasts, probe
        // cells and ADC tables derive in narrow passes over the batch
        val bcCs = spark.sparkContext.broadcast(model.centroids)
        val bcBooks = spark.sparkContext.broadcast(model.books)
        val probes = q.flatMap { case (qid, qv) =>
          IvfSearch.probeCellsOf(qv, bcCs.value, nProbe).map(c => (qid, c))
        }.toDF("qid", "cell")
        val dt = q.flatMap { case (qid, qv) =>
          val bks = bcBooks.value
          val sd = bks(0)(0)._2.length
          bks.iterator.zipWithIndex.flatMap { case (book, sub) =>
            book.iterator.map { case (code, c) =>
              (qid, sub, code, math.rint(subDist(qv, sub * sd, c) * 1e6).toLong)
            }
          }
        }.toDF("qid", "sub", "code", "dmic")
        codes.join(probes, "cell")
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            posexplode(col("codes")).as(Seq("sub", "code")))
          .join(dt, Seq("qid", "sub", "code"))
          .groupBy("qid", "vec_id")
          .agg(sum("dmic").cast("long").as("adist_micro"))
      }
    // bounded partial top-k (ascending ADC distance) — see TopK: the
    // qid rank window capped parallelism at the query count
    TopK.byGroupAsc(scored.select(col("qid"), col("adist_micro"), col("vec_id")),
      "qid", "adist_micro", "vec_id", topK)
      .select(col("qid"), col("rnk"), col("vec_id"), col("adist_micro"))
  }

  private[operators] def residual(
      v: Array[Double], c: Array[Double]): Array[Double] = {
    val r = new Array[Double](v.length)
    var j = 0
    while (j < v.length) { r(j) = v(j) - c(j); j += 1 }
    r
  }

  /** Residual-encoding IVF-PQ model fit (the FAISS `by_residual=true`
    * layout, Jégou et al. 2011 §IV): the PQ codebooks quantize
    * `x − centroid(cell(x))` instead of `x` itself. Residuals cluster
    * tightly around the origin regardless of which coarse cell a vector
    * landed in, so the same m×k codebook budget spends its resolution
    * on local structure instead of re-describing cell positions —
    * recall at equal code size is ≥ the non-residual layout
    * (spec-audited against the emb4 panel). Same ONE bounded
    * deterministic hash sample fits both quantizers; the residual is a
    * plain IEEE subtraction against the round-6 centroid, identical in
    * both engines, so the whole chain stays hash-exact.
    */
  def fitPqModelResidual(
      corpus: DataFrame,
      m: Int = 8,
      k: Int = 8,
      nClusters: Int = 16,
      lloydIter: Int = 3,
      pqIters: Int = 2,
      fitSampleMod: Long = 1,
      fitMaxRows: Int = 4096,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): PqModel = {
    val sample = IvfSearch.collectFitSample(
      project(corpus, idCol, vecCol), fitSampleMod, fitMaxRows)
    val dim = sample.head._2.length
    require(dim % m == 0, s"dim=$dim not divisible into m=$m subspaces")
    val centroids = IvfSearch.fitCentroidsOnSample(sample, nClusters, lloydIter)
    val resSample = sample.map { case (id, v) =>
      (id, residual(v, centroids(IvfSearch.nearestCell(v, centroids))))
    }
    PqModel(centroids, fitCodebooksOnSample(resSample, m, k, pqIters))
  }

  /** Encode a corpus against a residual model: the same ONE narrow pass
    * as [[encodePq]], with the subspace argmins taken on
    * `v − centroid(cell(v))` — the cell assignment the pass computes
    * anyway. Stamped `pq_res_codes` so a non-residual probe cannot
    * silently consume a residual index (the distances would be garbage).
    */
  def encodePqResidual(
      corpus: DataFrame,
      model: PqModel,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bcCs = spark.sparkContext.broadcast(model.centroids)
    val bcBooks = spark.sparkContext.broadcast(model.books)
    Dedup.stampIndexMeta(
      project(corpus, idCol, vecCol).map { case (vid, v) =>
        val cs = bcCs.value
        val bks = bcBooks.value
        val sd = bks(0)(0)._2.length
        val cell = IvfSearch.nearestCell(v, cs)
        val r = residual(v, cs(cell))
        val codes = Array.tabulate(bks.length)(sub =>
          nearestCode(bks(sub), r, sub * sd))
        (vid, cell, codes)
      }.toDF("vec_id", "cell", "codes"),
      "codes", "pq_res_codes",
      Map("m" -> model.m.toLong, "k" -> model.books.map(_.length).max.toLong,
        "nClusters" -> model.nClusters.toLong, "dim" -> model.dim.toLong))
  }

  /** Residual ADC probe of a `pq_res_codes` index. Distance tables are
    * per (query, PROBED CELL): the query's residual against cell c is
    * `q − centroid(c)`, so each of the query's `nProbe` cells gets its
    * own m×k micro-distance table — driver state #batch × nProbe × m × k
    * longs under the same count gate as [[probePqCodes]], with the same
    * relational join-in ADC fallback above the cap (dt gains the cell
    * key, everything else is shape-identical; spec-pinned row-equal).
    */
  def probePqCodesResidual(
      batch: DataFrame,
      model: PqModel,
      codes: DataFrame,
      nProbe: Int = 4,
      topK: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxDriverBatchRows: Int = 65536): DataFrame = {
    require(nProbe > 0 && nProbe <= model.nClusters,
      s"invalid nProbe=$nProbe for nClusters=${model.nClusters}")
    Dedup.checkIndexMeta(codes, "codes", "pq_res_codes",
      Map("m" -> model.m.toLong,
        "k" -> model.books.map(_.length).max.toLong,
        "nClusters" -> model.nClusters.toLong,
        "dim" -> model.dim.toLong))
    val spark = batch.sparkSession
    import spark.implicits._
    val m = model.m
    val subDim = model.subDim
    val q = project(batch, idCol, vecCol)
    // same single-job take(cap+1) gate as probePqCodes (see the note
    // there): one scan decides the path and feeds the broadcast rows
    val gateRows = q.take(maxDriverBatchRows + 1)
    val scored =
      if (gateRows.length <= maxDriverBatchRows) {
        val qRows = gateRows.sortBy(_._1)
        val probes = qRows.flatMap { case (qid, qv) =>
          IvfSearch.probeCellsOf(qv, model.centroids, nProbe).map(c => (qid, c))
        }.toSeq.toDF("qid", "cell")
        val tables: Map[(Long, Int), Array[Array[Long]]] =
          qRows.iterator.flatMap { case (qid, qv) =>
            IvfSearch.probeCellsOf(qv, model.centroids, nProbe).map { cell =>
              val qr = residual(qv, model.centroids(cell))
              (qid, cell) -> Array.tabulate(m) { sub =>
                val byCode = model.books(sub)
                val row = new Array[Long](byCode.map(_._1).max + 1)
                byCode.foreach { case (code, c) =>
                  row(code) = math.rint(subDist(qr, sub * subDim, c) * 1e6).toLong
                }
                row
              }
            }
          }.toMap
        val bcTables = spark.sparkContext.broadcast(tables)
        val adc = udf { (qid: Long, cell: Int, cs: Seq[Int]) =>
          val t = bcTables.value((qid, cell))
          var s = 0L
          var sub = 0
          while (sub < t.length) { s += t(sub)(cs(sub)); sub += 1 }
          s
        }
        codes.join(broadcast(probes), "cell")
          .filter(col("vec_id") =!= col("qid"))
          .withColumn("adist_micro", adc(col("qid"), col("cell"), col("codes")))
      } else {
        val bcCs = spark.sparkContext.broadcast(model.centroids)
        val bcBooks = spark.sparkContext.broadcast(model.books)
        val probes = q.flatMap { case (qid, qv) =>
          IvfSearch.probeCellsOf(qv, bcCs.value, nProbe).map(c => (qid, c))
        }.toDF("qid", "cell")
        val dt = q.flatMap { case (qid, qv) =>
          val cs = bcCs.value
          val bks = bcBooks.value
          val sd = bks(0)(0)._2.length
          IvfSearch.probeCellsOf(qv, cs, nProbe).iterator.flatMap { cell =>
            val qr = residual(qv, cs(cell))
            bks.iterator.zipWithIndex.flatMap { case (book, sub) =>
              book.iterator.map { case (code, c) =>
                (qid, cell, sub, code,
                  math.rint(subDist(qr, sub * sd, c) * 1e6).toLong)
              }
            }
          }
        }.toDF("qid", "cell", "sub", "code", "dmic")
        codes.join(probes, "cell")
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("cell"), col("vec_id"),
            posexplode(col("codes")).as(Seq("sub", "code")))
          .join(dt, Seq("qid", "cell", "sub", "code"))
          .groupBy("qid", "vec_id")
          .agg(sum("dmic").cast("long").as("adist_micro"))
      }
    // bounded partial top-k (ascending ADC distance) — see TopK: the
    // qid rank window capped parallelism at the query count
    TopK.byGroupAsc(scored.select(col("qid"), col("adist_micro"), col("vec_id")),
      "qid", "adist_micro", "vec_id", topK)
      .select(col("qid"), col("rnk"), col("vec_id"), col("adist_micro"))
  }

  /** Residual IVF-PQ top-k (FAISS `by_residual=true`): [[ivfPqTopK]]'s
    * composition with the residual fit/encode/probe. Scale shape is
    * identical to the non-residual index — the residual subtraction
    * rides the existing narrow encode pass (the cell assignment it
    * needs is computed there anyway) and the probe tables grow by the
    * nProbe factor (still #queries-bounded). Recall at equal code
    * budget is ≥ plain PQ (spec-audited on the emb4 exact-L2 panel).
    */
  def ivfPqResidualTopK(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      m: Int = 8,
      k: Int = 8,
      nClusters: Int = 16,
      nProbe: Int = 4,
      lloydIter: Int = 3,
      pqIters: Int = 2,
      topK: Int = 10,
      fitSampleMod: Long = 1,
      fitMaxRows: Int = 4096,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(m > 0 && k > 0 && pqIters >= 1,
      s"invalid m=$m k=$k pqIters=$pqIters")
    val model = fitPqModelResidual(embeddings, m, k, nClusters, lloydIter,
      pqIters, fitSampleMod, fitMaxRows, idCol, vecCol)
    probePqCodesResidual(
      embeddings.filter(col(idCol).isin(queryIds: _*)),
      model,
      encodePqResidual(embeddings, model, idCol, vecCol),
      nProbe, topK, idCol, vecCol)
  }

  private val PqModelMagic = 0x47505151 // "GPQQ"

  /** Persist a fitted model (coarse centroids + codebooks) — the
    * [[IvfSearch.saveCentroids]] discipline: versioned magic header,
    * fixed layout, zero Spark jobs either direction. Cell and code
    * order are part of the index identity (codes are index-addressed),
    * so both arrays round-trip order-exact.
    */
  def savePqModel(model: PqModel, path: java.nio.file.Path): Unit = {
    java.nio.file.Files.createDirectories(path.getParent)
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(path)))
    try {
      out.writeInt(PqModelMagic)
      out.writeInt(1) // version
      out.writeInt(model.centroids.length)
      model.centroids.foreach { c =>
        out.writeInt(c.length)
        c.foreach(out.writeDouble)
      }
      out.writeInt(model.books.length)
      model.books.foreach { book =>
        out.writeInt(book.length)
        book.foreach { case (code, c) =>
          out.writeInt(code)
          out.writeInt(c.length)
          c.foreach(out.writeDouble)
        }
      }
    } finally out.close()
  }

  /** Load a model persisted by [[savePqModel]]; zero Spark jobs. */
  def loadPqModel(path: java.nio.file.Path): PqModel = {
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      java.nio.file.Files.newInputStream(path)))
    try {
      require(in.readInt() == PqModelMagic, s"not a PQ model file: $path")
      val version = in.readInt()
      require(version == 1, s"unknown PQ model version $version")
      val centroids = Array.fill(in.readInt()) {
        val c = new Array[Double](in.readInt())
        var j = 0
        while (j < c.length) { c(j) = in.readDouble(); j += 1 }
        c
      }
      val books = Array.fill(in.readInt()) {
        Array.fill(in.readInt()) {
          val code = in.readInt()
          val c = new Array[Double](in.readInt())
          var j = 0
          while (j < c.length) { c(j) = in.readDouble(); j += 1 }
          (code, c)
        }
      }
      PqModel(centroids, books)
    } finally in.close()
  }

  /** IVF-PQ top-k (the FAISS IVFPQ layout, non-residual variant —
    * `by_residual=false` in the public API): [[IvfSearch]]'s
    * deterministic coarse quantizer prunes the corpus to each query's
    * `nProbe` nearest cells; within visited cells scoring is [[pqTopK]]'s
    * integer ADC over m-code compressed vectors. BOTH quantizers fit on
    * ONE bounded deterministic hash sample
    * ([[IvfSearch.collectFitSample]]) — at corpus scale the fit never
    * scans the data (set `fitSampleMod`), and the sample collect is a
    * single job.
    *
    * Scale shape on top of [[pqTopK]]'s: the corpus pass additionally
    * assigns the coarse cell (nClusters distances), and scoring becomes
    * a broadcast equi-join on the cell id against the #queries × nProbe
    * probe list — so per-query ADC work scans nProbe/nClusters of the
    * codes, and with codes persisted partitioned by cell (the dd15 band
    * index discipline) the scan itself prunes. Distances stay integer
    * micro-sums end to end.
    */
  def ivfPqTopK(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      m: Int = 8,
      k: Int = 8,
      nClusters: Int = 16,
      nProbe: Int = 4,
      lloydIter: Int = 3,
      pqIters: Int = 2,
      topK: Int = 10,
      fitSampleMod: Long = 1,
      fitMaxRows: Int = 4096,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(m > 0 && k > 0 && pqIters >= 1,
      s"invalid m=$m k=$k pqIters=$pqIters")
    // fit once, encode once, probe the fixture ids — exactly the
    // build-index / probe-batch composition ([[fitPqModel]] /
    // [[encodePq]] / [[probePqCodes]]), with the fixture queries drawn
    // from the corpus itself. Each stage scans its input narrowly; no
    // shared cache is needed because no stage is consumed twice.
    val model = fitPqModel(embeddings, m, k, nClusters, lloydIter, pqIters,
      fitSampleMod, fitMaxRows, idCol, vecCol)
    probePqCodes(
      embeddings.filter(col(idCol).isin(queryIds: _*)),
      model,
      encodePq(embeddings, model, idCol, vecCol),
      nProbe, topK, idCol, vecCol)
  }
}
