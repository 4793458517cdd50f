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
    // driver — never the corpus); the same collect yields the dimension
    val seeds = e.orderBy("vec_id").limit(k).collect().map(_._2)
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
    // distance tables: micro-long d(q_sub, codebook[sub][code])
    val qRows = e.filter(col("vec_id").isin(queryIds: _*)).collect()
      .sortBy(_._1)
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
    val w = Window.partitionBy("qid").orderBy(col("adist_micro"), col("vec_id"))
    scored.withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= topK)
      .select(col("qid"), col("rnk"), col("vec_id"), col("adist_micro"))
  }
}
