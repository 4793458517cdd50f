package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scalar-quantization ANN (the FAISS `ScalarQuantizer` QT_8bit
  * layout, public algorithm; see also Guo et al.'s uniform SQ
  * baselines) — the third compression rung of the similarity family:
  * [[IvfSearch]] prunes cells over exact vectors, [[PqSearch]] replaces
  * vectors with m sub-codebook codes, SQ keeps EVERY dimension but
  * stores it as one uint8: `code_i = round((x_i − min_i) / (max_i −
  * min_i) · 255)` against per-dimension corpus min/max — a 4× (float32)
  * compression with no codebook fit at all, the cheapest index to
  * train and the standard re-rank layer under a coarser index.
  *
  * Determinism/mirroring discipline: the trained stats are exact
  * per-dimension min/max (no sampling, no iteration — replayable by a
  * single SQL aggregate); encode is `floor(t·255 + 0.5)` on the
  * normalized value (half-up, the recorded x ≥ 0 emit rule); scoring
  * is ASYMMETRIC (full-precision query against decoded corpus codes,
  * FAISS ADC convention) with the squared-L2 fold running in ascending
  * dimension order on both engines — one `floor(d²·1e6 + 0.5)` per
  * pair, exact across engines (the ann_brute_l2 pattern).
  *
  * Scale shape (100 TB corpus, 1000 executors):
  *   - train: ONE narrow pass; the (dim, x) explode collapses map-side
  *     to partitions × dim partial min/max rows and only 2×dim doubles
  *     reach the driver, broadcast back (~1 KB at dim 64).
  *   - encode + score: ONE narrow typed pass — per row, dim integer
  *     encodes, then per query a dim-length decode/fold against the
  *     broadcast full-precision query vectors. No join, no corpus
  *     shuffle; ranking is the bounded partial top-k ([[TopK]]).
  *   - in a production store the codes persist at release (the
  *     [[PqSearch]] incremental convention) and probes pay only the
  *     decode scan; at this SF the in-query encode keeps the oracle
  *     replayable.
  */
object SqSearch {

  /** SQ8 top-k by asymmetric distance: train per-dimension min/max,
    * encode the corpus to uint8 codes, score every (query, vector)
    * pair by exact-query-vs-decoded-code squared L2, return the k
    * nearest by (micro distance asc, vec_id) per query.
    *
    * @return (qid, rnk, vec_id, adist_micro) — adist_micro the integer
    *         micro-L2 of the asymmetric distance, exact across engines
    */
  def sq8TopK(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      topK: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(topK > 0, s"invalid topK=$topK")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = Dedup.spread(embeddings.select(
        col(idCol).cast("long").as("vec_id"),
        col(vecCol).cast("array<double>").as("v"))
        .filter(col("v").isNotNull))
      .as[(Long, Array[Double])]
      .persist(StorageLevel.MEMORY_AND_DISK)

    // train: per-dimension min/max — map-side partials collapse the
    // exchange to partitions × dim rows; 2×dim doubles to the driver
    val stats = e.flatMap { case (_, v) =>
        v.iterator.zipWithIndex.map { case (x, j) => (j, x) }
      }
      .toDF("j", "x").groupBy("j")
      .agg(min("x").as("mn"), max("x").as("mx"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val mns = stats.map(_._2)
    val mxs = stats.map(_._3)

    // query fixture vectors (bounded by |queryIds|, the ANN convention)
    val qRows = e.filter(col("vec_id").isin(queryIds: _*)).collect()
      .sortBy(_._1)
    val bcQ = spark.sparkContext.broadcast(qRows)
    val bcMn = spark.sparkContext.broadcast(mns)
    val bcMx = spark.sparkContext.broadcast(mxs)

    // encode + score in ONE narrow pass: dim half-up encodes per row,
    // then per query the ascending-dim decode/fold — the ADC scan
    val scored = e.mapPartitions { it =>
      val qs = bcQ.value
      val mn = bcMn.value
      val mx = bcMx.value
      it.flatMap { case (vid, v) =>
        val codes = new Array[Int](v.length)
        var i = 0
        while (i < v.length) {
          codes(i) =
            if (mx(i) > mn(i))
              math.floor((v(i) - mn(i)) / (mx(i) - mn(i)) * 255.0 + 0.5).toInt
            else 0
          i += 1
        }
        qs.iterator.filter(_._1 != vid).map { case (qid, qv) =>
          var s = 0.0
          var j = 0
          while (j < v.length) {
            val dec = mn(j) + codes(j) * (mx(j) - mn(j)) / 255.0
            val d = qv(j) - dec
            s += d * d
            j += 1
          }
          (qid, vid, math.floor(s * 1e6 + 0.5).toLong)
        }
      }
    }.toDF("qid", "vec_id", "adist_micro")
    e.unpersist(blocking = false)
    TopK.byGroupAsc(scored, "qid", "adist_micro", "vec_id", topK)
      .select(col("qid"), col("rnk"), col("vec_id"), col("adist_micro"))
  }
}
