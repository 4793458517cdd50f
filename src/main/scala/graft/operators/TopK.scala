package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group bounded top-k via [[graft.functions.TopKScoredAgg]] — the
  * scale-safe replacement for
  * `row_number() OVER (PARTITION BY g ORDER BY score ..., id)` + `rnk <= k`
  * across the retrieval and ANN operators.
  *
  * Why not the window: a rank window's final pass partitions by the
  * group key, so its parallelism is capped at the number of groups
  * (query ids — a handful) and, even with Spark's partial
  * WindowGroupLimit pushdown, every map partition first SORTS its
  * candidate rows. The aggregator form reduces each input partition to
  * at most k entries per group with an O(n·k) bounded insert (no local
  * sort), shuffles `partitions × groups × k` fixed-size rows, and the
  * final merge per group folds tiny sorted buffers. Output is
  * bit-identical to the window form: the selection order is total over
  * integer (score, id) pairs, so arrival and merge order cannot change
  * the kept set or its ranking.
  */
object TopK {

  /** Top-k per group, HIGHEST `scoreCol` first (ties: lowest `idCol`).
    * Input columns must be integer-typed (the micro-credit emit rule
    * keeps the order total and engine-independent). Output:
    * `(g, rnk, idCol, scoreCol)`, rnk 1-based best-first.
    */
  def byGroupDesc(
      scores: DataFrame,
      g: String,
      scoreCol: String,
      idCol: String,
      k: Int): DataFrame = {
    val topk = udaf(new graft.functions.TopKScoredAgg(k))
    scores.groupBy(g).agg(topk(col(scoreCol), col(idCol)).as("top"))
      .select(col(g), posexplode(col("top")))
      .select(col(g), (col("pos") + 1).cast("int").as("rnk"),
        col("col.id").as(idCol), col("col.score").as(scoreCol))
  }

  /** Top-k per group, LOWEST `scoreCol` first (distance metrics; ties:
    * lowest `idCol`) — negates through [[byGroupDesc]], exact on longs.
    */
  def byGroupAsc(
      scores: DataFrame,
      g: String,
      scoreCol: String,
      idCol: String,
      k: Int): DataFrame =
    byGroupDesc(
      scores.withColumn(scoreCol, -col(scoreCol)), g, scoreCol, idCol, k)
      .withColumn(scoreCol, -col(scoreCol))

  /** Top-k per group on a 4-dp-rounded DOUBLE similarity (the ANN
    * output convention), highest first. The already-rounded double
    * round-trips the aggregator as an exact deka-micro long
    * (`round(sim·1e4)`), and `key / 1e4` re-derives the identical
    * double (both are the nearest double to the same 4-dp decimal) —
    * so output values match the window form bit-for-bit.
    */
  def bySimDesc(
      scored: DataFrame,
      g: String,
      simCol: String,
      idCol: String,
      k: Int): DataFrame =
    byGroupDesc(
      scored.select(col(g), round(col(simCol) * 10000).cast("long").as("s_q4"),
        col(idCol)),
      g, "s_q4", idCol, k)
      .select(col(g), col("rnk"), col(idCol),
        (col("s_q4") / 10000.0).as(simCol))
}
