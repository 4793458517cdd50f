package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input row slice for [[TopKScoredAgg]]: an integer score and the id
  * carrying it. Integer scores keep the order total and
  * engine-independent (the micro-credit emit rule).
  */
final case class ScoredId(score: Long, id: Long)

/** Bounded top-k aggregate: keeps the k best (score DESC, id ASC)
  * entries per group — the partial-aggregation form of
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC, id)` +
  * `rnk <= k`.
  *
  * Why it exists: a rank window partitions the data by the group key,
  * so its parallelism is capped at the number of groups and each
  * partition SORTS every candidate row (the ir1 scale flag — four
  * query ids meant four fat sort partitions at 100× data). As an
  * Aggregator registered via `functions.udaf`, Spark runs it with
  * map-side partial aggregation: every input partition reduces its
  * candidates to at most k entries per group BEFORE the shuffle, the
  * exchange moves at most `partitions × groups × k` fixed-size rows,
  * and no partition ever holds more than `k` buffered entries per
  * group. Selection is order-insensitive (a bounded-insert into a
  * sorted buffer keeps the k best regardless of arrival or merge
  * order), so the result is bit-identical to the window form.
  *
  * Output: the kept entries best-first — `posexplode` recovers the
  * 1-based rank.
  */
final class TopKScoredAgg(k: Int)
    extends Aggregator[ScoredId, ArrayBuffer[ScoredId], Array[ScoredId]] {
  require(k > 0, s"invalid k=$k")

  // total order: score DESC, then id ASC — identical to the window
  // mirror's ORDER BY score DESC, id
  private def beats(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: ArrayBuffer[ScoredId] = new ArrayBuffer[ScoredId](k)

  override def reduce(
      buf: ArrayBuffer[ScoredId], x: ScoredId): ArrayBuffer[ScoredId] = {
    if (buf.length < k || beats(x, buf.last)) {
      // linear insertion keeps the buffer sorted best-first; k is small
      // (top-k retrieval), so O(k) per row beats heap constant factors
      var i = buf.length
      if (buf.length == k) { buf.remove(k - 1); i = buf.length }
      while (i > 0 && beats(x, buf(i - 1))) i -= 1
      buf.insert(i, x)
    }
    buf
  }

  override def merge(
      a: ArrayBuffer[ScoredId], b: ArrayBuffer[ScoredId]): ArrayBuffer[ScoredId] = {
    var i = 0
    while (i < b.length) { reduce(a, b(i)); i += 1 }
    a
  }

  override def finish(buf: ArrayBuffer[ScoredId]): Array[ScoredId] = buf.toArray

  override def bufferEncoder: Encoder[ArrayBuffer[ScoredId]] =
    Encoders.kryo[ArrayBuffer[ScoredId]]
  override def outputEncoder: Encoder[Array[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[ScoredId]]()
}
