package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Size-bounded distinct-set collect: accumulates DISTINCT strings,
  * saturating at `maxKeep` — the one-job form of the
  * "distinct + count + collect-if-under-cap" pattern
  * ([[graft.operators.Decontamination]]'s eval side). Semantics mirror
  * [[BoundedDocsAgg]]'s exactness contract: truncation can only begin
  * once a buffer holds `maxKeep` elements, so a result with FEWER than
  * `maxKeep` elements is the complete exact distinct set; callers
  * treat size == maxKeep (= cap + 1) as "over cap" and fall back to
  * the sketch path. Map-side partials dedup within each partition, so
  * the single final merge moves at most P × maxKeep strings — never
  * the raw row stream.
  */
final class BoundedSetAgg(maxKeep: Int)
    extends Aggregator[String, scala.collection.mutable.HashSet[String], Array[String]] {
  require(maxKeep > 0, s"invalid maxKeep=$maxKeep")

  override def zero: scala.collection.mutable.HashSet[String] =
    scala.collection.mutable.HashSet.empty[String]

  override def reduce(
      b: scala.collection.mutable.HashSet[String],
      s: String): scala.collection.mutable.HashSet[String] = {
    if (b.size < maxKeep) b += s
    b
  }

  override def merge(
      a: scala.collection.mutable.HashSet[String],
      b: scala.collection.mutable.HashSet[String]): scala.collection.mutable.HashSet[String] = {
    val it = b.iterator
    while (a.size < maxKeep && it.hasNext) a += it.next()
    a
  }

  override def finish(b: scala.collection.mutable.HashSet[String]): Array[String] =
    b.toArray

  override def bufferEncoder: Encoder[scala.collection.mutable.HashSet[String]] =
    Encoders.kryo[scala.collection.mutable.HashSet[String]]
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
