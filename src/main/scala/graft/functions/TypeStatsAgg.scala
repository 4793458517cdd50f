package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input row slice for [[TypeStatsAgg]]. */
final case class TypeStatsIn(event_type: String, value: Double)

/** Mergeable buffer: per-type counts + running sum/count. Kept as a Map so
  * partial aggregates from different partitions merge associatively —
  * the distributed analog of the reference's per-key read-modify-write
  * state (/root/reference/stateflow/dataflow/stateful_operator.py:88-121).
  */
final case class TypeStatsBuf(types: Map[String, Long], sum: Double, n: Long)

final case class TypeStatsOut(n_types: Int, sum_value: Double, n_events: Long)

/** Typed Aggregator: per-key event-type statistics (batch replay of the
  * reference's keyed stateful operator, SURVEY.md O8). Registered via
  * `functions.udaf` so it participates in hash aggregation with map-side
  * partial merge like any built-in.
  */
object TypeStatsAgg extends Aggregator[TypeStatsIn, TypeStatsBuf, TypeStatsOut] {
  override def zero: TypeStatsBuf = TypeStatsBuf(Map.empty, 0.0, 0L)

  override def reduce(b: TypeStatsBuf, in: TypeStatsIn): TypeStatsBuf =
    TypeStatsBuf(
      b.types.updated(in.event_type, b.types.getOrElse(in.event_type, 0L) + 1L),
      b.sum + in.value,
      b.n + 1L)

  override def merge(a: TypeStatsBuf, b: TypeStatsBuf): TypeStatsBuf =
    TypeStatsBuf(
      b.types.foldLeft(a.types) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) },
      a.sum + b.sum,
      a.n + b.n)

  override def finish(b: TypeStatsBuf): TypeStatsOut =
    TypeStatsOut(b.types.size, b.sum, b.n)

  override def bufferEncoder: Encoder[TypeStatsBuf] = Encoders.product[TypeStatsBuf]
  override def outputEncoder: Encoder[TypeStatsOut] = Encoders.product[TypeStatsOut]
}
