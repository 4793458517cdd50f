package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: the Spark implementation and (when the operator is
  * SQL-expressible) the equivalent ANSI SQL the driver runs in DuckDB.
  *
  * Hash-compare contract (see the builder brief): the driver sorts result
  * columns by name and hashes values, so
  *  - every output column is explicitly aliased identically on both sides,
  *  - every query ends in a deterministic ORDER BY (unique key or full
  *    column list),
  *  - floating aggregates are rounded (sums of 2-dec money to 2; avgs to 4)
  *    so IEEE summation-order noise cannot flip the hash,
  *  - integer-ish aggregates are CAST to the same width on both sides
  *    (DuckDB sum(int) is HUGEINT; Spark's is BIGINT). This includes
  *    WINDOWED sums: `sum(x) OVER (...)` is HUGEINT too, and pandas
  *    materializes HUGEINT as float64, so the driver's hasher sees
  *    `1160.0` vs `1160` even when values agree (the round-5
  *    pk1_pack_sequences failure). Round-6 sweep: all 59 mirrors
  *    audited for uncast integer `sum(` / `sum() OVER` / `list_sum`
  *    producers in emitted columns — pk1's `off`/`bin` were the only
  *    ones; every other integer aggregate is CAST or intermediate.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sqlChecked(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)

  /** Deterministic total order for a CONSTANT-BOUNDED result (top-k /
    * fixture / fixed-report rows) without a range exchange: coalesce to
    * one partition (narrow — no shuffle) and sort within it. Produces
    * the identical row order as `orderBy` at two fewer driver jobs
    * (orderBy = a range-partitioning exchange plus its sampling pass —
    * guide §2.4's "orderBy used only to make output deterministic").
    *
    * ONLY for outputs bounded independent of corpus size: a
    * corpus-sized result must keep the scale-correct global sort, so
    * per-document / per-pair outputs stay on `orderBy`.
    */
  implicit final class BoundedSortOps(private val df: DataFrame) extends AnyVal {
    def orderSmall(cols: org.apache.spark.sql.Column*): DataFrame =
      df.coalesce(1).sortWithinPartitions(cols: _*)
    def orderSmall(c: String, cs: String*): DataFrame =
      df.coalesce(1).sortWithinPartitions(c, cs: _*)
  }
}
