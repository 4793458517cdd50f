package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, the value of the latest right row with
  * `right.ts <= left.ts` on the same key (NULL when no such row).
  *
  * Spark has no native as-of join. Rather than a per-row point lookup
  * (which would be a correlated subquery / O(n) broadcast probes), both
  * sides are union-tagged and a single running `last(value, ignoreNulls)`
  * window pass resolves every left row at once:
  *
  *   - one shuffle, partitioned by `key` — the same cost profile as any
  *     keyed window, so it scales linearly with data per key;
  *   - right rows sort BEFORE left rows at equal timestamps (side 0 vs 1),
  *     giving inclusive at-or-before semantics;
  *   - skew in `key` is handled by AQE like any other window shuffle.
  *
  * NULL-VALUE SEMANTICS: the resolution pass encodes "no right row yet"
  * as a NULL slot on left rows and resolves with `last(value,
  * ignoreNulls = true)` — so a right row whose `valueCol` is itself
  * NULL is indistinguishable from absence and is SKIPPED: the join
  * carries the latest **non-NULL** value at-or-before, not the latest
  * row's value. For q8's events (values never NULL) the two semantics
  * coincide. An API user who needs genuine NULLs carried should wrap
  * the value in a presence struct before joining and unwrap after:
  * `right.withColumn(v, struct(col(v)))` makes every right row non-NULL
  * at the slot level while preserving an inner NULL. Pinned by
  * RelationalSpec ("as-of join skips NULL right values…").
  */
object AsOfJoin {

  private val SideCol = "__asof_side"
  private val ValCol = "__asof_val"

  /** @param left      probe side; all its columns are preserved
    * @param right     reference side; only (key, rightTs, valueCol) are read
    * @param key       equi key present on both sides
    * @param leftTs    event-time column on `left`
    * @param rightTs   event-time column on `right`
    * @param valueCol  column of `right` to carry to the matched left row
    * @param out       name of the appended column on the result
    */
  def lastAtOrBefore(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      valueCol: String,
      out: String): DataFrame = {
    val valueType = right.schema(valueCol).dataType
    val leftCols = left.columns

    // Right side: only the three needed columns, value under a temp name.
    val r = right.select(col(key), col(rightTs).as(leftTs),
        col(valueCol).cast(valueType).as(ValCol))
      .withColumn(SideCol, lit(0))
    // Left side: full row + null value slot.
    val l = left
      .withColumn(ValCol, lit(null).cast(valueType))
      .withColumn(SideCol, lit(1))
    // Missing left columns on the right become nulls via unionByName.
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(key)
      .orderBy(col(leftTs), col(SideCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(out, last(col(ValCol), ignoreNulls = true).over(w))
      .filter(col(SideCol) === 1)
      .select(leftCols.toIndexedSeq.map(col) :+ col(out): _*)
  }
}
