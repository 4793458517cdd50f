package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key carries a disproportionate share of rows (hot
  * users, null-ish defaults, celebrity entities), the single reducer
  * owning that key becomes the straggler. Salting splits each left key
  * into `saltFactor` sub-keys and replicates the right side once per
  * salt, so the hot key's work spreads over `saltFactor` reducers:
  *
  *   left:  salt = pmod(hash(monotonic row), F)      (random-ish, narrow)
  *   right: exploded F times, one row per salt value
  *   join on (key, salt)
  *
  * Cost: right side is replicated F times — use for joins where the
  * right side is moderate (or pre-filtered), and F sized to the skew
  * (8-32 typical). AQE's skew-join handles many cases automatically;
  * salting is the explicit tool when a single key exceeds what AQE
  * splitting can balance (it cannot split one key).
  */
object SkewJoin {

  def saltedInner(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      saltFactor: Int = 16): DataFrame = {
    // distinct salt names per side: a shared name would lean on Spark's
    // self-join column disambiguation (the "trivially true equals
    // predicate" trap) whenever left and right derive from one frame
    val saltL = "__salt_l"
    val saltR = "__salt_r"
    // deterministic per-row salt from a row-local spread function
    val l = left.withColumn(saltL,
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val r = right.withColumn(saltR,
      explode(array((0 until saltFactor).map(lit): _*)))
    l.join(r, l(leftKey) === r(rightKey) && col(saltL) === col(saltR))
      .drop(saltL, saltR)
  }
}
