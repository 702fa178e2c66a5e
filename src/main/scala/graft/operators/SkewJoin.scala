package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A shuffle join sends every row of a hot key to one reducer; at
  * 100 TB a single celebrity key stalls the stage. Salting splits each
  * left key across `saltFactor` sub-partitions (deterministic spread —
  * a hash of the whole row, not a random, so re-runs are identical)
  * and replicates the right side once per salt, turning one hot
  * partition into `saltFactor` even ones at the cost of an
  * `O(right × saltFactor)` blow-up — use with a moderate-sized right
  * side, or AQE skew-join for the general case.
  *
  * Project `left` down to the columns you need BEFORE calling: the
  * salt hashes every input column (that's what makes the spread
  * deterministic yet payload-sensitive), so an unpruned frame forces
  * the scan to read its full schema.
  */
object SkewJoin {

  /** Inner equi-join of `left` and `right` on `key`, salted on the
    * left. Result is row-identical to `left.join(right, key)`.
    */
  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // Deterministic per-row spread: hash every left column so equal
    // keys fan out across salts regardless of row order.
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(saltFactor)))
    val salts = right.sparkSession.range(saltFactor)
      .select(col("id").cast("int").as("__salt"))
    val saltedRight = right.crossJoin(broadcast(salts))
    saltedLeft
      .join(saltedRight, Seq(key, "__salt"))
      .drop("__salt")
  }
}
