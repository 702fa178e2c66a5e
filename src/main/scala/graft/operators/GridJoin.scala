package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-file spatial radius join: all point pairs within Euclidean
  * distance `radius` in a 2-D plane, found by hashing points into
  * ⌊coord/radius⌋ cells and probing the 3×3 neighborhood.
  *
  * Lossless by construction — a qualifying pair has |Δx| ≤ r and
  * |Δy| ≤ r, and with cell width exactly r the cell indexes then
  * differ by at most 1 on each axis, so every qualifying pair meets
  * in exactly one (home, neighbor) cell pairing; the exact d² ≤ r²
  * filter (one shared IEEE tree) decides membership, cells only
  * bound candidates. The 9× fan-out rides the build side only and
  * buys locality: candidate volume scales with the density of a
  * ~9r² window around each point, not with corpus², which is the
  * whole trade at 100 TB (the oracle gate `q240_grid_radius_join`
  * proves zero loss against the brute-force theta join; the property
  * spec re-proves it on random clouds against a driver-side
  * reference).
  *
  * The reference has no spatial operator; this serves its station
  * coordinates (`data/../stations`, lat/lon) the way `RangeJoin`
  * serves its time intervals.
  */
object GridJoin {

  /** Self-join `pts` (columns `idCol`, `xCol`, `yCol`) to all pairs
    * with id_a < id_b and squared distance ≤ radius²; returns
    * (vec_a, vec_b, dist_sq).
    */
  def radiusSelfJoin(
      pts: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      radius: Double): DataFrame = {
    val cells = pts.select(
      col(idCol).as("__id"),
      col(xCol).cast("double").as("__x"),
      col(yCol).cast("double").as("__y"))
      .withColumn("cx", floor(col("__x") / lit(radius)).cast("long"))
      .withColumn("cy", floor(col("__y") / lit(radius)).cast("long"))
    val probes = cells.select(col("__id").as("vec_a"),
      col("__x").as("xa"), col("__y").as("ya"), col("cx"), col("cy"))
    val offs = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)
    val build = cells
      .withColumn("o", explode(offs))
      .select(col("__id").as("vec_b"), col("__x").as("xb"), col("__y").as("yb"),
        (col("cx") + col("o.dx")).as("cx"), (col("cy") + col("o.dy")).as("cy"))
    val d2: Column = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
      (col("ya") - col("yb")) * (col("ya") - col("yb"))
    // r² as ONE driver-side IEEE multiply — any cross-engine oracle
    // must form its boundary the same way (r CAST DOUBLE, squared)
    probes.join(build, Seq("cx", "cy"))
      .filter(col("vec_a") < col("vec_b") && d2 <= lit(radius * radius))
      .select(col("vec_a"), col("vec_b"), d2.as("dist_sq"))
  }
}
