package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree-ordered edge orientation for wedge/triangle enumeration —
  * the construction q161 (triangle count) and q288 (clustering
  * coefficient) build their wedges on, extracted so ONE definition
  * carries the scale property and a spec can pin it structurally.
  *
  * Every undirected edge is directed from the lower (degree, id)
  * endpoint to the higher, a total order, so each triangle forms its
  * wedge exactly once at its minimum-rank corner. The load-bearing
  * property is the out-degree bound: if a node keeps k out-edges, all
  * k of its out-neighbors have degree ≥ its own ≥ k, so m ≥ k²/2 and
  * k ≤ √(2m) — wedge candidates are O(m^1.5) no matter where a hub
  * sits. The id orientation (`u < v`) has NO such bound: a hub whose
  * id sorts below its neighbors keeps its FULL degree as out-degree,
  * and deg² wedges land in one task — the round-9 skew rung measured
  * exactly that on q288 (hot key at id 0: ≈2·10¹⁰ wedge candidates,
  * one task writing 57 GB, run killed). The defect is hash-invisible
  * at gate SF (both orientations count the same triangles), which is
  * why DegreeOrientationSpec pins the out-degree bound itself rather
  * than relying on correctness gates.
  */
object DegreeOrientation {

  /** Orient a symmetric edge set (`und` holds BOTH directions of every
    * undirected edge as (u, v) rows, no self-loops) by (degree, id).
    * Returns each undirected edge exactly once, pointing low-rank →
    * high-rank. Degrees are computed from `und` itself.
    */
  def orient(und: DataFrame): DataFrame =
    orient(und, und.groupBy("u").agg(count(lit(1)).as("__d"))
      .withColumnRenamed("u", "__node").withColumnRenamed("__d", "__deg"),
      "__node", "__deg")

  /** Same, with a caller-supplied degree frame (`deg(nodeCol, degCol)`
    * — full undirected degree per node) so a gate that already
    * materialized degrees for its output reuses that frame instead of
    * re-aggregating.
    */
  def orient(und: DataFrame, deg: DataFrame,
             nodeCol: String, degCol: String): DataFrame =
    und
      .join(deg.select(col(nodeCol).as("__uu"), col(degCol).as("__du")),
        col("u") === col("__uu"))
      .join(deg.select(col(nodeCol).as("__vv"), col(degCol).as("__dv")),
        col("v") === col("__vv"))
      .filter(col("__du") < col("__dv") ||
        (col("__du") === col("__dv") && col("u") < col("v")))
      .select("u", "v")
}
