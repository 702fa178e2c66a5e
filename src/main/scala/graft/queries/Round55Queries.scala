package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-55 gate addition (q302): market concentration (HHI).
  */
object Round55Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- HHI
  // Herfindahl–Hirschman concentration of supplier revenue per
  // nation: Σ shareᵢ² — the antitrust-grade answer to "is this
  // market a few big players or many small ones" — plus its inverse
  // (the effective number of equal suppliers). Per-supplier revenues
  // are exact DECIMAL sums; each share-square is ONE fixed IEEE tree
  // над them, and the cross-supplier Σ folds an ORDERED list
  // sequentially on both engines (aggregate ↔ list_reduce, the q206
  // discipline) so the double sum is bit-pinned. Supplier grain is
  // dimension-sized: the fold list stays small at any fact scale.
  private val q302 = QueryDef(
    "q302_market_hhi",
    (s, dir) => {
      val rev = t(s, dir, "lineitem").join(
        t(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").as("nation"), col("s_suppkey"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("r"))
      val tot = rev.groupBy("nation")
        .agg(sum(col("r")).cast(DecimalType(38, 2)).as("tr"),
          count(lit(1)).as("n_suppliers"))
      val share = col("x.r").cast("double") / col("tr").cast("double")
      val terms = rev.as("x").join(tot, "nation")
        .select(col("nation"), col("n_suppliers"), col("tr"),
          col("x.s_suppkey").as("sk"), (share * share).as("v"))
      terms.groupBy("nation")
        .agg(first(col("n_suppliers")).as("n_suppliers"),
          first(col("tr")).cast("double").as("total_rev"),
          aggregate(
            sort_array(collect_list(struct(col("sk"), col("v")))),
            lit(0.0d), (acc, x) => acc + x.getField("v")).as("hhi"))
        .select(col("nation"), col("n_suppliers"), col("total_rev"),
          col("hhi"), (lit(1.0d) / col("hhi")).as("effective_suppliers"))
        .orderBy("nation")
    },
    Some("""WITH rev AS (SELECT s_nationkey AS nation, s_suppkey,
          SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS r
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY 1, 2),
      tot AS (SELECT nation, CAST(SUM(r) AS DECIMAL(38,2)) AS tr,
          CAST(COUNT(*) AS BIGINT) AS n_suppliers
        FROM rev GROUP BY 1),
      terms AS (SELECT rev.nation, n_suppliers, tr, s_suppkey AS sk,
          (CAST(r AS DOUBLE) / CAST(tr AS DOUBLE))
            * (CAST(r AS DOUBLE) / CAST(tr AS DOUBLE)) AS v
        FROM rev JOIN tot USING (nation)),
      folded AS (SELECT nation,
          MIN(n_suppliers) AS n_suppliers,
          CAST(MIN(tr) AS DOUBLE) AS total_rev,
          list_reduce(list(v ORDER BY sk), (a, b) -> a + b) AS hhi
        FROM terms GROUP BY nation)
      SELECT nation, n_suppliers, total_rev, hhi,
        CAST(1 AS DOUBLE) / hhi AS effective_suppliers
      FROM folded ORDER BY nation"""),
    covers = Seq("STAT-hhi"))

  val all: Seq[QueryDef] =
    Seq(q302)
}
