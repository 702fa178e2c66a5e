package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-52 gate addition (q298): schema-wide referential integrity.
  */
object Round52Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- FK integrity
  // Referential-integrity audit across the whole star: for every
  // foreign-key edge (lineitem→orders, lineitem→part, orders→customer,
  // customer→nation, supplier→nation), count the child rows whose key
  // has no parent — the orphan report a warehouse load gate runs
  // after every batch (q110 audits single-table constraints; this
  // audits the EDGES). Each edge is one left-anti join against the
  // parent's distinct key — broadcast when the parent is a dim — and
  // the report unions five 1-row aggregates; shares close as one
  // division each.
  private val q298 = QueryDef(
    "q298_fk_integrity",
    (s, dir) => {
      // each edge is a LAZY pair of 1-row aggregates — the whole
      // 5-edge audit unions into one action so the five scans and
      // anti-joins schedule concurrently instead of as 10 serial
      // driver-side counts (measured ~2x faster at sf0.1)
      def edge(name: String, child: DataFrame, key: String,
          parent: DataFrame, pkey: String): DataFrame = {
        val n = child.agg(count(lit(1)).as("n_rows"))
        val orphans = child.select(col(key))
          .join(parent.select(col(pkey).as(key)).distinct(),
            Seq(key), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        n.crossJoin(orphans)
          .select(lit(name).as("fk_edge"), col("n_rows"), col("n_orphans"))
      }
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val su = t(s, dir, "supplier")
      val na = t(s, dir, "nation")
      val p = t(s, dir, "part")
      edge("customer->nation", c, "c_nationkey", na, "n_nationkey")
        .unionByName(edge("lineitem->orders", li, "l_orderkey", o, "o_orderkey"))
        .unionByName(edge("lineitem->part", li, "l_partkey", p, "p_partkey"))
        .unionByName(edge("orders->customer", o, "o_custkey", c, "c_custkey"))
        .unionByName(edge("supplier->nation", su, "s_nationkey", na, "n_nationkey"))
        .withColumn("orphan_share",
          col("n_orphans").cast("double") / col("n_rows").cast("double"))
        .orderBy("fk_edge")
    },
    Some("""WITH edges AS (
        SELECT 'customer->nation' AS fk_edge,
          CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_rows,
          CAST((SELECT COUNT(*) FROM customer
                WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
            AS BIGINT) AS n_orphans
        UNION ALL
        SELECT 'lineitem->orders',
          CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
          CAST((SELECT COUNT(*) FROM lineitem
                WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
            AS BIGINT)
        UNION ALL
        SELECT 'lineitem->part',
          CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
          CAST((SELECT COUNT(*) FROM lineitem
                WHERE l_partkey NOT IN (SELECT p_partkey FROM part))
            AS BIGINT)
        UNION ALL
        SELECT 'orders->customer',
          CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
          CAST((SELECT COUNT(*) FROM orders
                WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
            AS BIGINT)
        UNION ALL
        SELECT 'supplier->nation',
          CAST((SELECT COUNT(*) FROM supplier) AS BIGINT),
          CAST((SELECT COUNT(*) FROM supplier
                WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation))
            AS BIGINT))
      SELECT fk_edge, n_rows, n_orphans,
        CAST(n_orphans AS DOUBLE) / CAST(n_rows AS DOUBLE) AS orphan_share
      FROM edges ORDER BY fk_edge"""),
    covers = Seq("DQ-fk-integrity"))

  val all: Seq[QueryDef] =
    Seq(q298)
}
