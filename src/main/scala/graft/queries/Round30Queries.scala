package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-30 gate additions (q255+): multi-grain part-to-whole shares
  * and order-sensitive event paths.
  */
object Round30Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  // ------------------------------------------------- percent of parent
  // Part-to-whole at every grain of a hierarchy: each nation's
  // revenue as a share of its region AND of the world, plus the
  // region's share of the world — the drill-down ratio set every
  // OLAP layer renders. One exact-decimal aggregate at the leaf
  // grain; parents come from window sums OVER the aggregated frame
  // (25 rows at any corpus scale), so the corpus is scanned once and
  // every division is one IEEE op from exact numerators.
  private val q255 = QueryDef(
    "q255_pct_of_parent",
    (s, dir) => {
      val geo = t(s, dir, "customer")
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("n_name"), col("r_name"))
      // geo = customer ⋈ broadcast dims; customer itself is fact-sized
      // at real SF, so the orders⋈customer equi-join is left to the
      // planner (shuffle or broadcast by stats/AQE) — never forced
      val leaf = t(s, dir, "orders")
        .join(geo, col("o_custkey") === col("c_custkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(dec(col("o_totalprice"))).cast(DecimalType(18, 2)).as("rev"))
      val byRegion = Window.partitionBy("r_name")
      val world = Window.partitionBy()
      leaf
        .withColumn("region_rev", sum(col("rev")).over(byRegion).cast(DecimalType(18, 2)))
        .withColumn("world_rev", sum(col("rev")).over(world).cast(DecimalType(18, 2)))
        .select(col("r_name"), col("n_name"),
          col("rev").cast("double").as("rev"),
          (col("rev").cast("double") / col("region_rev").cast("double"))
            .as("share_of_region"),
          (col("rev").cast("double") / col("world_rev").cast("double"))
            .as("share_of_world"),
          (col("region_rev").cast("double") / col("world_rev").cast("double"))
            .as("region_share_of_world"))
        .orderBy("r_name", "n_name")
    },
    Some("""WITH leaf AS (
        SELECT r_name, n_name,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
                 AS rev
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name),
      w AS (
        SELECT r_name, n_name, rev,
          CAST(SUM(rev) OVER (PARTITION BY r_name) AS DECIMAL(18,2)) AS region_rev,
          CAST(SUM(rev) OVER () AS DECIMAL(18,2)) AS world_rev
        FROM leaf)
      SELECT r_name, n_name, CAST(rev AS DOUBLE) AS rev,
        CAST(rev AS DOUBLE) / CAST(region_rev AS DOUBLE) AS share_of_region,
        CAST(rev AS DOUBLE) / CAST(world_rev AS DOUBLE) AS share_of_world,
        CAST(region_rev AS DOUBLE) / CAST(world_rev AS DOUBLE)
          AS region_share_of_world
      FROM w ORDER BY r_name, n_name"""),
    covers = Seq("A-pct-of-parent"))

  // ------------------------------------------------- event path trigrams
  // Order-sensitive behavioral paths: each user's event stream in
  // (ts, event_id) order yields its consecutive type TRIGRAMS (two
  // lags over the per-user window), counted corpus-wide with distinct
  // walkers — the path-mining step after q167's pairwise Markov
  // transitions. Top-25 by (count desc, path) is a total order. The
  // per-user window shards by user_id; the trigram aggregate is
  // map-side combined — two keyed shuffles at any scale.
  private val q256 = QueryDef(
    "q256_event_trigrams",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("t2", lag(col("event_type"), 1).over(w))
        .withColumn("t3", lag(col("event_type"), 2).over(w))
        .filter(col("t3").isNotNull)
        .select(concat_ws(">", col("t3"), col("t2"), col("event_type")).as("path"),
          col("user_id"))
        .groupBy("path")
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .orderBy(desc("n"), col("path"))
        .limit(25)
    },
    Some("""WITH seq AS (
        SELECT user_id, event_type,
          LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
          LAG(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t3
        FROM events)
      SELECT t3 || '>' || t2 || '>' || event_type AS path,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM seq WHERE t3 IS NOT NULL
      GROUP BY 1 ORDER BY n DESC, path LIMIT 25"""),
    covers = Seq("SEQ-trigram-paths"))

  val all: Seq[QueryDef] =
    Seq(q255, q256)
}
