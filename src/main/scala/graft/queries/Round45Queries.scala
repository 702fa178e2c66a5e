package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-45 gate additions (q290+): temporal dataset splitting with
  * entity-leakage accounting.
  */
object Round45Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- temporal split
  // Time-based train/val/test split of the event log (days ≤20 /
  // 21–25 / ≥26) with the audit an eval pipeline needs next to it:
  // how many of each split's USERS also appear in train — the entity
  // leakage that silently inflates offline metrics when models
  // memorize users across the boundary. (q142 splits by hash —
  // entity-disjoint by construction; a TEMPORAL split must measure
  // its leakage instead.) One pass tags splits, distinct (split,
  // user) pairs aggregate per split, and the train-user set
  // left-semi-joins back — counts exact, the share is one division.
  private val q290 = QueryDef(
    "q290_temporal_split",
    (s, dir) => {
      val tagged = t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          dayofmonth(to_date(col("ts"))).as("dom"))
        .withColumn("split",
          when(col("dom") <= 20, "train")
            .when(col("dom") <= 25, "val")
            .otherwise("test"))
      val perSplit = tagged.groupBy("split")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
      val splitUsers = tagged.select("split", "user_id").distinct()
      val trainUsers = splitUsers.filter(col("split") === "train")
        .select(col("user_id"))
      val overlap = splitUsers
        .join(trainUsers, Seq("user_id"), "left_semi")
        .groupBy("split").agg(count(lit(1)).as("train_overlap_users"))
      perSplit.join(overlap, Seq("split"), "left")
        .withColumn("train_overlap_users",
          coalesce(col("train_overlap_users"), lit(0L)))
        .select(col("split"), col("n_events"), col("n_users"),
          col("train_overlap_users"),
          (col("train_overlap_users").cast("double") /
            col("n_users").cast("double")).as("overlap_share"))
        .orderBy("split")
    },
    Some("""WITH tagged AS (SELECT user_id, event_id,
          CASE WHEN dayofmonth(CAST(ts AS DATE)) <= 20 THEN 'train'
               WHEN dayofmonth(CAST(ts AS DATE)) <= 25 THEN 'val'
               ELSE 'test' END AS split
        FROM events),
      per_split AS (SELECT split,
          CAST(COUNT(*) AS BIGINT) AS n_events,
          CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM tagged GROUP BY 1),
      split_users AS (SELECT DISTINCT split, user_id FROM tagged),
      overlap AS (SELECT s.split,
          CAST(COUNT(*) AS BIGINT) AS train_overlap_users
        FROM split_users s
        WHERE EXISTS (SELECT 1 FROM split_users tr
                      WHERE tr.split = 'train' AND tr.user_id = s.user_id)
        GROUP BY 1)
      SELECT p.split, p.n_events, p.n_users,
        COALESCE(o.train_overlap_users, 0) AS train_overlap_users,
        CAST(COALESCE(o.train_overlap_users, 0) AS DOUBLE)
          / CAST(p.n_users AS DOUBLE) AS overlap_share
      FROM per_split p LEFT JOIN overlap o ON p.split = o.split
      ORDER BY p.split"""),
    covers = Seq("ML-temporal-split"))

  val all: Seq[QueryDef] =
    Seq(q290)
}
