package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-15 gate additions (q194+): Matryoshka-style embedding
  * truncation diagnostics and temperature-based source mixing — two
  * curation-side operators for embedding stores and multilingual /
  * multi-source corpus balancing.
  */
object Round15Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------- matryoshka truncation
  // MRL-style prefix-dimension diagnostics: how much of each vector's
  // energy survives truncation to the first 16 of 64 dims, and the
  // first coordinate renormalized within the truncated vector. The
  // decision input for "can we store 4× fewer dims?". Per-row only —
  // float→double casts are exact and both engines fold the squares
  // SEQUENTIALLY (aggregate ↔ list_sum, q55's determinism pattern),
  // so the ratio is ONE shared IEEE tree and hash-exact.
  private val q194 = QueryDef(
    "q194_matryoshka",
    (s, dir) => {
      val sq = transform(col("embedding"), x => x.cast("double") * x.cast("double"))
      val eFull = aggregate(sq, lit(0.0), (acc, v) => acc + v)
      val eHead = aggregate(slice(sq, 1, 16), lit(0.0), (acc, v) => acc + v)
      t(s, dir, "embeddings").filter(col("vec_id") % 2 === 0)
        .select(col("vec_id"), col("label"),
          eFull.as("e_full"), eHead.as("e_head"),
          (eHead / eFull).as("retained"),
          (element_at(col("embedding"), 1).cast("double") / sqrt(eHead))
            .as("c1_renormed"))
        .orderBy("vec_id")
    },
    Some("""WITH e AS (
        SELECT vec_id, label, embedding,
          list_sum(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS e_full,
          list_sum(list_transform(embedding[1:16],
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS e_head
        FROM embeddings WHERE vec_id % 2 = 0)
      SELECT vec_id, label, e_full, e_head,
        e_head / e_full AS retained,
        CAST(embedding[1] AS DOUBLE) / sqrt(e_head) AS c1_renormed
      FROM e ORDER BY vec_id"""),
    covers = Seq("SIM-matryoshka"))

  // --------------------------------------------- temperature mixing
  // Multi-source sampling weights at temperature alpha = 1/2:
  // w_i = n_i^alpha / Σ n_j^alpha — the standard upweighting of
  // small sources when mixing corpora. alpha = 1/2 keeps the power
  // inside correctly-rounded IEEE sqrt (a fractional pow() routes
  // through exp/ln, which no two libms round identically — the same
  // reason q158 avoids entropy). The Σ over sources folds an
  // ORDERED list sequentially on both engines (aggregate ↔
  // list_reduce), so even the 5-term double sum is bit-pinned.
  private val q195 = QueryDef(
    "q195_temperature_mix",
    (s, dir) => {
      val c = t(s, dir, "documents")
        .groupBy("source").agg(count(lit(1)).as("n"))
        .withColumn("w", sqrt(col("n").cast("double")))
      val tot = c.agg(aggregate(
        array_sort(collect_list(struct(col("source"), col("w")))),
        lit(0.0), (acc, x) => acc + x("w")).as("tw"))
      c.crossJoin(broadcast(tot))
        .select(col("source"), col("n"),
          (col("n").cast("double") /
            sum(col("n")).over(org.apache.spark.sql.expressions.Window
              .partitionBy()).cast("double")).as("raw_share"),
          (col("w") / col("tw")).as("mix_weight"))
        .orderBy("source")
    },
    Some("""WITH c AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
          sqrt(CAST(COUNT(*) AS DOUBLE)) AS w
        FROM documents GROUP BY 1),
      t AS (SELECT list_reduce(list(w ORDER BY source), (a, b) -> a + b) AS tw,
              CAST(SUM(n) AS BIGINT) AS tn FROM c)
      SELECT source, n,
        CAST(n AS DOUBLE) / CAST(tn AS DOUBLE) AS raw_share,
        w / tw AS mix_weight
      FROM c, t ORDER BY source"""),
    covers = Seq("SAMPLE-temperature"))

  val all: Seq[QueryDef] =
    Seq(q194, q195)
}
