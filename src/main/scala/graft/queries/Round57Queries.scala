package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-57 gate additions (q304–q308): training-data audit operators —
  * embedding feature-redundancy (dim-pair correlation), cross-source
  * near-duplicate matrix, Zipf rank·frequency audit, embedding-norm
  * calibration deciles, and LSH band-load statistics.
  *
  * Shared determinism rules (QueryDef.determinismNotes): float inputs
  * are fixed-point quantized (`floor(x·2²⁰)` as long) so every sum is
  * exact integer arithmetic independent of partial-aggregation order;
  * doubles appear only as a final cast/division/sqrt over those exact
  * integers, where Spark and DuckDB evaluate identical IEEE trees.
  */
object Round57Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val Q = 1048576L            // 2^20 fixed-point scale
  private val Q2 = 1099511627776d     // 2^40, de-quantization of products

  // ------------------------------------------------- dim-pair correlation
  // Feature-redundancy audit a PCA/whitening pass starts from: Pearson
  // correlation between 8 probe dimensions of the embedding space, from
  // one-pass sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²). The 28
  // pairs explode map-side (28 structs/row, no shuffle growth) and the
  // sums are map-side-combined exact longs — the shuffle moves 28 rows
  // of partials per partition regardless of input size, so the plan is
  // a single scan at any scale. Final products (n·Σxy …) run as
  // DECIMAL(38,0)×DECIMAL(38,0) (HUGEINT on the oracle side): at 10¹²
  // rows they exceed int64 but stay exact in 38 digits.
  private val q304 = QueryDef(
    "q304_dim_corr",
    (s, dir) => {
      val dims = 0 until 64 by 8
      val e = t(s, dir, "embeddings").select(
        dims.map(d => floor(element_at(col("embedding"), d + 1).cast("double")
          * lit(Q.toDouble)).cast(LongType).as(s"q$d")): _*)
      val pairs = for { i <- dims; j <- dims if i < j } yield
        struct(lit(i.toLong).as("d1"), lit(j.toLong).as("d2"),
          col(s"q$i").as("x"), col(s"q$j").as("y"))
      val dec = (c: Column) => c.cast(DecimalType(38, 0))
      val g = e.select(explode(array(pairs: _*)).as("p"))
        .select(col("p.d1"), col("p.d2"), col("p.x"), col("p.y"))
        .groupBy("d1", "d2")
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
      val num = dec(col("n_vecs")) * dec(col("sxy")) - dec(col("sx")) * dec(col("sy"))
      val den1 = dec(col("n_vecs")) * dec(col("sxx")) - dec(col("sx")) * dec(col("sx"))
      val den2 = dec(col("n_vecs")) * dec(col("syy")) - dec(col("sy")) * dec(col("sy"))
      g.withColumn("num", num).withColumn("den1", den1).withColumn("den2", den2)
        .filter(col("den1") > 0 && col("den2") > 0)
        .select(col("d1"), col("d2"), col("n_vecs"),
          (col("num").cast("double") /
            (col("n_vecs").cast("double") * col("n_vecs").cast("double") * lit(Q2)))
            .as("cov"),
          (col("num").cast("double") /
            (sqrt(col("den1").cast("double")) * sqrt(col("den2").cast("double"))))
            .as("corr"))
        .orderBy("d1", "d2")
    },
    Some("""WITH dims AS (SELECT unnest([0,8,16,24,32,40,48,56]) AS d),
      px AS (SELECT CAST(d1.d AS BIGINT) AS d1, CAST(d2.d AS BIGINT) AS d2,
          CAST(floor(CAST(embedding[d1.d + 1] AS DOUBLE) * 1048576) AS BIGINT) AS x,
          CAST(floor(CAST(embedding[d2.d + 1] AS DOUBLE) * 1048576) AS BIGINT) AS y
        FROM embeddings, dims d1, dims d2 WHERE d1.d < d2.d),
      g AS (SELECT d1, d2, CAST(COUNT(*) AS BIGINT) AS n_vecs,
          CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
          CAST(SUM(x * y) AS BIGINT) AS sxy,
          CAST(SUM(x * x) AS BIGINT) AS sxx,
          CAST(SUM(y * y) AS BIGINT) AS syy
        FROM px GROUP BY d1, d2),
      f AS (SELECT d1, d2, n_vecs,
          CAST(n_vecs AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
          CAST(n_vecs AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den1,
          CAST(n_vecs AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS den2
        FROM g)
      SELECT d1, d2, n_vecs,
        CAST(num AS DOUBLE)
          / (CAST(n_vecs AS DOUBLE) * CAST(n_vecs AS DOUBLE)
             * CAST(1099511627776 AS DOUBLE)) AS cov,
        CAST(num AS DOUBLE)
          / (sqrt(CAST(den1 AS DOUBLE)) * sqrt(CAST(den2 AS DOUBLE))) AS corr
      FROM f WHERE den1 > 0 AND den2 > 0
      ORDER BY d1, d2"""),
    covers = Seq("SIM-dim-corr"))

  // ------------------------------------------------- cross-source dup matrix
  // Which source pairs feed each other's content: documents keyed by a
  // 5-word prefix fingerprint (exact-dup md5 finds nothing in this
  // corpus; the prefix catches shared openings), distinct (source, fp)
  // postings self-joined on fp — the contamination matrix a mixture
  // designer reads before weighting sources. The join key is the
  // fingerprint (high cardinality, no skew); the distinct is one
  // shuffle and the matrix is |sources|² at most.
  private val q305 = QueryDef(
    "q305_source_dup_matrix",
    (s, dir) => {
      val fp = t(s, dir, "documents")
        .select(col("source"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 5)).as("fp"))
        .distinct()
      fp.as("a").join(fp.as("b"), Seq("fp"))
        .filter(col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(countDistinct(col("fp")).as("shared_fps"))
        .orderBy("src_a", "src_b")
    },
    Some("""WITH fp AS (SELECT DISTINCT source,
          array_to_string(string_split(text, ' ')[1:5], ' ') AS fp
        FROM documents)
      SELECT a.source AS src_a, b.source AS src_b,
        CAST(COUNT(DISTINCT fp) AS BIGINT) AS shared_fps
      FROM fp a JOIN fp b USING (fp)
      WHERE a.source < b.source
      GROUP BY a.source, b.source
      ORDER BY src_a, src_b"""),
    covers = Seq("DD-source-matrix"))

  // ------------------------------------------------- Zipf audit
  // Does the corpus vocabulary follow Zipf? rank·frequency should be
  // ~constant; the audit reports it as a ratio against the top term's
  // frequency — pure rational arithmetic (no log-log regression: ln()
  // differs in the last ULP across libm implementations, see q52).
  // Top-50 selects via TakeOrderedAndProject on the (freq, term) total
  // order — the global window ranks only the 50 survivors, not the
  // vocabulary.
  private val q306 = QueryDef(
    "q306_zipf_audit",
    (s, dir) => {
      val tf = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("freq"))
      val m = tf.agg(max(col("freq")).as("mf"))
      val top = tf.orderBy(desc("freq"), asc("term")).limit(50)
      val w = Window.orderBy(desc("freq"), asc("term"))
      top.withColumn("rank", row_number().over(w).cast(LongType))
        .crossJoin(broadcast(m))
        .select(col("rank"), col("term"), col("freq"),
          ((col("rank") * col("freq")).cast("double") / col("mf").cast("double"))
            .as("zipf_ratio"))
        .orderBy("rank")
    },
    Some("""WITH tf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        GROUP BY term),
      m AS (SELECT MAX(freq) AS mf FROM tf),
      r AS (SELECT term, freq,
          CAST(row_number() OVER (ORDER BY freq DESC, term) AS BIGINT) AS rank
        FROM tf)
      SELECT rank, term, freq,
        CAST(rank * freq AS DOUBLE) / CAST(mf AS DOUBLE) AS zipf_ratio
      FROM r, m WHERE rank <= 50
      ORDER BY rank"""),
    covers = Seq("TXT-zipf"))

  // ------------------------------------------------- norm calibration
  // Classifier-calibration table over the embedding space: squared
  // L2 norm (exact fixed-point, summed per row with the `aggregate`
  // HOF — no shuffle, no UDF) deciled by ntile over the (norm, vec_id)
  // total order, each decile reporting its positive-label rate. The
  // global ntile is the semantics being gated; at corpus scale the
  // same table would come from approx_percentile cut points (q190)
  // instead of a single-partition window.
  private val q307 = QueryDef(
    "q307_norm_calibration",
    (s, dir) => {
      val qv = transform(col("embedding"),
        x => floor(x.cast("double") * lit(Q.toDouble)).cast(LongType))
      val q2 = aggregate(qv, lit(0L), (acc, v) => acc + v * v)
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), q2.as("q2norm"))
      val w = Window.orderBy(col("q2norm"), col("vec_id"))
      e.withColumn("decile", ntile(10).over(w).cast(LongType))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("label") >= 5, 1L).otherwise(0L)).as("positives"),
          sum(col("q2norm")).as("sq2"))
        .select(col("decile"), col("n_vecs"), col("positives"),
          (col("positives").cast("double") / col("n_vecs").cast("double"))
            .as("pos_rate"),
          (col("sq2").cast("double") / (col("n_vecs").cast("double") * lit(Q2)))
            .as("mean_sq_norm"))
        .orderBy("decile")
    },
    Some("""WITH e AS (SELECT vec_id, label,
          CAST(list_sum(list_transform(
              list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)),
              v -> v * v)) AS BIGINT) AS q2norm
        FROM embeddings),
      d AS (SELECT label, q2norm,
          CAST(ntile(10) OVER (ORDER BY q2norm, vec_id) AS BIGINT) AS decile
        FROM e),
      g AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_vecs,
          CAST(SUM(CASE WHEN label >= 5 THEN 1 ELSE 0 END) AS BIGINT)
            AS positives,
          CAST(SUM(q2norm) AS BIGINT) AS sq2
        FROM d GROUP BY decile)
      SELECT decile, n_vecs, positives,
        CAST(positives AS DOUBLE) / CAST(n_vecs AS DOUBLE) AS pos_rate,
        CAST(sq2 AS DOUBLE)
          / (CAST(n_vecs AS DOUBLE) * CAST(1099511627776 AS DOUBLE))
          AS mean_sq_norm
      FROM g ORDER BY decile"""),
    covers = Seq("SIM-calibration"))

  // ------------------------------------------------- LSH band load
  // The tuning audit behind q23's banding: per band, how many buckets,
  // the heaviest bucket, singleton buckets, and the candidate-pair
  // work Σ sz·(sz−1)/2 the verify stage will pay. Overloaded buckets
  // are exactly the skew that melts an executor at corpus scale, so
  // this table IS the pre-flight check before running the dedup join.
  // Signature = 8 composable min(md5) aggregates in one pass (the
  // column-for-column oracle of graft.functions.MinHashSignature),
  // banded 4×2 like q23.
  private val q308 = QueryDef(
    "q308_lsh_band_stats",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val sh = d.select(col("doc_id"),
        explode(graft.functions.WordShingles(d.sparkSession, col("text"), 3)).as("s"))
      val sig = sh.groupBy("doc_id")
        .agg((0 until 8).map(j =>
          min(substring(md5(concat(lit(s"$j:"), col("s"))), 1, 15)).as(s"h$j")).head,
          (1 until 8).map(j =>
            min(substring(md5(concat(lit(s"$j:"), col("s"))), 1, 15)).as(s"h$j")): _*)
      val bandStructs = (0 until 4).map { b =>
        struct(lit(b.toLong).as("band"),
          md5(concat(lit(s"band$b:"), col(s"h${2 * b}"), col(s"h${2 * b + 1}")))
            .as("bkey"))
      }
      val buckets = sig
        .select(explode(array(bandStructs: _*)).as("p"))
        .select(col("p.band"), col("p.bkey"))
        .groupBy("band", "bkey").agg(count(lit(1)).as("sz"))
      buckets.groupBy("band")
        .agg(count(lit(1)).as("n_buckets"),
          max(col("sz")).as("max_bucket"),
          sum(col("sz") * (col("sz") - 1L)).as("twice_pairs"),
          sum(when(col("sz") === 1L, 1L).otherwise(0L)).as("singletons"))
        .select(col("band"), col("n_buckets"), col("max_bucket"),
          expr("twice_pairs DIV 2").as("cand_pairs"), col("singletons"))
        .orderBy("band")
    },
    Some {
      val hs = (0 until 8)
        .map(j => s"min(substr(md5('$j:' || s), 1, 15)) AS h$j").mkString(", ")
      val bandSel = (0 until 4)
        .map(b => s"SELECT CAST($b AS BIGINT) AS band, " +
          s"md5('band$b:' || h${2 * b} || h${2 * b + 1}) AS bkey FROM sig")
        .mkString(" UNION ALL ")
      s"""WITH toksrc AS (SELECT doc_id, string_split(text, ' ') AS tk
               FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, greatest(len(tk) - 1, 1)),
                         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
                FROM toksrc WHERE len(tk) >= 3),
      sig AS (SELECT doc_id, $hs FROM sh GROUP BY doc_id),
      bands AS ($bandSel),
      buckets AS (SELECT band, bkey, CAST(COUNT(*) AS BIGINT) AS sz
        FROM bands GROUP BY band, bkey)
      SELECT band, CAST(COUNT(*) AS BIGINT) AS n_buckets,
        MAX(sz) AS max_bucket,
        CAST(SUM(sz * (sz - 1)) AS BIGINT) // 2 AS cand_pairs,
        CAST(SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT) AS singletons
      FROM buckets GROUP BY band ORDER BY band"""
    },
    covers = Seq("DD-lsh-audit"))

  val all: Seq[QueryDef] =
    Seq(q304, q305, q306, q307, q308)
}
