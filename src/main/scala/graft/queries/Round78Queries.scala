package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-78 gate additions (q409–q413): multi-scale variance, effect
  * sizes, survey design effect, sales sparsity, and the volume
  * discount curve. Exact-arithmetic discipline throughout.
  */
object Round78Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec38(c: Column): Column = c.cast(DecimalType(38, 0))

  private def cents: Column =
    (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast(LongType)

  // ------------------------------------------------- multi-scale variance
  // Wavelet-flavored energy spectrum of the daily revenue series:
  // bucket days at 7/14/28/56-day scales (complete buckets only) and
  // report each scale's variance of bucket totals — separates
  // short-term noise from long-horizon drift without any transform
  // library. Bucket sums are exact cents; moments close per scale.
  private val q409 = QueryDef(
    "q409_scale_variance",
    (s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(cents).as("y"))
      val b = daily.agg(min(col("d")).as("d0"),
        (datediff(max(col("d")), min(col("d"))) + 1).cast(LongType).as("span"))
      val idx = daily.crossJoin(broadcast(b))
        .select(datediff(col("d"), col("d0")).cast(LongType).as("tt"),
          col("y"), col("span"))
      val scaled = idx.select(explode(expr(
        "transform(array(7L, 14L, 28L, 56L), " +
          "w -> named_struct('scale', w, 'bucket', CAST(tt / w AS BIGINT), " +
          "'nb', CAST(span / w AS BIGINT)))")).as("p"), col("y"))
        .select(col("p.scale"), col("p.bucket"), col("p.nb"), col("y"))
        .filter(col("bucket") < col("nb"))
      val buckets = scaled.groupBy("scale", "bucket")
        .agg(sum(col("y")).as("by"))
      buckets.groupBy("scale")
        .agg(count(lit(1)).as("n_buckets"),
          sum(col("by")).as("sx"),
          sum(dec38(col("by")) * dec38(col("by"))).as("sxx"))
        .filter(col("n_buckets") >= 2)
        .select(col("scale"), col("n_buckets"),
          (col("sx").cast("double") / col("n_buckets").cast("double"))
            .as("mean_bucket_cents"),
          ((dec38(col("n_buckets")) * col("sxx")
            - dec38(col("sx")) * dec38(col("sx"))).cast("double")
            / (col("n_buckets") * (col("n_buckets") - 1L)).cast("double"))
            .as("var_bucket"))
        .orderBy("scale")
    },
    Some("""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
          CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
            AS BIGINT)) AS BIGINT) AS y
        FROM orders GROUP BY d),
      b AS (SELECT MIN(d) AS d0,
          CAST(MAX(d) - MIN(d) + 1 AS BIGINT) AS span FROM daily),
      idx AS (SELECT CAST(d - d0 AS BIGINT) AS tt, y, span FROM daily, b),
      scaled AS (SELECT w.scale, tt // w.scale AS bucket, y
        FROM idx, (SELECT CAST(unnest([7, 14, 28, 56]) AS BIGINT) AS scale) w
        WHERE tt // w.scale < span // w.scale),
      buckets AS (SELECT scale, bucket, CAST(SUM(y) AS BIGINT) AS by
        FROM scaled GROUP BY scale, bucket),
      g AS (SELECT scale, CAST(COUNT(*) AS BIGINT) AS n_buckets,
          CAST(SUM(by) AS HUGEINT) AS sx,
          CAST(SUM(CAST(by AS HUGEINT) * by) AS HUGEINT) AS sxx
        FROM buckets GROUP BY scale HAVING COUNT(*) >= 2)
      SELECT scale, n_buckets,
        CAST(sx AS DOUBLE) / CAST(n_buckets AS DOUBLE) AS mean_bucket_cents,
        CAST(n_buckets * sxx - sx * sx AS DOUBLE)
          / CAST(n_buckets * (n_buckets - 1) AS DOUBLE) AS var_bucket
      FROM g ORDER BY scale"""),
    covers = Seq("STAT-scale-variance"))

  // ------------------------------------------------- Cohen's d matrix
  // Standardized effect size between every market-segment pair:
  // d = (x̄_a − x̄_b)/s_pooled on order value — the practical-
  // significance companion to q228's Welch t (which only answers "is
  // there an effect", not "how big"). Moments per segment are exact;
  // the 10-pair matrix closes driver-free via a self-join on
  // segment order.
  private val q410 = QueryDef(
    "q410_cohens_d_matrix",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"), cents.as("c"))
      val g = o.groupBy("segment")
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sx"),
          sum(dec38(col("c")) * dec38(col("c"))).as("sxx"))
        .withColumn("mean_c",
          col("sx").cast("double") / col("n").cast("double"))
        .withColumn("ss", (dec38(col("n")) * col("sxx")
          - dec38(col("sx")) * dec38(col("sx"))).cast("double")
          / col("n").cast("double"))
      val a = g.select(col("segment").as("seg_a"), col("n").as("na"),
        col("mean_c").as("ma"), col("ss").as("ssa"))
      val b = g.select(col("segment").as("seg_b"), col("n").as("nb"),
        col("mean_c").as("mb"), col("ss").as("ssb"))
      a.join(b, col("seg_a") < col("seg_b"))
        .withColumn("pooled_sd", sqrt((col("ssa") + col("ssb"))
          / (col("na") + col("nb") - 2L).cast("double")))
        .select(col("seg_a"), col("seg_b"),
          (col("na") + col("nb")).as("n_total"),
          ((col("ma") - col("mb")) / col("pooled_sd")).as("cohens_d"))
        .orderBy("seg_a", "seg_b")
    },
    Some("""WITH o AS (SELECT c_mktsegment AS segment,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        FROM orders JOIN customer ON o_custkey = c_custkey),
      g AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(c) AS HUGEINT) AS sx,
          CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS sxx
        FROM o GROUP BY segment),
      m AS (SELECT segment, n,
          CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
          CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
            / CAST(n AS DOUBLE) AS ss
        FROM g)
      SELECT a.segment AS seg_a, b.segment AS seg_b,
        a.n + b.n AS n_total,
        (a.mean_c - b.mean_c)
          / sqrt((a.ss + b.ss) / CAST(a.n + b.n - 2 AS DOUBLE)) AS cohens_d
      FROM m a JOIN m b ON a.segment < b.segment
      ORDER BY seg_a, seg_b"""),
    covers = Seq("STAT-cohens-d"))

  // ------------------------------------------------- design effect
  // Kish's design effect of value-weighted sampling per ship mode:
  // DEFF = n·Σw²/(Σw)² with w = line quantity — how much effective
  // sample size a quantity-weighted draw loses to weight variance.
  // Pure integer moments, one division.
  private val q411 = QueryDef(
    "q411_design_effect",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          col("l_quantity").cast(LongType).as("w"))
      li.groupBy("flag")
        .agg(count(lit(1)).as("n"), sum(col("w")).as("sw"),
          sum(col("w") * col("w")).as("sww"))
        .select(col("flag"), col("n"),
          (col("sw").cast("double") / col("n").cast("double"))
            .as("mean_weight"),
          ((dec38(col("n")) * dec38(col("sww"))).cast("double")
            / (dec38(col("sw")) * dec38(col("sw"))).cast("double"))
            .as("deff"))
        .withColumn("effective_n",
          col("n").cast("double") / col("deff"))
        .orderBy("flag")
    },
    Some("""WITH g AS (SELECT l_returnflag AS flag,
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS sw,
          CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
            AS HUGEINT) AS sww
        FROM lineitem GROUP BY l_returnflag)
      SELECT flag, n,
        CAST(sw AS DOUBLE) / CAST(n AS DOUBLE) AS mean_weight,
        CAST(n * sww AS DOUBLE) / CAST(sw * sw AS DOUBLE) AS deff,
        CAST(n AS DOUBLE)
          / (CAST(n * sww AS DOUBLE) / CAST(sw * sw AS DOUBLE))
          AS effective_n
      FROM g ORDER BY flag"""),
    covers = Seq("STAT-design-effect"))

  // ------------------------------------------------- sales sparsity
  // Catalog-health census per brand: active months vs the calendar
  // span, and the longest consecutive dead stretch — the (brand ×
  // month) cell-sparsity view that q392's per-type day gaps don't
  // give. Month indices are exact integers; the gap scan is one
  // partitioned lag window at brand × month cardinality.
  private val q412 = QueryDef(
    "q412_sales_sparsity",
    (s, dir) => {
      val sold = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("brand"),
          (year(to_date(col("l_shipdate"))) * 12
            + month(to_date(col("l_shipdate"))) - 1).cast(LongType).as("m"))
        .distinct()
      val span = sold.agg(min(col("m")).as("m0"), max(col("m")).as("m1"))
      val w = Window.partitionBy("brand").orderBy("m")
      val gaps = sold.withColumn("prev", lag(col("m"), 1).over(w))
      gaps.crossJoin(broadcast(span))
        .groupBy("brand")
        .agg(count(lit(1)).as("n_active_months"),
          max(col("m1") - col("m0") + 1L).as("n_months_span"),
          coalesce(max(col("m") - col("prev") - 1L), lit(0L))
            .as("max_gap_months"))
        .withColumn("sparsity", lit(1.0d)
          - col("n_active_months").cast("double")
          / col("n_months_span").cast("double"))
        .orderBy("brand")
    },
    Some("""WITH sold AS (SELECT DISTINCT p_brand AS brand,
          CAST(year(CAST(l_shipdate AS DATE)) * 12
            + month(CAST(l_shipdate AS DATE)) - 1 AS BIGINT) AS m
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      span AS (SELECT MIN(m) AS m0, MAX(m) AS m1 FROM sold),
      gaps AS (SELECT brand, m,
          lag(m) OVER (PARTITION BY brand ORDER BY m) AS prev
        FROM sold)
      SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_active_months,
        CAST(MAX(m1 - m0 + 1) AS BIGINT) AS n_months_span,
        CAST(COALESCE(MAX(m - prev - 1), 0) AS BIGINT) AS max_gap_months,
        1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(MAX(m1 - m0 + 1) AS DOUBLE)
          AS sparsity
      FROM gaps, span GROUP BY brand ORDER BY brand"""),
    covers = Seq("DQ-sales-sparsity"))

  // ------------------------------------------------- volume discount curve
  // Does buying more cost less per unit? Mean unit price per quantity
  // band as the ratio of exact sums Σ(extendedprice)/Σ(quantity) —
  // never a per-row division — plus each band's share of total
  // quantity. The empirical volume-discount curve.
  private val q413 = QueryDef(
    "q413_volume_discount_curve",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select((((col("l_quantity").cast(LongType) - 1L) / 10L)
          .cast(LongType) * 10L + 1L).as("qty_band_lo"),
          col("l_quantity").cast(LongType).as("q"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("pc"))
      val tot = li.agg(sum(col("q")).as("tq"))
      li.groupBy("qty_band_lo")
        .agg(count(lit(1)).as("n_lines"), sum(col("q")).as("sum_qty"),
          sum(col("pc")).as("sum_price_cents"))
        .crossJoin(broadcast(tot))
        .select(col("qty_band_lo"), col("n_lines"), col("sum_qty"),
          (col("sum_price_cents").cast("double")
            / col("sum_qty").cast("double")).as("mean_unit_cents"),
          (col("sum_qty").cast("double") / col("tq").cast("double"))
            .as("qty_share"))
        .orderBy("qty_band_lo")
    },
    Some("""WITH li AS (SELECT
          ((CAST(l_quantity AS BIGINT) - 1) // 10) * 10 + 1 AS qty_band_lo,
          CAST(l_quantity AS BIGINT) AS q,
          CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc
        FROM lineitem),
      tot AS (SELECT CAST(SUM(q) AS BIGINT) AS tq FROM li)
      SELECT qty_band_lo, CAST(COUNT(*) AS BIGINT) AS n_lines,
        CAST(SUM(q) AS BIGINT) AS sum_qty,
        CAST(SUM(pc) AS DOUBLE) / CAST(SUM(q) AS DOUBLE) AS mean_unit_cents,
        CAST(SUM(q) AS DOUBLE) / CAST(MIN(tq) AS DOUBLE) AS qty_share
      FROM li, tot GROUP BY qty_band_lo ORDER BY qty_band_lo"""),
    covers = Seq("A-volume-discount"))

  val all: Seq[QueryDef] =
    Seq(q409, q410, q411, q412, q413)
}
