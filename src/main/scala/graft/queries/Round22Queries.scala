package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-22 gate additions (q228+): two-sample and k-sample exact
  * inference (Welch's t, one-way ANOVA F), corpus concentration
  * (Pareto/80-20 coverage), and first-digit (Benford) QA — the
  * remaining classical statistics a curation pipeline runs before
  * trusting a source.
  *
  * Exactness pattern (as q184/q193/q206): every statistic is a SHORT,
  * FIXED expression tree of correctly-rounded IEEE ops (+,−,×,÷,sqrt)
  * over exact DECIMAL/BIGINT aggregates, with group terms pivoted
  * into columns so no float summation order is data-dependent. Both
  * engines therefore agree bit-for-bit and the gate hash-matches.
  */
object Round22Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** DECIMAL(·,4) → DOUBLE the way DuckDB does it: the unscaled
    * integer converts first (one rounding — these squared-price sums
    * exceed 2^53), then divides by 10⁴. Spark's native cast rounds
    * the rational once (correctly), which differs by 1 ulp on some
    * sums; the oracle can't be changed, so the engine reproduces the
    * two-step here. Scale-2 money sums stay under 2^53 unscaled and
    * are immune.
    */
  private def d4ToDouble(c: Column): Column =
    (c * lit(10000L)).cast(DecimalType(38, 0)).cast("double") / lit(10000.0d)

  // ----------------------------------------------- Welch's t-test
  // Unequal-variance two-sample t between returned ('R') and accepted
  // ('A') line prices. One conditional aggregate produces both
  // groups' (n, Σx, Σx²) — sums exact in DECIMAL, surfaced to double
  // via [[d4ToDouble]] — then mean/variance/t/df come from one shared IEEE
  // tree: m=s/n, v=(q−s²/n)/(n−1), t=(m1−m2)/√(v1/n1+v2/n2), Welch–
  // Satterthwaite df. Single scan, single-row reduce — at 100 TB this
  // is a map-side-combined O(1)-state aggregate.
  private val q228 = QueryDef(
    "q228_welch_ttest",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      def side(flag: String, p: String) = Seq(
        sum(when(col("l_returnflag") === flag, 1L).otherwise(0L)).as(s"n$p"),
        sum(when(col("l_returnflag") === flag, dec(col("l_extendedprice"))))
          .cast("double").as(s"s$p"),
        d4ToDouble(sum(when(col("l_returnflag") === flag,
          dec(col("l_extendedprice")) * dec(col("l_extendedprice")))))
          .as(s"q$p"))
      val aggs = side("R", "1") ++ side("A", "2")
      val st = l.agg(aggs.head, aggs.tail: _*)
      val (n1, s1, q1) = (col("n1").cast("double"), col("s1"), col("q1"))
      val (n2, s2, q2) = (col("n2").cast("double"), col("s2"), col("q2"))
      val m1 = s1 / n1
      val m2 = s2 / n2
      val v1 = (q1 - s1 * s1 / n1) / (n1 - lit(1.0d))
      val v2 = (q2 - s2 * s2 / n2) / (n2 - lit(1.0d))
      val se1 = v1 / n1
      val se2 = v2 / n2
      val tStat = (m1 - m2) / sqrt(se1 + se2)
      val df = (se1 + se2) * (se1 + se2) /
        (se1 * se1 / (n1 - lit(1.0d)) + se2 * se2 / (n2 - lit(1.0d)))
      st.select(col("n1"), col("n2"), m1.as("mean_r"), m2.as("mean_a"),
        tStat.as("t_stat"), df.as("welch_df"))
    },
    Some("""WITH g AS (SELECT
        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(SUM(CASE WHEN l_returnflag = 'R'
          THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS s1,
        CAST(SUM(CASE WHEN l_returnflag = 'R'
          THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
               CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS q1,
        CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        CAST(SUM(CASE WHEN l_returnflag = 'A'
          THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS s2,
        CAST(SUM(CASE WHEN l_returnflag = 'A'
          THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
               CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS q2
      FROM lineitem)
      SELECT n1, n2,
        s1 / CAST(n1 AS DOUBLE) AS mean_r,
        s2 / CAST(n2 AS DOUBLE) AS mean_a,
        (s1 / CAST(n1 AS DOUBLE) - s2 / CAST(n2 AS DOUBLE)) /
          sqrt(((q1 - s1 * s1 / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1))
                 / CAST(n1 AS DOUBLE)
             + ((q2 - s2 * s2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1))
                 / CAST(n2 AS DOUBLE)) AS t_stat,
        (((q1 - s1 * s1 / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1))
            / CAST(n1 AS DOUBLE)
         + ((q2 - s2 * s2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1))
            / CAST(n2 AS DOUBLE)) *
        (((q1 - s1 * s1 / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1))
            / CAST(n1 AS DOUBLE)
         + ((q2 - s2 * s2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1))
            / CAST(n2 AS DOUBLE)) /
        ((((q1 - s1 * s1 / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1))
            / CAST(n1 AS DOUBLE)) *
         (((q1 - s1 * s1 / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1))
            / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1)
         + (((q2 - s2 * s2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1))
            / CAST(n2 AS DOUBLE)) *
           (((q2 - s2 * s2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1))
            / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1)) AS welch_df
      FROM g"""),
    covers = Seq("STAT-welch-t"))

  // ----------------------------------------------- one-way ANOVA F
  // Does order priority move order value? F = (SSB/(k−1))/(SSW/(N−k))
  // over the 5 priority groups. The 5 per-group (n, Σx) pairs pivot
  // into columns of ONE aggregate row; SSB/SSW then come from a fixed
  // left-to-right float tree (group order hard-coded, never
  // data-dependent), with Σx² shared for the total sum of squares.
  private val q229 = QueryDef(
    "q229_anova_f",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val flags = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val aggs = flags.zipWithIndex.flatMap { case (f, i) =>
        Seq(
          sum(when(col("o_orderpriority") === f, 1L).otherwise(0L)).as(s"n$i"),
          sum(when(col("o_orderpriority") === f, dec(col("o_totalprice"))))
            .cast("double").as(s"s$i"))
      } :+ d4ToDouble(sum(dec(col("o_totalprice")) * dec(col("o_totalprice"))))
        .as("qq")
      val st = o.agg(aggs.head, aggs.tail: _*)
      def nD(i: Int) = col(s"n$i").cast("double")
      def sD(i: Int) = col(s"s$i")
      // fixed fold order: ((((g0 + g1) + g2) + g3) + g4)
      val groupSq = (0 until 5).map(i => sD(i) * sD(i) / nD(i)).reduceLeft(_ + _)
      val nTot = (0 until 5).map(nD).reduceLeft(_ + _)
      val sTot = (0 until 5).map(sD).reduceLeft(_ + _)
      val ssb = groupSq - sTot * sTot / nTot
      val ssw = col("qq") - groupSq
      val f = (ssb / lit(4.0d)) / (ssw / (nTot - lit(5.0d)))
      st.select(
        nTot.cast("long").as("n_total"), ssb.as("ss_between"),
        ssw.as("ss_within"), f.as("f_stat"))
    },
    Some("""WITH g AS (SELECT
        CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS DOUBLE) AS n0,
        CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
          THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS s0,
        CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
        CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
          THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS s1,
        CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS DOUBLE) AS n2,
        CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
          THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS s2,
        CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS DOUBLE) AS n3,
        CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
          THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS s3,
        CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS DOUBLE) AS n4,
        CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
          THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS s4,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) *
                 CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS qq
      FROM orders)
      SELECT CAST(n0+n1+n2+n3+n4 AS BIGINT) AS n_total,
        ((((s0*s0/n0 + s1*s1/n1) + s2*s2/n2) + s3*s3/n3) + s4*s4/n4)
          - (((((s0+s1)+s2)+s3)+s4) * ((((s0+s1)+s2)+s3)+s4))
            / ((((n0+n1)+n2)+n3)+n4) AS ss_between,
        qq - ((((s0*s0/n0 + s1*s1/n1) + s2*s2/n2) + s3*s3/n3) + s4*s4/n4)
          AS ss_within,
        (((((s0*s0/n0 + s1*s1/n1) + s2*s2/n2) + s3*s3/n3) + s4*s4/n4)
          - (((((s0+s1)+s2)+s3)+s4) * ((((s0+s1)+s2)+s3)+s4))
            / ((((n0+n1)+n2)+n3)+n4)) / 4 /
        ((qq - ((((s0*s0/n0 + s1*s1/n1) + s2*s2/n2) + s3*s3/n3) + s4*s4/n4))
          / (((((n0+n1)+n2)+n3)+n4) - 5)) AS f_stat
      FROM g"""),
    covers = Seq("STAT-anova-f"))

  // ------------------------------------------- Pareto 80% coverage
  // Corpus concentration per source: how many of the longest
  // documents cover 80% of the source's characters? Docs rank by
  // (n_chars desc, doc_id) inside each source; the answer is the
  // smallest prefix whose running char sum reaches 4/5 of the total —
  // decided by the INTEGER compare 5·cum ≥ 4·total, so no float
  // boundary exists. One sort-based window per source partition; the
  // concentration decision every mixing recipe starts from.
  private val q230 = QueryDef(
    "q230_pareto_coverage",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val w = Window.partitionBy("source")
        .orderBy(desc("n_chars"), col("doc_id"))
      val tot = Window.partitionBy("source")
      val ranked = d.select(col("source"), col("n_chars"), col("doc_id"))
        .withColumn("cum", sum(col("n_chars")).over(w))
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("total", sum(col("n_chars")).over(tot))
        .withColumn("n_docs", count(lit(1)).over(tot))
      ranked.filter(col("cum") * 5 >= col("total") * 4)
        .groupBy("source")
        .agg(
          min(col("rk")).as("docs_to_80pct"),
          first(col("n_docs")).as("n_docs"),
          (min(col("rk")).cast("double") /
            first(col("n_docs")).cast("double")).as("doc_share"))
        .orderBy("source")
    },
    Some("""WITH r AS (SELECT source, n_chars,
          SUM(n_chars) OVER (PARTITION BY source
            ORDER BY n_chars DESC, doc_id
            ROWS UNBOUNDED PRECEDING) AS cum,
          ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY n_chars DESC, doc_id) AS rk,
          SUM(n_chars) OVER (PARTITION BY source) AS total,
          COUNT(*) OVER (PARTITION BY source) AS n_docs
        FROM documents)
      SELECT source,
        CAST(MIN(rk) AS BIGINT) AS docs_to_80pct,
        CAST(MIN(n_docs) AS BIGINT) AS n_docs,
        CAST(CAST(MIN(rk) AS BIGINT) AS DOUBLE) /
          CAST(CAST(MIN(n_docs) AS BIGINT) AS DOUBLE) AS doc_share
      FROM r WHERE cum * 5 >= total * 4
      GROUP BY source ORDER BY source"""),
    covers = Seq("CUR-pareto"))

  // ------------------------------------------- Benford first digit
  // Data-QA screen: the distribution of first significant digits of
  // order totals (fabricated or truncated feeds deviate wildly from
  // Benford's curve). The digit comes from the decimal STRING of the
  // integer part — no log10, no float — so both engines bucket
  // identically; the share is one division.
  private val q231 = QueryDef(
    "q231_benford_digits",
    (s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_totalprice") >= 1)
      o.select(substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
          .as("digit"))
        .groupBy("digit")
        .agg(count(lit(1)).as("n"))
        .withColumn("share",
          col("n").cast("double") / sum(col("n")).over().cast("double"))
        .orderBy("digit")
    },
    Some("""WITH d AS (SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
          AS VARCHAR), 1, 1) AS digit
        FROM orders WHERE o_totalprice >= 1),
      g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit)
      SELECT digit, n,
        CAST(n AS DOUBLE) / CAST(CAST(SUM(n) OVER () AS BIGINT) AS DOUBLE) AS share
      FROM g ORDER BY digit"""),
    covers = Seq("QA-benford"))

  // ------------------------------------------- rendezvous sharding
  // Highest-random-weight (rendezvous) shard assignment, and WHY it
  // beats `key % n` at scale: growing 8 → 9 shards moves only the
  // keys whose new shard wins the weight race (expected 1/9 ≈ 11%),
  // while `% n` reshuffles ~8/9 of the corpus. Weights are md5-derived
  // 56-bit integers packed with the shard id (·16 + s), the argmax is
  // `greatest` over nine per-row arms — narrow, no explode, no
  // aggregate buffer demotion — and the mover counts are exact in
  // both engines because md5 of identical strings is identical.
  private val q232 = QueryDef(
    "q232_rendezvous_sharding",
    (s, dir) => {
      val d = t(s, dir, "documents").select("doc_id")
      val shard8 = graft.functions.RendezvousShard.shardOf(col("doc_id"), 8)
      val shard9 = graft.functions.RendezvousShard.shardOf(col("doc_id"), 9)
      d.select(
          (col("doc_id") % 8 =!= col("doc_id") % 9).as("mod_moved"),
          (shard8 =!= shard9).as("rdv_moved"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("rdv_moved"), 1L).otherwise(0L)).as("moved_rendezvous"),
          sum(when(col("mod_moved"), 1L).otherwise(0L)).as("moved_mod"))
        .select(col("n_docs"), col("moved_rendezvous"), col("moved_mod"),
          (col("moved_rendezvous").cast("double") / col("n_docs").cast("double"))
            .as("rendezvous_share"),
          (col("moved_mod").cast("double") / col("n_docs").cast("double"))
            .as("mod_share"))
    },
    Some {
      def w(i: Int) =
        s"(('0x' || substr(md5(doc_id || ':$i'), 1, 14))::BIGINT * 16 + $i)"
      val g8 = (0 until 8).map(w).mkString("greatest(", ", ", ")")
      val g9 = (0 until 9).map(w).mkString("greatest(", ", ", ")")
      s"""WITH m AS (SELECT doc_id % 8 <> doc_id % 9 AS mod_moved,
          $g8 % 16 <> $g9 % 16 AS rdv_moved FROM documents)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(CASE WHEN rdv_moved THEN 1 ELSE 0 END) AS BIGINT)
            AS moved_rendezvous,
          CAST(SUM(CASE WHEN mod_moved THEN 1 ELSE 0 END) AS BIGINT)
            AS moved_mod,
          CAST(SUM(CASE WHEN rdv_moved THEN 1 ELSE 0 END) AS DOUBLE) /
            CAST(COUNT(*) AS DOUBLE) AS rendezvous_share,
          CAST(SUM(CASE WHEN mod_moved THEN 1 ELSE 0 END) AS DOUBLE) /
            CAST(COUNT(*) AS DOUBLE) AS mod_share
        FROM m"""
    },
    covers = Seq("SHARD-rendezvous"))

  val all: Seq[QueryDef] =
    Seq(q228, q229, q230, q231, q232)
}
