package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DecimalType, LongType}

import graft.Tables

/** Round-89 gate additions (q462–q466): distributed linear algebra
  * (top principal component by power iteration — covariance exact on
  * the fixed-point lattice, iteration folds in a pinned order so
  * Spark's driver loop and DuckDB's list_reduce produce bit-identical
  * doubles), recommender evaluation (hit-rate, coverage/diversity),
  * and calendar/catalog effects.
  */
object Round89Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val Q = 1048576L // 2^20 fixed-point lattice (q307/q442)

  private def dec38(c: Column): Column = c.cast(DecimalType(38, 0))

  // ------------------------------------------------- power iteration
  // Top principal axis of the embedding cloud: the 64×64 scaled
  // covariance numerator C = n·Σqq' − (Σq)(Σq)' aggregates exactly
  // (DECIMAL(38,0)/HUGEINT) from one distributed pass; the 4096-cell
  // matrix then runs 8 power iterations. Every fold (matvec, norm,
  // Rayleigh) is a LEFT fold in dim order — Scala reduceLeft on the
  // driver, list_reduce(list(... ORDER BY j)) in DuckDB — so the
  // doubles match bitwise despite 8 rounds of float arithmetic.
  // The 100 TB story: the only corpus-sized stage is the moment
  // aggregation; the iteration is O(d²) driver math.
  private val q462 = QueryDef(
    "q462_power_iteration_pca",
    (s, dir) => {
      val vd = t(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
        .select(col("vec_id"), col("d"),
          floor(col("x").cast("double") * lit(Q.toDouble))
            .cast(LongType).as("q"))
      val pair = vd.as("a").join(vd.as("b"), Seq("vec_id"))
        .groupBy(col("a.d").as("i"), col("b.d").as("j"))
        .agg(sum(col("a.q") * col("b.q")).as("sij"), count(lit(1)).as("n"))
      val moments = vd.groupBy("d").agg(sum("q").as("sd"))
      val cells = pair
        .join(moments.select(col("d").as("i"), col("sd").as("si")), Seq("i"))
        .join(moments.select(col("d").as("j"), col("sd").as("sj")), Seq("j"))
        .select(col("i"), col("j"),
          (dec38(col("n")) * dec38(col("sij")) -
            dec38(col("si")) * dec38(col("sj"))).cast("double").as("cnum"))
        // bounded-collect: 64x64 covariance cells — O(dim²) model state
        .collect()
      val dDim = 64
      val cov = Array.ofDim[Double](dDim, dDim)
      cells.foreach(r => cov(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      var v = Array.fill(dDim)(0.125)
      var nrm = 0.0
      for (_ <- 1 to 8) {
        val w = Array.tabulate(dDim)(i =>
          (0 until dDim).map(j => cov(i)(j) * v(j)).reduceLeft(_ + _))
        nrm = math.sqrt(w.map(x => x * x).reduceLeft(_ + _))
        v = w.map(_ / nrm)
      }
      import s.implicits._
      v.zipWithIndex
        .map { case (l, d) => (d.toLong, l, nrm) }.toSeq
        .toDF("dim", "loading", "lambda")
        .orderBy("dim")
    },
    Some {
      val iters = (1 to 8).map { k =>
        s"""w$k AS MATERIALIZED (SELECT c.i,
          list_reduce(list(c.cnum * v.v ORDER BY c.j),
            (a, b) -> a + b) AS w
        FROM cells c JOIN v${k - 1} v ON v.i = c.j GROUP BY c.i),
      n$k AS MATERIALIZED (SELECT sqrt(list_reduce(
          list(w * w ORDER BY i), (a, b) -> a + b)) AS nrm FROM w$k),
      v$k AS MATERIALIZED (SELECT i,
          w / (SELECT nrm FROM n$k) AS v FROM w$k)"""
      }.mkString(",\n      ")
      s"""WITH vd AS MATERIALIZED (SELECT vec_id, dd.i - 1 AS d,
          CAST(floor(CAST(embedding[dd.i] AS DOUBLE) * 1048576.0)
            AS BIGINT) AS q
        FROM embeddings, (SELECT unnest(range(1, 65)) AS i) dd),
      pair AS MATERIALIZED (SELECT a.d AS i, b.d AS j,
          CAST(SUM(a.q * b.q) AS BIGINT) AS sij,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM vd a JOIN vd b ON b.vec_id = a.vec_id
        GROUP BY 1, 2),
      moments AS MATERIALIZED (SELECT d, CAST(SUM(q) AS BIGINT) AS sd
        FROM vd GROUP BY d),
      cells AS MATERIALIZED (SELECT p.i, p.j,
          CAST(CAST(p.n AS HUGEINT) * CAST(p.sij AS HUGEINT) -
            CAST(mi.sd AS HUGEINT) * CAST(mj.sd AS HUGEINT)
            AS DOUBLE) AS cnum
        FROM pair p JOIN moments mi ON mi.d = p.i
        JOIN moments mj ON mj.d = p.j),
      v0 AS (SELECT i, 0.125 AS v FROM (SELECT unnest(range(0, 64))
        AS i)),
      $iters
      SELECT CAST(v8.i AS BIGINT) AS dim, v8.v AS loading,
        (SELECT nrm FROM n8) AS lambda
      FROM v8 ORDER BY dim"""
    },
    covers = Seq("LA-power-iteration"))

  /** Train-period top-3 co-purchase recommendations per part (by
    * co-occurrence count, ties → partner key) — the shared model of
    * q463/q466/q513, built once per (context, dir) through the
    * GraphGateSource cache (three gates × three bench executions
    * otherwise rebuild the train self-join nine times per JVM; the
    * gates' DuckDB oracles re-derive it independently from lineitem).
    * Train = orders shipped before 1999.
    */
  private[queries] def recs(s: SparkSession, dir: String): DataFrame =
    GraphGateSource.cached(s, "train-recs:" + dir)(buildRecs(s, dir))

  /** The uncached builder — PlanGuardSpec pins its TopKPerKey shape
    * here, since the cached frame's visible plan is a checkpoint scan.
    */
  private[queries] def buildRecs(s: SparkSession, dir: String): DataFrame = {
    val trainOrders = t(s, dir, "orders")
      .filter(to_date(col("o_orderdate")) < lit("1999-01-01").cast(DateType))
      .select(col("o_orderkey"))
    val op = t(s, dir, "lineitem")
      .join(trainOrders, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val co = op.as("a").join(op.as("b"), Seq("o"))
      .filter(col("a.p") =!= col("b.p"))
      .groupBy(col("a.p").as("part"), col("b.p").as("rec"))
      .agg(count(lit(1)).as("w"))
    // top-3 through bounded heaps (map-side capped to 3 per part per
    // partition) instead of a full window sort of every co-pair; the
    // (w desc, rec) ordering is total per part, so ranks ≡ row_number
    graft.plans.TopKPerKey.perKey(co, Seq("part"),
        Seq(col("w").desc, col("rec")), 3)
      .select("part", "rec", "rk")
  }

  private[queries] val recsSql: String =
    """train_o AS (SELECT o_orderkey FROM orders
        WHERE CAST(o_orderdate AS DATE) < DATE '1999-01-01'),
      op AS MATERIALIZED (SELECT DISTINCT l.l_orderkey AS o,
          l.l_partkey AS p
        FROM lineitem l JOIN train_o t ON t.o_orderkey = l.l_orderkey),
      co AS (SELECT a.p AS part, b.p AS rec,
          CAST(COUNT(*) AS BIGINT) AS w
        FROM op a JOIN op b ON b.o = a.o AND a.p <> b.p
        GROUP BY 1, 2),
      recs AS MATERIALIZED (SELECT part, rec, rk FROM (SELECT part, rec,
          row_number() OVER (PARTITION BY part
            ORDER BY w DESC, rec) AS rk
        FROM co) WHERE rk <= 3)"""

  // ------------------------------------------------- rec hit rate
  // Offline evaluation of the "customers also bought" model: for
  // every part occurrence in a TEST order (1999+), a hit when any
  // OTHER part of that order is in the part's top-3 train-period
  // rec list. Hit-rate and the co-visitation base rate are exact
  // count ratios — the leakage-free eval loop of an item-item
  // recommender, end to end in one plan.
  private val q463 = QueryDef(
    "q463_item_item_hitrate",
    (s, dir) => {
      val testOrders = t(s, dir, "orders")
        .filter(to_date(col("o_orderdate")) >=
          lit("1999-01-01").cast(DateType))
        .select(col("o_orderkey"))
      // session-cached like recs: the test-period order-part frame
      // feeds the opportunity count, the hit join, and all three
      // bench executions
      val top = GraphGateSource.cached(s, "test-op:" + dir)(
        t(s, dir, "lineitem")
          .join(testOrders, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct())
      val multi = top.groupBy("o").agg(count(lit(1)).as("sz"))
        .filter(col("sz") >= 2).select("o")
      val opp = top.join(multi, Seq("o"))
      val hits = opp.as("x")
        .join(recs(s, dir), col("x.p") === col("part"))
        .join(top.as("y"),
          col("x.o") === col("y.o") && col("rec") === col("y.p"))
        .select(col("x.o").as("o"), col("x.p").as("p"))
        .distinct()
      opp.agg(count(lit(1)).as("n_opportunities"))
        .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
        .select(col("n_opportunities"), col("n_hits"),
          (col("n_hits").cast("double") /
            col("n_opportunities").cast("double")).as("hit_rate"))
    },
    Some(s"""WITH $recsSql,
      test_o AS (SELECT o_orderkey FROM orders
        WHERE CAST(o_orderdate AS DATE) >= DATE '1999-01-01'),
      topt AS MATERIALIZED (SELECT DISTINCT l.l_orderkey AS o,
          l.l_partkey AS p
        FROM lineitem l JOIN test_o t ON t.o_orderkey = l.l_orderkey),
      multi AS (SELECT o FROM topt GROUP BY o HAVING COUNT(*) >= 2),
      opp AS MATERIALIZED (SELECT x.o, x.p FROM topt x
        JOIN multi m ON m.o = x.o),
      hits AS (SELECT DISTINCT x.o, x.p
        FROM opp x JOIN recs r ON r.part = x.p
        JOIN topt y ON y.o = x.o AND y.p = r.rec)
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM opp)
          AS n_opportunities,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM hits) AS n_hits,
        CAST((SELECT COUNT(*) FROM hits) AS DOUBLE) /
          CAST((SELECT COUNT(*) FROM opp) AS DOUBLE) AS hit_rate"""),
    covers = Seq("ML-rec-hitrate"))

  // ------------------------------------------------- rec coverage
  // Health of the rec model itself: catalog coverage (share of parts
  // ever recommended), share of parts with a full 3-slot list, and
  // brand diversity (lists whose 3 recs span ≥2 brands). A high
  // hit-rate with low coverage is a popularity trap — this is the
  // audit that catches it.
  private val q466 = QueryDef(
    "q466_rec_coverage",
    (s, dir) => {
      // recs is already session-checkpointed (GraphGateSource.cached)
      val r = recs(s, dir)
      val brands = t(s, dir, "part")
        .select(col("p_partkey").as("rec"), col("p_brand"))
      val nParts = t(s, dir, "part").agg(count(lit(1)).as("n_parts"))
      val perList = r.join(broadcast(brands), Seq("rec"))
        .groupBy("part")
        .agg(count(lit(1)).as("n_recs"),
          countDistinct("p_brand").as("n_brands"))
      val distinctRec = r.select("rec").distinct()
        .agg(count(lit(1)).as("n_recommended"))
      perList.agg(count(lit(1)).as("n_lists"),
          sum(when(col("n_recs") === 3, 1L).otherwise(0L)).as("n_full"),
          sum(when(col("n_brands") >= 2, 1L).otherwise(0L))
            .as("n_diverse"))
        .crossJoin(distinctRec).crossJoin(nParts)
        .select(col("n_lists"), col("n_full"), col("n_diverse"),
          col("n_recommended"), col("n_parts"),
          (col("n_recommended").cast("double") /
            col("n_parts").cast("double")).as("coverage"),
          (col("n_diverse").cast("double") / col("n_lists").cast("double"))
            .as("diversity"))
    },
    Some(s"""WITH $recsSql,
      brands AS (SELECT p_partkey AS rec, p_brand FROM part),
      per_list AS (SELECT r.part, CAST(COUNT(*) AS BIGINT) AS n_recs,
          CAST(COUNT(DISTINCT b.p_brand) AS BIGINT) AS n_brands
        FROM recs r JOIN brands b ON b.rec = r.rec
        GROUP BY r.part)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_lists,
        CAST(COUNT(*) FILTER (WHERE n_recs = 3) AS BIGINT) AS n_full,
        CAST(COUNT(*) FILTER (WHERE n_brands >= 2) AS BIGINT)
          AS n_diverse,
        (SELECT CAST(COUNT(DISTINCT rec) AS BIGINT) FROM recs)
          AS n_recommended,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM part) AS n_parts,
        CAST((SELECT COUNT(DISTINCT rec) FROM recs) AS DOUBLE) /
          CAST((SELECT COUNT(*) FROM part) AS DOUBLE) AS coverage,
        CAST(COUNT(*) FILTER (WHERE n_brands >= 2) AS DOUBLE) /
          CAST(COUNT(*) AS DOUBLE) AS diversity
      FROM per_list"""),
    covers = Seq("ML-rec-coverage"))

  // ------------------------------------------------- month-end effect
  // Do orders pile up at month end (quota-chasing)? Mean daily
  // volume over each month's last 3 calendar days vs the rest, per
  // segment — the ratio folds to S_end·n_rest/(n_end·S_rest), one
  // exact-integer division. last_day() on both engines decides
  // membership identically.
  private val q464 = QueryDef(
    "q464_month_end_effect",
    (s, dir) => {
      val seg = t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("segment"))
      val daily = t(s, dir, "orders").join(seg, Seq("o_custkey"))
        .groupBy(col("segment"), to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("is_end",
          datediff(last_day(col("day")), col("day")) <= 2)
      daily.groupBy("segment")
        .agg(sum(when(col("is_end"), col("cnt")).otherwise(0L)).as("s_end"),
          sum(when(col("is_end"), 1L).otherwise(0L)).as("n_end"),
          sum(when(!col("is_end"), col("cnt")).otherwise(0L)).as("s_rest"),
          sum(when(!col("is_end"), 1L).otherwise(0L)).as("n_rest"))
        .select(col("segment"), col("s_end"), col("n_end"), col("s_rest"),
          col("n_rest"),
          ((col("s_end") * col("n_rest")).cast("double") /
            (col("n_end") * col("s_rest")).cast("double")).as("end_lift"))
        .orderBy("segment")
    },
    Some("""WITH daily AS (SELECT c.c_mktsegment AS segment,
          CAST(o.o_orderdate AS DATE) AS day,
          CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2),
      d AS (SELECT segment, cnt,
          (date_diff('day', day, last_day(day)) <= 2) AS is_end
        FROM daily)
      SELECT segment,
        CAST(SUM(CASE WHEN is_end THEN cnt ELSE 0 END) AS BIGINT)
          AS s_end,
        CAST(COUNT(*) FILTER (WHERE is_end) AS BIGINT) AS n_end,
        CAST(SUM(CASE WHEN NOT is_end THEN cnt ELSE 0 END) AS BIGINT)
          AS s_rest,
        CAST(COUNT(*) FILTER (WHERE NOT is_end) AS BIGINT) AS n_rest,
        CAST(SUM(CASE WHEN is_end THEN cnt ELSE 0 END) *
            COUNT(*) FILTER (WHERE NOT is_end) AS DOUBLE) /
          CAST(COUNT(*) FILTER (WHERE is_end) *
            SUM(CASE WHEN NOT is_end THEN cnt ELSE 0 END) AS DOUBLE)
          AS end_lift
      FROM d GROUP BY segment ORDER BY segment"""),
    covers = Seq("TS-month-end"))

  // ------------------------------------------------- cold start
  // Catalog cold-start exposure: test-period (1999+) orders touching
  // parts never sold in the train period — order share and revenue
  // share at exact scale-4 cents. The census that decides whether a
  // co-purchase model (q463) can serve the live traffic at all.
  private val q465 = QueryDef(
    "q465_cold_start_census",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"),
          (to_date(col("o_orderdate")) < lit("1999-01-01").cast(DateType))
            .as("is_train"))
      val li = t(s, dir, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_partkey"), col("is_train"),
          ((col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1).cast(DecimalType(4, 2)) -
              col("l_discount").cast(DecimalType(4, 2)))) * 10000)
            .cast(LongType).as("rev4"))
      val seen = li.filter(col("is_train"))
        .select(col("l_partkey")).distinct()
      val test = li.filter(!col("is_train"))
        .join(seen.withColumn("seen", lit(true)), Seq("l_partkey"), "left")
        .withColumn("cold", col("seen").isNull)
      val perOrder = test.groupBy("l_orderkey")
        .agg(max(when(col("cold"), 1L).otherwise(0L)).as("has_cold"))
      perOrder.agg(count(lit(1)).as("n_test_orders"),
          sum("has_cold").as("n_cold_orders"))
        .crossJoin(test.agg(sum("rev4").as("rev_total"),
          sum(when(col("cold"), col("rev4")).otherwise(0L))
            .as("rev_cold")))
        .select(col("n_test_orders"), col("n_cold_orders"),
          (col("n_cold_orders").cast("double") /
            col("n_test_orders").cast("double")).as("cold_order_share"),
          col("rev_cold"), col("rev_total"),
          (col("rev_cold").cast("double") / col("rev_total").cast("double"))
            .as("cold_rev_share"))
    },
    Some("""WITH o AS (SELECT o_orderkey,
          (CAST(o_orderdate AS DATE) < DATE '1999-01-01') AS is_train
        FROM orders),
      li AS (SELECT l.l_orderkey, l.l_partkey, o.is_train,
          CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(4,2)) -
              CAST(l.l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)
            AS rev4
        FROM lineitem l JOIN o ON o.o_orderkey = l.l_orderkey),
      seen AS (SELECT DISTINCT l_partkey FROM li WHERE is_train),
      test AS (SELECT li.l_orderkey, li.rev4,
          (s.l_partkey IS NULL) AS cold
        FROM li LEFT JOIN seen s ON s.l_partkey = li.l_partkey
        WHERE NOT li.is_train),
      per_order AS (SELECT l_orderkey,
          CAST(MAX(CASE WHEN cold THEN 1 ELSE 0 END) AS BIGINT)
            AS has_cold
        FROM test GROUP BY 1)
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM per_order)
          AS n_test_orders,
        (SELECT CAST(SUM(has_cold) AS BIGINT) FROM per_order)
          AS n_cold_orders,
        CAST((SELECT SUM(has_cold) FROM per_order) AS DOUBLE) /
          CAST((SELECT COUNT(*) FROM per_order) AS DOUBLE)
          AS cold_order_share,
        CAST(SUM(CASE WHEN cold THEN rev4 ELSE 0 END) AS BIGINT)
          AS rev_cold,
        CAST(SUM(rev4) AS BIGINT) AS rev_total,
        CAST(SUM(CASE WHEN cold THEN rev4 ELSE 0 END) AS DOUBLE) /
          CAST(SUM(rev4) AS DOUBLE) AS cold_rev_share
      FROM test"""),
    covers = Seq("ML-cold-start"))

  val all: Seq[QueryDef] = Seq(q462, q463, q464, q465, q466)
}
