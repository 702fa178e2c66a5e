package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, IntegerType, LongType}

import graft.Tables

/** Relational operator inventory over the driver's synthetic tables.
  *
  * Each query exercises one operator family from SURVEY.md §2 (ids in
  * `covers`), re-expressed Spark-first: declarative DataFrame plans,
  * broadcast hints for dim joins, decimal-exact aggregation so results
  * hash-match the DuckDB oracle regardless of partial-agg order.
  *
  * Reference semantics being reproduced (citations into
  * /root/reference/): grouped aggregates `src/transformation/
  * aggregators.py:21-31`, conditional aggregation `:129-140`, rolling
  * frames `:40-53`, ranking `:98-115,207-213`, LAG/LEAD `:148-164`,
  * unnest `:66-78`, FILTER-clause window `:280-286`, interval-overlap
  * theta join `:298-325`, scalar subquery `:270-276`; idempotent-load
  * anti-join / latest-wins upsert `src/pipeline.py:133-298`.
  */
object RelationalQueries {

  /** Exact 2-decimal view of a money/quantity double. The source data
    * is generated at 2 decimals, so this cast is lossless; decimal
    * sums are associative → safe under Spark partial aggregation AND
    * identical to DuckDB's sequential sum.
    */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------- A1/A4
  private val q01 = QueryDef(
    "q01_groupby_agg",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(COUNT(*) AS BIGINT) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    covers = Seq("A1", "A4"))

  // ---------------------------------------------------------------- A2
  private val q02 = QueryDef(
    "q02_conditional_agg",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
          sum(when(col("o_totalprice") > 150000, 1).otherwise(0)).as("n_big"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      CAST(SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    covers = Seq("A2", "A7"))

  // ---------------------------------------------------------------- A3
  private val q03 = QueryDef(
    "q03_count_distinct",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          max(col("l_quantity")).as("max_qty"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
      CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
      CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part,
      CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
      MAX(l_quantity) AS max_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    covers = Seq("A3"))

  // ---------------------------------------------------------------- A5
  // Hour × day-of-week bucketing. Spark dayofweek is Sunday=1, the
  // reference's STRFTIME('%w') (and DuckDB dayofweek) are Sunday=0 —
  // subtract 1 for parity (SURVEY §2.4 A5).
  private val q04 = QueryDef(
    "q04_hour_dow",
    (s, dir) => {
      val e = t(s, dir, "events")
      e.groupBy(
          date_format(col("ts"), "HH").as("hour_of_day"),
          (dayofweek(col("ts")) - 1).cast(IntegerType).as("dow"))
        .agg(
          count(lit(1)).as("n_events"),
          (sum(dec(col("value"))).cast("double") / count(lit(1))).as("avg_value"))
        .orderBy("hour_of_day", "dow")
    },
    Some("""SELECT strftime(ts, '%H') AS hour_of_day,
      CAST(dayofweek(ts) AS INTEGER) AS dow,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""),
    covers = Seq("A5"))

  // ---------------------------------------------------------------- A6/J4
  // String-to-rows unnest: the reference contorts CSV → json_each
  // (aggregators.py:66-78); Spark's explode(split) is the native form.
  private val q05 = QueryDef(
    "q05_explode_tokens",
    (s, dir) => {
      val d = t(s, dir, "documents")
      d.select(explode(split(lower(col("text")), " +")).as("token"))
        .filter(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("token"))
        .limit(25)
    },
    Some("""WITH toks AS (
        SELECT unnest(string_split_regex(lower(text), ' +')) AS token FROM documents)
      SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks
      WHERE token <> '' GROUP BY token
      ORDER BY cnt DESC, token LIMIT 25"""),
    covers = Seq("A6", "J4", "O2"))

  // ---------------------------------------------------------------- A7
  private val q06 = QueryDef(
    "q06_global_agg",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          sum(dec(col("l_extendedprice"))).cast("double").as("total_price"),
          (sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_discount"),
          min(to_date(col("l_shipdate"))).as("first_ship"),
          max(to_date(col("l_shipdate"))).as("last_ship"))
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_discount,
      CAST(MIN(l_shipdate) AS DATE) AS first_ship,
      CAST(MAX(l_shipdate) AS DATE) AS last_ship
      FROM lineitem"""),
    covers = Seq("A7"))

  // ---------------------------------------------------------------- W1/W2/W7/A8
  // Daily revenue with a 7-row sliding frame — the reference's
  // ROLLING_TREND (aggregators.py:40-53). Aggregate first, window over
  // the (small) aggregated frame; decimal through the window so frame
  // evaluation order is irrelevant.
  private val q07 = QueryDef(
    "q07_rolling_window",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val daily = o.groupBy(to_date(col("o_orderdate")).as("order_date"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).as("rev"))
      val w = Window.orderBy("order_date").rowsBetween(-6, Window.currentRow)
      daily.select(
          col("order_date"),
          col("n_orders"),
          sum(col("n_orders")).over(w).as("rolling_orders_7"),
          sum(col("rev")).over(w).cast("double").as("rolling_rev_7"),
          (sum(col("rev")).over(w).cast("double") /
            sum(col("n_orders")).over(w)).as("rolling_avg_price"))
        .orderBy("order_date")
    },
    Some("""WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS order_date,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1)
      SELECT order_date, n_orders,
        CAST(SUM(n_orders) OVER w AS BIGINT) AS rolling_orders_7,
        CAST(SUM(rev) OVER w AS DOUBLE) AS rolling_rev_7,
        CAST(SUM(rev) OVER w AS DOUBLE) / SUM(n_orders) OVER w AS rolling_avg_price
      FROM daily
      WINDOW w AS (ORDER BY order_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      ORDER BY order_date"""),
    covers = Seq("W1", "W2", "W7", "A8"))

  // ---------------------------------------------------------------- W3/W4/W6
  // All four ranking flavors (aggregators.py:98-115, 207-213).
  // row_number gets a unique tiebreak; rank/dense_rank/percent_rank
  // order only by the (possibly tied) value — identical semantics in
  // both engines.
  private val q08 = QueryDef(
    "q08_ranking",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val byBal = Window.partitionBy("c_nationkey")
        .orderBy(desc("c_acctbal"), asc("c_custkey"))
      val byBalTies = Window.partitionBy("c_nationkey").orderBy(desc("c_acctbal"))
      val global = Window.orderBy("c_acctbal")
      c.select(
          col("c_custkey"),
          col("c_nationkey"),
          row_number().over(byBal).cast(LongType).as("rn"),
          rank().over(byBalTies).cast(LongType).as("rnk"),
          dense_rank().over(byBalTies).cast(LongType).as("drnk"),
          percent_rank().over(global).as("pct_rank"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_nationkey,
      ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
      RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
      DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk,
      PERCENT_RANK() OVER (ORDER BY c_acctbal) AS pct_rank
      FROM customer ORDER BY c_custkey"""),
    covers = Seq("W3", "W4", "W6"))

  // ---------------------------------------------------------------- W5
  // Day-over-day deltas via LAG/LEAD (aggregators.py:148-164).
  private val q09 = QueryDef(
    "q09_lag_lead",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val daily = o.groupBy(to_date(col("o_orderdate")).as("order_date"))
        .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).as("rev"))
      val w = Window.orderBy("order_date")
      daily.select(
          col("order_date"),
          col("n"),
          lag(col("n"), 1).over(w).as("prev_n"),
          (col("n") - lag(col("n"), 1).over(w)).as("delta_n"),
          ((col("n") - lag(col("n"), 1).over(w)).cast("double") * 100 /
            nullif(lag(col("n"), 1).over(w), lit(0))).as("pct_change"),
          lead(col("n"), 1).over(w).as("next_n"),
          col("rev").cast("double").as("revenue"))
        .orderBy("order_date")
    },
    Some("""WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS order_date,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1)
      SELECT order_date, n,
        LAG(n, 1) OVER w AS prev_n,
        n - LAG(n, 1) OVER w AS delta_n,
        CAST(n - LAG(n, 1) OVER w AS DOUBLE) * 100 / NULLIF(LAG(n, 1) OVER w, 0) AS pct_change,
        LEAD(n, 1) OVER w AS next_n,
        CAST(rev AS DOUBLE) AS revenue
      FROM daily WINDOW w AS (ORDER BY order_date) ORDER BY order_date"""),
    covers = Seq("W5"))

  // ---------------------------------------------------------------- W8
  // FILTER-clause window rewrite: Spark has no FILTER on windows →
  // sum(when(cond, x)) with NO otherwise, preserving FILTER's
  // empty-set→NULL semantics (SURVEY §2.5 W8).
  private val q10 = QueryDef(
    "q10_share_window",
    (s, dir) => {
      val e = t(s, dir, "events")
      val daily = e.groupBy(
          to_date(col("ts")).as("event_date"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val byDay = Window.partitionBy("event_date")
      daily.select(
          col("event_date"),
          col("event_type"),
          col("cnt"),
          sum(col("cnt")).over(byDay).as("day_total"),
          (col("cnt").cast("double") * 100 /
            nullif(sum(col("cnt")).over(byDay), lit(0))).as("pct_of_day"),
          sum(when(col("event_type") === "error", col("cnt")))
            .over(byDay).as("day_errors"))
        .orderBy("event_date", "event_type")
    },
    Some("""WITH daily AS (
        SELECT CAST(ts AS DATE) AS event_date, event_type,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2)
      SELECT event_date, event_type, cnt,
        CAST(SUM(cnt) OVER d AS BIGINT) AS day_total,
        CAST(cnt AS DOUBLE) * 100 / NULLIF(SUM(cnt) OVER d, 0) AS pct_of_day,
        CAST(SUM(cnt) FILTER (WHERE event_type = 'error') OVER d AS BIGINT) AS day_errors
      FROM daily WINDOW d AS (PARTITION BY event_date)
      ORDER BY event_date, event_type"""),
    covers = Seq("W8"))

  // ---------------------------------------------------------------- J1
  // Star-schema dim join — dims are broadcast (the 100 TB version
  // shuffles only the fact table side; dims are KBs).
  private val q11 = QueryDef(
    "q11_join_dims",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("revenue"))
        .orderBy("r_name", "n_name")
    },
    Some("""SELECT r_name, n_name,
      CAST(COUNT(*) AS BIGINT) AS n_items,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name"""),
    covers = Seq("J1"))

  // ---------------------------------------------------------------- O1/O2
  // Top-k: Catalyst plans TakeOrderedAndProject — no full sort at scale.
  private val q12 = QueryDef(
    "q12_topk",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.select(
          col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          to_date(col("o_orderdate")).as("order_date"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(20)
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice,
      CAST(o_orderdate AS DATE) AS order_date
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"""),
    covers = Seq("O1", "O2"))

  // ---------------------------------------------------------------- S7/J3
  // Insert-if-absent semantics (pipeline.py:133-182) = anti-join on key.
  private val q13 = QueryDef(
    "q13_anti_join",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      ORDER BY c_custkey"""),
    covers = Seq("S7", "J3"))

  // ---------------------------------------------------------------- J3 (semi)
  private val q14 = QueryDef(
    "q14_semi_join",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 200000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 200000)
      ORDER BY c_custkey"""),
    covers = Seq("J3"))

  // ---------------------------------------------------------------- S8
  // Upsert/latest-wins (pipeline.py:184-298) re-expressed as a
  // row_number dedup keeping the newest record per key — the
  // Parquet-friendly MERGE equivalent.
  private val q15 = QueryDef(
    "q15_latest_wins",
    (s, dir) => {
      val e = t(s, dir, "events")
      val w = Window.partitionBy("user_id")
        .orderBy(desc("ts"), desc("event_id"))
      e.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
        .orderBy("user_id")
    },
    Some("""WITH ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      SELECT user_id, event_id, event_type, value
      FROM ranked WHERE rn = 1 ORDER BY user_id"""),
    covers = Seq("S8"))

  // ---------------------------------------------------------------- C2
  // Uncorrelated scalar subquery (aggregators.py:270-276): computed
  // once, broadcast to the filter.
  private val q16 = QueryDef(
    "q16_scalar_subquery",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val thr = o.agg(
        (sum(dec(col("o_totalprice"))).cast("double") / count(lit(1))).as("thr"))
      o.crossJoin(broadcast(thr))
        .filter(col("o_totalprice") > col("thr"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_above_avg"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_above_avg
      FROM orders
      WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM orders)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    covers = Seq("C2", "C1"))

  // ---------------------------------------------------------------- P7-style
  // Rule-cascade classification as a pure when/otherwise chain — the
  // reference's row-UDF (cleaners.py:133-171) pattern, kept codegen'd.
  private val q17 = QueryDef(
    "q17_case_cascade",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.select(
          when(col("l_quantity") >= 45, "huge")
            .when(col("l_quantity") >= 30, "large")
            .when(col("l_quantity") >= 10, "medium")
            .otherwise("small").as("size_class"),
          when(col("l_discount") >= 0.08, "deep")
            .when(col("l_discount") >= 0.03, "mid")
            .otherwise("low").as("discount_class"),
          dec(col("l_extendedprice")).as("price"))
        .groupBy("size_class", "discount_class")
        .agg(count(lit(1)).as("n"), sum(col("price")).cast("double").as("total"))
        .orderBy("size_class", "discount_class")
    },
    Some("""SELECT
      CASE WHEN l_quantity >= 45 THEN 'huge'
           WHEN l_quantity >= 30 THEN 'large'
           WHEN l_quantity >= 10 THEN 'medium'
           ELSE 'small' END AS size_class,
      CASE WHEN l_discount >= 0.08 THEN 'deep'
           WHEN l_discount >= 0.03 THEN 'mid'
           ELSE 'low' END AS discount_class,
      CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"""),
    covers = Seq("P7", "P2", "P10"))

  // ---------------------------------------------------------------- §2.8 strings
  private val q18 = QueryDef(
    "q18_string_funcs",
    (s, dir) => {
      val p = t(s, dir, "part")
      p.groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("n_parts"),
          sum(when(col("p_type").like("%a%"), 1).otherwise(0)).as("n_with_a"),
          (sum(length(trim(col("p_name")))).cast("double") / count(lit(1)))
            .as("avg_name_len"),
          min(upper(substring(col("p_name"), 1, 8))).as("min_prefix"),
          max(regexp_replace(lower(col("p_type")), " ", "_")).as("max_slug"))
        .orderBy("p_brand")
    },
    Some("""SELECT p_brand,
      CAST(COUNT(*) AS BIGINT) AS n_parts,
      CAST(SUM(CASE WHEN p_type LIKE '%a%' THEN 1 ELSE 0 END) AS BIGINT) AS n_with_a,
      CAST(SUM(length(trim(p_name))) AS DOUBLE) / COUNT(*) AS avg_name_len,
      MIN(upper(substr(p_name, 1, 8))) AS min_prefix,
      MAX(replace(lower(p_type), ' ', '_')) AS max_slug
      FROM part GROUP BY p_brand ORDER BY p_brand"""),
    covers = Seq("P2", "P3", "P12"))

  // ---------------------------------------------------------------- §2.8 dates
  private val q19 = QueryDef(
    "q19_date_funcs",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.groupBy(
          year(col("o_orderdate")).as("order_year"),
          month(col("o_orderdate")).as("order_month"))
        .agg(
          count(lit(1)).as("n_orders"),
          min(to_date(col("o_orderdate"))).as("first_day"),
          max(datediff(lit("2002-01-01").cast("date"), to_date(col("o_orderdate"))))
            .as("max_days_to_2002"))
        .orderBy("order_year", "order_month")
    },
    Some("""SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
      CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS order_month,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(MIN(o_orderdate) AS DATE) AS first_day,
      CAST(MAX(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')) AS INTEGER) AS max_days_to_2002
      FROM orders GROUP BY 1, 2 ORDER BY 1, 2"""),
    covers = Seq("A1"))

  // ---------------------------------------------------------------- J2
  // Interval-overlap self-join (aggregators.py:298-325). Unlike the
  // reference's pure theta join, we keep the equi key (user_id) in the
  // join condition so Spark plans a shuffled hash/sort-merge join with
  // the range predicate as a post-filter — linear shuffle, not the
  // O(n²) BroadcastNestedLoop a bare theta join would get. This is the
  // 100 TB-safe shape (SURVEY §4.3).
  private val q20 = QueryDef(
    "q20_overlap_join",
    (s, dir) => {
      val e = t(s, dir, "events")
        .select(
          col("event_id"), col("user_id"),
          col("ts").as("start_ts"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("end_ts"))
      val a = e.as("a")
      val b = e.as("b")
      a.join(b,
          col("a.user_id") === col("b.user_id") &&
          col("a.event_id") < col("b.event_id") &&
          col("a.start_ts") < col("b.end_ts") &&
          col("a.end_ts") > col("b.start_ts"))
        .groupBy(col("a.user_id").as("user_id"))
        .agg(count(lit(1)).as("n_overlapping_pairs"))
        .orderBy("user_id")
    },
    Some("""WITH s AS (
        SELECT event_id, user_id, ts AS start_ts,
               ts + INTERVAL 30 MINUTE AS end_ts
        FROM events)
      SELECT a.user_id AS user_id, CAST(COUNT(*) AS BIGINT) AS n_overlapping_pairs
      FROM s a JOIN s b
        ON a.user_id = b.user_id
       AND a.event_id < b.event_id
       AND a.start_ts < b.end_ts
       AND a.end_ts > b.start_ts
      GROUP BY a.user_id ORDER BY user_id"""),
    covers = Seq("J2"))

  val all: Seq[QueryDef] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20)
}
