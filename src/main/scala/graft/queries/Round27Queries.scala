package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-27 gate additions (q247+): cross-engine semantic pins for
  * the classically divergent scalar corners — ISO week boundaries,
  * negative integer division/modulo, and decimal rounding. Each is a
  * place engines have historically disagreed (floor vs truncating
  * division, banker's vs half-up rounding, week-1 rules), so pinning
  * hash-equality here protects every query built on top of them.
  */
object Round27Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  // ------------------------------------------------- ISO week boundaries
  // ISO-8601 week bucketing over seven years of order dates: the
  // (week-year, week) key differs from the calendar pair exactly at
  // year boundaries (Dec 29–Jan 3 can belong to week 1 of NEXT year
  // or week 52/53 of the PREVIOUS — both engines must agree on every
  // such row). n_cross counts the rows whose ISO week-year differs
  // from the calendar year; min/max pin the bucket edges.
  private val q247 = QueryDef(
    "q247_iso_week",
    (s, dir) => {
      val d = to_date(col("o_orderdate"))
      t(s, dir, "orders")
        .select(d.as("d"),
          expr("extract(YEAROFWEEK FROM o_orderdate)").cast("long").as("iso_year"),
          weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
          year(col("o_orderdate")).cast("long").as("cal_year"))
        .groupBy("iso_year", "iso_week")
        .agg(count(lit(1)).as("n"),
          sum(when(col("iso_year") =!= col("cal_year"), 1L).otherwise(0L))
            .as("n_cross"),
          min(col("d")).as("first_day"),
          max(col("d")).as("last_day"))
        .orderBy("iso_year", "iso_week")
    },
    Some("""SELECT CAST(isoyear(o_orderdate) AS BIGINT) AS iso_year,
        CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CASE WHEN isoyear(o_orderdate) <> EXTRACT(YEAR FROM o_orderdate)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_cross,
        MIN(CAST(o_orderdate AS DATE)) AS first_day,
        MAX(CAST(o_orderdate AS DATE)) AS last_day
      FROM orders
      GROUP BY 1, 2 ORDER BY iso_year, iso_week"""),
    covers = Seq("D-iso-week"))

  // ------------------------------------------------- negative div/mod
  // Integer division and modulo on NEGATIVE operands: Spark's `DIV`
  // and `%` truncate toward zero with the dividend's sign (Java
  // semantics), and DuckDB's `//`/`%` agree — but floor-division
  // engines (Python, PostgreSQL's date math) do not, so the contract
  // deserves a pin. pmod (always-nonnegative residue, THE bucketing
  // form — a negative key must never produce a negative partition) is
  // rebuilt in the oracle as ((x % n) + n) % n. Balances in exact
  // cents exercise both signs.
  private val q248 = QueryDef(
    "q248_negative_mod_div",
    (s, dir) => {
      val cents = (dec(col("c_acctbal")) * 100).cast("long")
      t(s, dir, "customer")
        .select(col("c_custkey"), cents.as("cents"))
        .select(col("c_custkey"), col("cents"),
          expr("cents DIV 7").as("div7"),
          (col("cents") % 7).as("mod7"),
          pmod(col("cents"), lit(7)).as("pmod7"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey,
        CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) // 7 AS div7,
        CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) % 7 AS mod7,
        ((CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) % 7) + 7) % 7
          AS pmod7
      FROM customer ORDER BY c_custkey"""),
    covers = Seq("M-negative-mod"))

  // ------------------------------------------------- decimal rounding
  // round() on DECIMALS (the only rounding the determinism rules
  // allow — double rounding is banned engine-wide because Spark
  // rounds the shortest decimal repr and DuckDB the binary value).
  // On decimals both engines implement HALF_UP away from zero;
  // exact-half inputs at the cut digit (x.x5 cents) and negatives
  // prove it. The rounding itself happens in DECIMAL; the OUTPUT
  // columns are scaled BIGINTs (cents/tenths/units) because the
  // driver's hash normalizes decimal columns differently per engine
  // (r4 post-mortem: arrow values byte-identical, hash still red —
  // every green gate in the suite emits only BIGINT/DOUBLE finals,
  // so q249 now does too; the half-up pin is unchanged, a banker's-
  // rounding engine still flips r1_tenths/d1_cents on every .x5 row).
  private val q249 = QueryDef(
    "q249_decimal_rounding",
    (s, dir) => {
      val bal = dec(col("c_acctbal"))
      t(s, dir, "customer")
        .select(col("c_custkey"),
          (bal * 100).cast("long").as("bal_cents"),
          (round(bal, 1) * 10).cast("long").as("r1_tenths"),
          round(bal, 0).cast("long").as("r0_units"),
          ((round(bal, 1) - bal) * 100).cast("long").as("d1_cents"))
        .filter((bal * 100 % 10).isin(5, -5))
        .orderBy("c_custkey")
    },
    Some("""WITH c AS (SELECT c_custkey,
          CAST(c_acctbal AS DECIMAL(18,2)) AS bal FROM customer)
      SELECT c_custkey,
        CAST(bal * 100 AS BIGINT) AS bal_cents,
        CAST(round(bal, 1) * 10 AS BIGINT) AS r1_tenths,
        CAST(round(bal, 0) AS BIGINT) AS r0_units,
        CAST((round(bal, 1) - bal) * 100 AS BIGINT) AS d1_cents
      FROM c
      WHERE bal * 100 % 10 IN (5, -5)
      ORDER BY c_custkey"""),
    covers = Seq("M-decimal-round"))

  val all: Seq[QueryDef] =
    Seq(q247, q248, q249)
}
