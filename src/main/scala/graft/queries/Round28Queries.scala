package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-28 gate additions (q250+): unicode string semantics and
  * n-ary extremum null handling — two more scalar corners engines
  * drift apart on (code-unit vs codepoint string ops; SQL-standard
  * NULL-poisoning vs null-skipping greatest/least).
  */
object Round28Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  // ------------------------------------------------- unicode semantics
  // Multibyte-aware string surface: length must count CODEPOINTS (both
  // engines) while octet_length/strlen counts UTF-8 bytes; substr
  // offsets are codepoint offsets even when they cross a multibyte
  // boundary; upper maps é→É/ç→Ç through full unicode case tables;
  // and reverse is codepoint-wise. Documented exclusions: astral
  // chars (Spark reverses UTF-16 code units, DuckDB codepoints) and
  // ß (Java uppercases to SS, DuckDB to U+1E9E ẞ) — both outside the
  // pinned contract. The multibyte payload is synthesized per row so
  // the parquet corpus stays engine-neutral.
  private val q250 = QueryDef(
    "q250_unicode_strings",
    (s, dir) => {
      val str = concat(col("p_name"), lit(" héΩ-çafé"))
      t(s, dir, "part")
        .select(col("p_partkey"), str.as("u"))
        .select(col("p_partkey"), col("u"),
          length(col("u")).cast("long").as("n_chars"),
          octet_length(col("u")).cast("long").as("n_bytes"),
          upper(col("u")).as("up"),
          substring(col("u"), 8, 6).as("mid"),
          reverse(col("u")).as("rev"))
        .orderBy("p_partkey")
    },
    Some("""WITH p AS (SELECT p_partkey, p_name || ' héΩ-çafé' AS u FROM part)
      SELECT p_partkey, u,
        CAST(length(u) AS BIGINT) AS n_chars,
        CAST(strlen(u) AS BIGINT) AS n_bytes,
        upper(u) AS up,
        substr(u, 8, 6) AS mid,
        reverse(u) AS rev
      FROM p ORDER BY p_partkey"""),
    covers = Seq("S-unicode"))

  // ------------------------------------------------- greatest/least nulls
  // N-ary extrema with NULL operands: both engines SKIP nulls
  // (greatest(1, NULL, 3) = 3) and return NULL only when every
  // operand is — the Oracle/standard NULL-poisoning variant would
  // null out any row with one missing reading, which is why the
  // contract needs a pin. Nullable operands are derived per row via
  // NULLIF on digit bands so every combination (0, 1, all nulls)
  // occurs in the data.
  private val q251 = QueryDef(
    "q251_extrema_nulls",
    (s, dir) => {
      val cents = (dec(col("c_acctbal")) * 100).cast("long")
      val a = nullif((cents % 10).cast("long"), lit(3L))
      val b = nullif(((cents % 100) / 10).cast("long"), lit(4L))
      val c = nullif((cents % 7).cast("long"), lit(5L))
      t(s, dir, "customer")
        .select(col("c_custkey"), a.as("a"), b.as("b"), c.as("c"))
        .select(col("c_custkey"), col("a"), col("b"), col("c"),
          greatest(col("a"), col("b"), col("c")).as("hi"),
          least(col("a"), col("b"), col("c")).as("lo"),
          (greatest(col("a"), col("b"), col("c")).isNull).as("all_null"))
        .orderBy("c_custkey")
    },
    Some("""WITH c AS (SELECT c_custkey,
          NULLIF(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) % 10, 3) AS a,
          NULLIF((CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) % 100) // 10, 4) AS b,
          NULLIF(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) % 7, 5) AS c
        FROM customer)
      SELECT c_custkey, a, b, c,
        greatest(a, b, c) AS hi,
        least(a, b, c) AS lo,
        greatest(a, b, c) IS NULL AS all_null
      FROM c ORDER BY c_custkey"""),
    covers = Seq("M-extrema-nulls"))

  // ------------------------------------------------- comparator array sort
  // In-row sorting with a CUSTOM comparator lambda: each order's
  // line structs sorted by (quantity DESC, linenumber ASC) entirely
  // inside the row via array_sort((l, r) => …) — no explode, no
  // window. The comparator is a total order (linenumber is unique per
  // order), so the result is deterministic even though collect_list's
  // input order is not: any permutation sorts to the same sequence.
  // DuckDB has no comparator lambdas; the oracle derives the same
  // sequence through ORDER BY inside an ordered aggregate — two
  // different mechanisms, one pinned answer.
  private val q252 = QueryDef(
    "q252_comparator_sort",
    (s, dir) => {
      val sorted = array_sort(
        col("lines"),
        (l, r) => when(l.getField("q") > r.getField("q"), -1)
          .when(l.getField("q") < r.getField("q"), 1)
          .otherwise(l.getField("ln") - r.getField("ln")))
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(collect_list(struct(
          dec(col("l_quantity")).as("q"),
          col("l_linenumber").as("ln"))).as("lines"))
        .select(col("l_orderkey"), size(col("lines")).as("n_lines"),
          array_join(transform(sorted, x => x.getField("ln").cast("string")), ",")
            .as("ln_by_qty"))
        .orderBy("l_orderkey")
    },
    Some("""SELECT l_orderkey,
        CAST(COUNT(*) AS INTEGER) AS n_lines,
        string_agg(CAST(l_linenumber AS VARCHAR), ','
          ORDER BY CAST(l_quantity AS DECIMAL(18,2)) DESC, l_linenumber)
          AS ln_by_qty
      FROM lineitem
      GROUP BY l_orderkey ORDER BY l_orderkey"""),
    covers = Seq("A-comparator-sort"))

  val all: Seq[QueryDef] =
    Seq(q250, q251, q252)
}
