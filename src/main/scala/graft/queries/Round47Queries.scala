package graft.queries

import graft.Tables

/** Round-47 gate additions (q292+): SQL-surface pins for the aggregate
  * FILTER clause and star-EXCEPT projection — syntax a reference user
  * migrating SQL workloads reaches for on day one.
  */
object Round47Queries {

  // ------------------------------------------------- FILTER clause
  // Standard-SQL conditional aggregation: COUNT/SUM ... FILTER
  // (WHERE ...) — the declarative form of q02's CASE-WHEN pivoting,
  // and a single-pass replacement for N filtered subqueries. Both
  // engines parse the standard syntax and fold the predicate into the
  // aggregate buffer update (one scan, map-side combined). Sums stay
  // exact DECIMAL; the one share closes as a division of exact longs.
  private val q292 = QueryDef(
    "q292_filter_clause",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderpriority,
          COUNT(*) AS n,
          COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_final,
          COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS rev_final,
          CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) AS final_share
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")
    },
    Some("""SELECT o_orderpriority,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_final,
        CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
          FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS rev_final,
        CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS final_share
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""),
    covers = Seq("SQL-filter-clause"))

  // ------------------------------------------------- star EXCEPT
  // Wide-table hygiene: project everything but the bulky columns.
  // Spark spells it `* EXCEPT (...)`, DuckDB `* EXCLUDE (...)` — the
  // semantics pin is that both drop the named columns and keep the
  // REST in declaration order, so the hash gate catches any column-
  // order or retention divergence. Scan-level column pruning still
  // applies: the excluded columns never leave the reader.
  private val q293 = QueryDef(
    "q293_star_except",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT * EXCEPT (text)
        FROM documents
        WHERE doc_id % 25 = 0
        ORDER BY doc_id""")
    },
    Some("""SELECT * EXCLUDE (text)
      FROM documents
      WHERE doc_id % 25 = 0
      ORDER BY doc_id"""),
    covers = Seq("SQL-star-except"))

  val all: Seq[QueryDef] =
    Seq(q292, q293)
}
