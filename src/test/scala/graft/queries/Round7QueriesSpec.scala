package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-7 gate queries (the DuckDB gate
  * hash-checks exact values at sf0.01; these pin the properties that
  * must hold at ANY scale).
  */
class Round7QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("chunking covers every token exactly: stride starts, bounded lengths") {
    val out = graft.SparkEntry.queries("q162_chunk_overlap")(spark, dir).cache()
    assert(out.count() > 0)
    // every chunk ≤ window, > 0; starts are exact multiples of the stride
    assert(out.filter(col("chunk_len") > 32 || col("chunk_len") < 1).isEmpty)
    assert(out.filter(col("start_tok") =!= col("chunk_idx") * 24).isEmpty)
    // consecutive chunks overlap by window−stride unless the tail ends sooner:
    // next start (24·(i+1)) is always < this chunk's end (start + len)
    // precisely when a next chunk exists — i.e. gaps are impossible.
    val gaps = out.as("a").join(out.as("b"),
      col("a.doc_id") === col("b.doc_id") &&
        col("b.chunk_idx") === col("a.chunk_idx") + 1)
      .filter(col("b.start_tok") > col("a.start_tok") + col("a.chunk_len"))
    assert(gaps.isEmpty, "chunk sequence has token gaps")
    out.unpersist()
  }

  test("token budget: admitted mass never exceeds the budget per source") {
    val out = graft.SparkEntry.queries("q163_token_budget")(spark, dir)
    assert(out.count() > 0)
    assert(out.filter(col("budget_used") > 3000).isEmpty)
    assert(out.filter(col("tok_admitted") =!= col("budget_used")).isEmpty)
  }

  test("percentile_disc returns actual data values") {
    val out = graft.SparkEntry.queries("q164_percentile_disc")(spark, dir).cache()
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag").as("f"), col("l_quantity").as("q")).distinct()
    // every reported p50 must be an existing (flag, quantity) pair
    val missing = out.join(li,
      out("l_returnflag") === li("f") && out("p50") === li("q"), "left_anti")
    assert(missing.isEmpty, "p50 not an order statistic of its group")
    out.unpersist()
  }

  test("window EXCLUDE emulation: loo_rev = frame sum minus own revenue") {
    val out = graft.SparkEntry.queries("q165_window_exclude")(spark, dir)
    // leave-one-out average of a ±3 frame averages ≤ 6 values; with at
    // least one neighbor it is finite and loo_rev/loo_avg agree in sign
    assert(out.count() > 0)
    assert(out.filter(col("loo_avg").isNull && col("loo_rev") =!= 0).isEmpty)
  }

  test("int8 quantization bounds and zero-vector guard") {
    val out = graft.SparkEntry.queries("q166_int8_quantize")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("q_min") < -127 || col("q_max") > 127).isEmpty)
    // a vector's largest-magnitude coordinate quantizes to ±127 (or the
    // vector is all-zero): scale is per-row maxabs
    assert(out.filter(col("maxabs") > 0 &&
      col("q_max") =!= 127 && col("q_min") =!= -127).isEmpty)
    assert(out.filter(col("maxabs") === 0 &&
      (col("q_min") =!= 0 || col("q_max") =!= 0)).isEmpty)
    out.unpersist()
  }

  test("markov transitions: outgoing probabilities sum to 1 per state") {
    val out = graft.SparkEntry.queries("q167_markov_transitions")(spark, dir)
    val sums = out.groupBy("prev_type").agg(sum(col("p")).as("ps"))
    assert(sums.filter(abs(col("ps") - 1.0) > 1e-9).isEmpty)
  }

  test("tpch q10 top-20 is revenue-sorted and returns-only") {
    val out = graft.SparkEntry.queries("q168_tpch_q10")(spark, dir).cache()
    assert(out.count() <= 20 && out.count() > 0)
    val revs = out.select("revenue").collect().map(_.getDouble(0)).toSeq
    assert(revs == revs.sortBy(-_), "not sorted by revenue desc")
    out.unpersist()
  }
}
