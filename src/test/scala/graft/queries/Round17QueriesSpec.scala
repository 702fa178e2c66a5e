package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-17 gate queries. */
class Round17QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sequence packing: every token lands in exactly one shard-seq stream") {
    val out = graft.SparkEntry.queries("q198_sequence_packing")(spark, dir).cache()
    assert(out.count() > 0)
    // token conservation: per-shard packed totals equal raw totals
    val packed = out.groupBy("shard").agg(sum("n_tokens").as("packed"))
    val raw = graft.Tables.load(spark, dir, "documents")
      .select((col("doc_id") % 8).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("shard").agg(sum("n").as("raw"))
    assert(packed.join(raw, "shard").filter(col("packed") =!= col("raw")).isEmpty)
    // a sequence holds at most budget tokens' worth of STARTS; straddle
    // count is bounded by doc count
    assert(out.filter(col("n_straddle") > col("n_docs")).isEmpty)
    // seq ids are dense from 0 within each shard (no empty sequence is
    // ever emitted, every cut is reachable)
    val dense = out.groupBy("shard")
      .agg(min("seq_id").as("lo"), max("seq_id").as("hi"), count(lit(1)).as("n"))
    assert(dense.filter(col("lo") =!= 0 || col("n") =!= col("hi") + 1).isEmpty)
    out.unpersist()
  }

  test("bitmap distinct equals groupBy-distinct exactly") {
    val out = graft.SparkEntry.queries("q199_bitmap_distinct")(spark, dir).cache()
    val exact = graft.Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact"))
    val j = out.join(exact, "event_type")
    assert(j.count() > 0)
    assert(j.filter(col("n_distinct_users") =!= col("exact")).isEmpty,
      "bitmap popcount distinct must be exact")
    out.unpersist()
  }

  test("co-purchase rules: support bounded by item counts, lift consistent") {
    val out = graft.SparkEntry.queries("q200_copurchase_rules")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_ab") > col("n_a") || col("n_ab") > col("n_b")).isEmpty,
      "pair support cannot exceed either item's order count")
    assert(out.filter(col("part_a") >= col("part_b")).isEmpty,
      "pairs are canonically ordered")
    assert(out.filter(col("conf_a") <= 0 || col("conf_a") > 1).isEmpty)
    out.unpersist()
  }

  test("sliding distinct: 7-day window dominates the daily count") {
    val out = graft.SparkEntry.queries("q202_sliding_distinct")(spark, dir).cache()
    assert(out.count() > 0)
    val daily = graft.Tables.load(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("report_d"))
      .agg(countDistinct(col("user_id")).as("n_daily"))
    val j = out.join(daily, "report_d")
    assert(j.count() === out.count(), "every event day must be reported")
    assert(j.filter(col("n_active_7d") < col("n_daily")).isEmpty,
      "a 7-day window can never see fewer users than its last day")
    out.unpersist()
  }

  test("z-order interleave: bits round-trip per dimension") {
    import org.apache.spark.sql.Row
    val df = spark.range(0, 1024 * 4)
      .select((col("id") % 1024).as("x"), ((col("id") * 7 + 3) % 1024).as("y"))
    val z = graft.store.ZOrder.interleave(Seq(col("x"), col("y")), bits = 10)
    // de-interleaving even/odd bits must recover x and y exactly
    val back = df.select(col("x"), col("y"), z.as("zv"))
      .withColumn("x2", (0 until 10).map(i =>
        shiftleft(shiftright(col("zv"), 2 * i).bitwiseAND(lit(1L)), i))
        .reduce(_ + _))
      .withColumn("y2", (0 until 10).map(i =>
        shiftleft(shiftright(col("zv"), 2 * i + 1).bitwiseAND(lit(1L)), i))
        .reduce(_ + _))
    assert(back.filter(col("x") =!= col("x2") || col("y") =!= col("y2")).isEmpty)
  }

  test("csv round-trip: adversarial payloads survive bit-exact") {
    val out = graft.SparkEntry.queries("q204_csv_roundtrip")(spark, dir).cache()
    val n = graft.Tables.load(spark, dir, "documents").count()
    assert(out.count() === n, "row count must survive the round trip")
    // digests must match a direct (no file I/O) computation
    val direct = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        md5(concat(lit("a,\"quoted\"\nline2 "), col("text")).cast("binary"))
          .as("d2"))
    assert(out.join(direct, "doc_id").filter(col("digest") =!= col("d2")).isEmpty)
    out.unpersist()
  }

  test("partitioned read-back prunes to one directory") {
    val out = graft.SparkEntry.queries("q205_partition_prune")(spark, dir)
    assert(out.count() > 0)
    // re-read what the query wrote; the month filter must reach the
    // scan as a partition filter, not a post-scan predicate
    val read = spark.read.parquet("/tmp/graft_gate_partitioned_orders")
      .filter(col("ym") === "1995-03")
    val scan = read.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.isDefined, "expected a FileSourceScanExec leaf")
    assert(scan.get.partitionFilters.nonEmpty, "ym filter must prune partitions")
    val months = scan.get.selectedPartitions.partitionCount
    assert(months === 1, s"expected exactly 1 pruned partition, read $months")
  }

  test("group by all infers the same groups as explicit keys") {
    val out = graft.SparkEntry.queries("q201_group_by_all")(spark, dir)
    val explicit = graft.Tables.load(spark, dir, "documents")
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("total_chars"))
      .orderBy("source", "lang", "n", "total_chars")
    assert(out.collect().toSeq === explicit.collect().toSeq)
  }
}
