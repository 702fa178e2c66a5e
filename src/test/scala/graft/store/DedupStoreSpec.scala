package graft.store

import java.nio.file.Files

import graft.SparkSpec

class DedupStoreSpec extends SparkSpec {

  test("admits only never-seen keys across batches; replays are no-ops") {
    import spark.implicits._
    val store = new TableStore(spark, Files.createTempDirectory("dedupstore").toString)
    val ds = new DedupStore(store, "corpus", "text", expectedItems = 10000)

    assert(ds.admit("b1",
      Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "text")) == 3L)
    // one corpus dup, one internal dup pair, two new
    val b2 = Seq((10L, "beta"), (11L, "delta"), (12L, "delta"), (13L, "eps"))
      .toDF("id", "text")
    assert(ds.admit("b2", b2) == 2L)
    // exactly-once: same batch id again changes nothing
    assert(ds.admit("b2", b2) == 0L)
    val texts = ds.corpus.get.collect().map(_.getAs[String]("text")).toSeq
    assert(texts.sorted == Seq("alpha", "beta", "delta", "eps", "gamma"))
    // internal dedup kept the lowest-ordered row
    assert(ds.corpus.get.filter($"text" === "delta").head().getLong(0) == 11L)
  }

  test("state survives a reopen (bloom + docs + ledger recommitted together)") {
    import spark.implicits._
    val root = Files.createTempDirectory("dedupstore2").toString
    val s1 = new DedupStore(new TableStore(spark, root), "c", "text", 10000)
    s1.admit("b1", Seq((1L, "x"), (2L, "y")).toDF("id", "text"))
    // fresh instance over the same directory sees the same state
    val s2 = new DedupStore(new TableStore(spark, root), "c", "text", 10000)
    assert(s2.admit("b1", Seq((1L, "x")).toDF("id", "text")) == 0L) // ledger held
    assert(s2.admit("b2", Seq((3L, "x"), (4L, "z")).toDF("id", "text")) == 1L)
    assert(s2.corpus.get.count() == 3)
  }

  test("a saturated bloom filter still admits exactly (verify join backstops fpp)") {
    import spark.implicits._
    val store = new TableStore(spark, Files.createTempDirectory("dedupstore3").toString)
    // expectedItems=1 → the filter saturates immediately, ~every probe
    // is a false positive; admission must stay exact
    val ds = new DedupStore(store, "c", "text", expectedItems = 1)
    ds.admit("b1", (1 to 200).map(i => (i.toLong, s"t$i")).toDF("id", "text"))
    val n = ds.admit("b2", (150 to 400).map(i => (i.toLong, s"t$i")).toDF("id", "text"))
    assert(n == 200L)
    assert(ds.corpus.get.count() == 400)
  }
}
