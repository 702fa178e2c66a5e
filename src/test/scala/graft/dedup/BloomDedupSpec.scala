package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomDedupSpec extends SparkSpec {

  test("newRows equals the exact anti-join for every fpp outcome") {
    import spark.implicits._
    val corpus = (1 to 2000).map(i => (i.toLong, s"text_$i")).toDF("id", "text")
    // batch: half overlap the corpus, half are new
    val batch = (1500 to 2500).map(i => (10000L + i, s"text_$i")).toDF("id", "text")
    val got = BloomDedup.newRows(batch, corpus, Seq("text"), expectedItems = 2000)
      .select("text").collect().map(_.getString(0)).toSet
    val exact = batch.join(corpus.select("text"), Seq("text"), "left_anti")
      .select("text").collect().map(_.getString(0)).toSet
    assert(got == exact)
    assert(got == (2001 to 2500).map(i => s"text_$i").toSet)
  }

  test("a tiny (high-fpp) filter still yields exact results, just verifies more") {
    import spark.implicits._
    val corpus = (1 to 500).map(i => (i.toLong, s"k$i")).toDF("id", "k")
    val batch = (400 to 900).map(i => (i.toLong, s"k$i")).toDF("id", "k")
    // 64 bits for 500 items → filter is saturated, almost every probe
    // is a (false) positive — correctness must not depend on fpp
    val got = BloomDedup.newRows(batch, corpus, Seq("k"),
        expectedItems = 500, numBits = 64)
      .select("k").collect().map(_.getString(0)).toSet
    assert(got == (501 to 900).map(i => s"k$i").toSet)
  }

  test("mightContain has no false negatives") {
    import spark.implicits._
    val corpus = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val f = BloomDedup.buildFilter(corpus, Seq("v"), expectedItems = 1000)
    val misses = corpus.filter(!BloomDedup.mightContain(f, Seq("v"))).count()
    assert(misses == 0)
  }
}
