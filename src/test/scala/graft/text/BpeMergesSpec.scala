package graft.text

import graft.SparkSpec

/** BPE merge learning against the hand-computable Sennrich-style
  * example, plus determinism and inference-consistency pins.
  */
class BpeMergesSpec extends SparkSpec {

  private def corpus(rows: String*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    rows.toDF("text")
  }

  test("learns the classic low/lower merges in frequency order") {
    // vocab: low x5, lowest x2 — pairs: (l,o) 7, (o,w) 7, (w,e) 2,
    // (e,s) 2, (s,t) 2. First merge is (l,o) by the lexicographic
    // tiebreak over equal counts, then (lo,w) 7...
    val docs = corpus(
      "low low low low low",
      "lowest lowest")
    val merges = BpeMerges.learn(docs, "text", 3)
    assert(merges.take(2) == Seq(("l", "o"), ("lo", "w")))
    // after (l,o)+(lo,w): pairs are (low,e) 2, (e,s) 2, (s,t) 2 —
    // lexicographic tiebreak picks (e,s)
    assert(merges(2) == ("e", "s"))
  }

  test("tokenize applies merges consistently with training") {
    val docs = corpus("banana banana band")
    val merges = BpeMerges.learn(docs, "text", 4)
    // whatever was learned, re-tokenizing a training word must fuse
    // every learned pair: no adjacent (a, b) from the merge list may
    // survive in the output
    val toks = BpeMerges.tokenize("banana", merges)
    merges.foreach { case (a, b) =>
      assert(!toks.sliding(2).exists(p => p.length == 2 && p(0) == a && p(1) == b),
        s"unapplied merge ($a,$b) in $toks")
    }
    assert(toks.mkString == "banana", "tokenization must preserve the word")
  }

  test("merge order is deterministic across runs") {
    val docs = corpus(
      "the fast key order sort table scan merge",
      "the fast key order sort window small hash")
    val m1 = BpeMerges.learn(docs, "text", 5)
    val m2 = BpeMerges.learn(docs, "text", 5)
    assert(m1 == m2)
  }

  test("mergeOnce fuses non-overlapping occurrences left to right") {
    assert(BpeMerges.mergeOnce(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(BpeMerges.mergeOnce(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(BpeMerges.mergeOnce(Seq("x"), "a", "b") == Seq("x"))
  }
}
