package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning over a corpus — the tokenizer
  * training loop, shaped for scale the way q175 gates the first
  * iteration:
  *
  *   1. ONE corpus-sized aggregate collapses the text to its
  *      vocabulary `(word, freq)`; this is the only pass whose cost
  *      grows with the corpus.
  *   2. Each merge iteration runs entirely on the distinct vocabulary
  *      (thousands of rows at any corpus size): count adjacent symbol
  *      pairs weighted by word frequency, pick the most frequent pair
  *      — ties broken by lexicographic order, so the merge sequence
  *      is DETERMINISTIC — and rewrite the vocabulary with the pair
  *      fused.
  *
  * The per-iteration argmax is a driver-side `limit(1).collect` of a
  * vocab-sized aggregate (the same principle as the reference's
  * daily_stats rollup: collapse first, iterate on the collapsed
  * form). The symbol rewrite is a typed `map` over the vocabulary
  * Dataset — per-word sequential work, which is exactly what BPE
  * merging is; the vocabulary is cached and stays small.
  *
  * Greedy BPE reference: Sennrich et al. 2016 ("Neural Machine
  * Translation of Rare Words with Subword Units"), whose algorithm 1
  * this reproduces with frequency-weighted pair counts.
  */
object BpeMerges {

  /** One vocabulary row: the word's current symbol sequence + corpus
    * frequency.
    */
  final case class VocabWord(symbols: Seq[String], freq: Long)

  /** Split the corpus into a frequency-weighted vocabulary of
    * character-symbol sequences (the BPE starting state).
    */
  def vocabulary(docs: DataFrame, textCol: String): Dataset[VocabWord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"))
      .as[(String, Long)]
      .map { case (w, f) => VocabWord(w.map(_.toString), f) }
  }

  /** Weighted adjacent-pair counts of the current vocabulary. */
  def pairCounts(vocab: Dataset[VocabWord]): DataFrame = {
    val spark = vocab.sparkSession
    import spark.implicits._
    vocab
      .flatMap(v => v.symbols.indices.dropRight(1)
        .map(i => ((v.symbols(i), v.symbols(i + 1)), v.freq)))
      .toDF("pair", "freq")
      .groupBy(col("pair._1").as("a"), col("pair._2").as("b"))
      .agg(sum(col("freq")).as("n"))
  }

  /** Learn `nMerges` merges; returns them in application order. */
  def learn(docs: DataFrame, textCol: String, nMerges: Int): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = vocabulary(docs, textCol).cache()
    vocab.count() // materialize before the loop rewrites it
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      // bounded-collect: limit(1) — the single best merge pair
      val top = pairCounts(vocab)
        .orderBy(desc("n"), col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val prev = vocab
        vocab = prev.map(v => VocabWord(mergeOnce(v.symbols, a, b), v.freq)).cache()
        vocab.count()
        prev.unpersist()
        i += 1
      }
    }
    merges.result()
  }

  /** Apply learned merges to one word (inference-side tokenize). */
  def tokenize(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.map(_.toString): Seq[String]) {
      case (syms, (a, b)) => mergeOnce(syms, a, b)
    }

  /** Fuse every non-overlapping left-to-right occurrence of (a, b). */
  private[text] def mergeOnce(symbols: Seq[String], a: String, b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < symbols.length) {
      if (i + 1 < symbols.length && symbols(i) == a && symbols(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += symbols(i); i += 1 }
    }
    out.result()
  }
}
