package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact set-similarity self-join via prefix filtering (the
  * SSJoin/PPJoin family: order every document's set elements by a
  * global rarity order; two sets with Jaccard ≥ θ MUST share an
  * element inside their first `|x| - ceil(θ·|x|) + 1` elements of
  * that order, so candidate pairs are generated from those short
  * prefixes only and then verified exactly).
  *
  * This is the exact-answer complement to MinHash/LSH (`LshIndex`,
  * q23): no false negatives, no signatures — the pruning is
  * algebraic. At scale the win is that the candidate-generating
  * inverted index holds only prefix elements (the RAREST ~(1-θ)
  * share of each document), whose posting lists are short by
  * construction; the frequent elements that dominate ordinary
  * posting-list joins (q22/q105) never generate candidates at all.
  *
  * Every threshold comparison is exact integer arithmetic
  * (`ceil(θn)` as `(θ_num·n + θ_den - 1) DIV θ_den`, the Jaccard
  * test cross-multiplied) — no float rounding can make the Spark
  * side and a brute-force oracle disagree (gate `q141`).
  *
  * Reference behavior: near-duplicate grouping over cleaned
  * disruption text (`/root/reference/src/processing/data_cleaner.py`
  * dedupes exact `disruption_id` only; this generalizes to content
  * similarity as SURVEY §2's dedup family requires).
  */
object PrefixFilterJoin {

  /** Pairs with whitespace-token-set Jaccard ≥ θ. Pruning power
    * depends on token diversity — for natural text prefer
    * [[shingleSelfJoin]], whose shingle vocabulary is far larger.
    */
  def jaccardSelfJoin(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      thetaNum: Int,
      thetaDen: Int): DataFrame =
    setSelfJoin(docs, idCol, split(col(textCol), " "), thetaNum, thetaDen)

  /** Pairs whose word n-gram (shingle) sets have Jaccard ≥ θ — the
    * standard near-duplicate formulation: shingles keep word ORDER
    * information and draw from a combinatorially large vocabulary,
    * so rare-prefix pruning bites even when the word vocabulary is
    * tiny.
    */
  def shingleSelfJoin(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      thetaNum: Int,
      thetaDen: Int): DataFrame =
    setSelfJoin(docs, idCol,
      graft.functions.WordShingles(docs.sparkSession, col(textCol), n),
      thetaNum, thetaDen)

  /** All unordered pairs (a_id < b_id) whose de-duplicated
    * `setExpr` element sets have Jaccard ≥ thetaNum/thetaDen, with
    * the exact intersection size and the Jaccard value. Documents
    * with empty sets never pair.
    */
  def setSelfJoin(
      docs: DataFrame,
      idCol: String,
      setExpr: Column,
      thetaNum: Int,
      thetaDen: Int): DataFrame = {
    require(thetaNum > 0 && thetaDen > 0 && thetaNum <= thetaDen, "need 0 < θ ≤ 1")

    val tok = docs.select(col(idCol).as("doc_id"), explode(array_distinct(setExpr)).as("tk"))

    // Global document frequency gives the canonical rare-first
    // element order (rarest elements have the shortest posting
    // lists, so they are the cheapest to index). Ties break on the
    // element itself so the order is total and deterministic.
    val freq = tok.groupBy("tk").agg(count(lit(1)).as("df"))
    val sizes = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))

    val byRarity = Window.partitionBy("doc_id").orderBy(col("df"), col("tk"))
    // prefix length p = n - ceil(θn) + 1, all in integer arithmetic:
    // ceil(θn) computed as a float (0.9·20 = 18.000…04 → ceil 19)
    // would silently DROP matching pairs.
    val prefix = tok
      .join(freq, "tk")
      .withColumn("pos", row_number().over(byRarity))
      .join(sizes, "doc_id")
      .filter(col("pos") <= col("n") - expr(
        s"(n * $thetaNum + $thetaDen - 1) DIV $thetaDen") + 1)

    // Candidate pairs: docs sharing ≥1 prefix element. Posting-list
    // pair expansion (sorted set → unordered i<j pairs) avoids a
    // hash self-join build over the index. The length filter
    // min/max ≥ θ (cross-multiplied) prunes before verification.
    val ds = col("ds")
    val candidates = prefix
      .groupBy("tk")
      .agg(sort_array(collect_set(col("doc_id"))).as("ds"))
      .filter(size(ds) >= 2)
      .select(explode(graft.functions.OrderedPairs(prefix.sparkSession, ds)).as("p"))
      .select(col("p.a").as("a_id"), col("p.b").as("b_id"))
      .distinct()

    // Exact verification on the candidate sliver only: fetch both
    // full element sets, intersect, cross-multiplied Jaccard test
    // shared/(na+nb-shared) ≥ θ  ⇔  shared·(θ_den+θ_num) ≥ θ_num·(na+nb).
    val toks = tok.groupBy("doc_id").agg(collect_set(col("tk")).as("toks"), count(lit(1)).as("n"))
    val shared = size(array_intersect(col("a_toks"), col("b_toks"))).cast(LongType)
    candidates
      .join(toks.select(col("doc_id").as("a_id"), col("toks").as("a_toks"), col("n").as("na")), "a_id")
      .join(toks.select(col("doc_id").as("b_id"), col("toks").as("b_toks"), col("n").as("nb")), "b_id")
      .filter(col("na") * thetaDen >= col("nb") * thetaNum &&
        col("nb") * thetaDen >= col("na") * thetaNum)
      .select(col("a_id"), col("b_id"), shared.as("shared"), col("na"), col("nb"))
      .filter(col("shared") * (thetaDen + thetaNum) >= (col("na") + col("nb")) * thetaNum)
      .select(col("a_id"), col("b_id"), col("shared"),
        (col("shared").cast("double") / (col("na") + col("nb") - col("shared"))).as("jaccard"))
  }
}
