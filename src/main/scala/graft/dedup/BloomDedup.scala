package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter-accelerated batch-vs-corpus dedup.
  *
  * The exact way to find which batch rows are new is an anti-join
  * against the corpus keys — at 100 TB that shuffles the ENTIRE batch
  * even though almost all of it is new. A bloom filter over the corpus
  * keys (one aggregate pass, mergeable per partition, a few bits/key)
  * is broadcast into a scan-side filter on the batch: rows the filter
  * rejects are DEFINITELY new (bloom filters have no false negatives)
  * and skip the join entirely; only the ~(overlap + fpp·batch) sliver
  * that might match is verified exactly. The result is therefore
  * bit-identical to the plain anti-join — a false positive merely
  * costs one extra row through the verify join — which is how the
  * `q99_bloom_prefilter` gate can hash-match a plain NOT EXISTS
  * oracle. Same mechanism as Spark's own runtime bloom-filter join
  * pruning (InjectRuntimeFilter, pinned in RuntimeFilterSpec), exposed
  * as a reusable corpus-dedup primitive with the filter persisted
  * across batches ([[LshIndex]] is the near-dup analogue).
  *
  * The reference's insert-if-absent (`src/pipeline.py:133-176`) probes
  * the DB per record; this is its set-based, scan-friendly scale form.
  */
object BloomDedup {

  /** Serialized bloom filter over `xxhash64(keyCols)` of `corpus`.
    * Mergeable: OR of two filters = filter of the union, so it can be
    * maintained incrementally as batches are admitted.
    */
  def buildFilter(
      corpus: DataFrame,
      keyCols: Seq[String],
      expectedItems: Long,
      numBits: Long = 0L): Array[Byte] = {
    val key = GraftPlanBridge.expression(xxhash64(keyCols.map(col): _*))
    val agg =
      if (numBits > 0)
        new BloomFilterAggregate(key, Literal(expectedItems), Literal(numBits))
      else new BloomFilterAggregate(key, expectedItems)
    corpus
      .select(GraftPlanBridge.column(agg.toAggregateExpression()).as("bloom"))
      .head().getAs[Array[Byte]](0)
  }

  /** [[buildFilter]] fused with the row count in ONE aggregate job —
    * for callers (DedupStore.admit) that need both and were paying
    * two full passes. Returns (rows, filter); the filter is None when
    * the input is empty (BloomFilterAggregate over zero rows yields
    * NULL, which must never be merged into a stored filter).
    */
  def buildFilterAndCount(
      corpus: DataFrame,
      keyCols: Seq[String],
      expectedItems: Long,
      numBits: Long = 0L): (Long, Option[Array[Byte]]) = {
    val key = GraftPlanBridge.expression(xxhash64(keyCols.map(col): _*))
    val agg =
      if (numBits > 0)
        new BloomFilterAggregate(key, Literal(expectedItems), Literal(numBits))
      else new BloomFilterAggregate(key, expectedItems)
    val row = corpus
      .agg(count(lit(1)).as("n"),
        GraftPlanBridge.column(agg.toAggregateExpression()).as("bloom"))
      .head()
    val n = row.getLong(0)
    (n, if (n == 0L) None else Option(row.getAs[Array[Byte]](1)))
  }

  /** Membership test column: true iff `keyCols` MIGHT be in the
    * filter (false ⇒ definitely absent).
    */
  def mightContain(filter: Array[Byte], keyCols: Seq[String]): Column =
    GraftPlanBridge.column(new BloomFilterMightContain(
      Literal(filter, BinaryType),
      GraftPlanBridge.expression(xxhash64(keyCols.map(col): _*))))

  /** Rows of `batch` whose key tuple does not occur in `corpus` —
    * exact anti-join semantics, bloom-prefiltered so only possible
    * members reach the verify join.
    */
  def newRows(
      batch: DataFrame,
      corpus: DataFrame,
      keyCols: Seq[String],
      expectedItems: Long,
      numBits: Long = 0L): DataFrame = {
    val bloom = buildFilter(corpus, keyCols, expectedItems, numBits)
    val mc = mightContain(bloom, keyCols)
    val definitelyNew = batch.filter(!mc)
    val verified = batch.filter(mc)
      .join(corpus.select(keyCols.map(col): _*).dropDuplicates(keyCols),
        keyCols, "left_anti")
    definitelyNew.unionByName(verified)
  }
}
