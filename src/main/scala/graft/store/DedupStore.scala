package graft.store

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.dedup.BloomDedup

/** Incrementally-admitted deduplicated corpus: each
  * `admit(batchId, batch)` appends only documents whose `keyCol` was
  * never seen before — across batches and within the batch — with
  * crash-safe exactly-once semantics.
  *
  * State is three datasets under ONE table directory installed by a
  * single atomic rename ([[TableStore.swapWriteParts]], the same
  * commit primitive as [[AggTable]]):
  *   - `docs`   — the admitted corpus;
  *   - `bloom`  — a serialized bloom filter over every admitted key,
  *     MERGED incrementally (OR of filters = filter of the union), so
  *     membership of the whole corpus is testable without scanning it;
  *   - `ledger` — applied batch ids (replays are no-ops).
  *
  * At 100 TB the bloom filter is what keeps admission O(batch): a
  * batch row that the filter rejects is DEFINITELY new and never joins
  * the corpus; only possible members take the exact verify anti-join
  * ([[BloomDedup]]). The filter is sized once (`expectedItems`) — as
  * the corpus approaches that size the fpp degrades gracefully and
  * only the verify-join fraction grows, never correctness.
  *
  * The streaming form is `foreachBatch` over this method with the
  * engine's replay-stable batch ids, exactly like
  * [[graft.streaming.EventStreams.maintainAggregate]].
  */
final class DedupStore(
    store: TableStore,
    table: String,
    keyCol: String,
    expectedItems: Long = 10000000L) {

  private val docsPart = s"$table/docs"
  private val bloomPart = s"$table/bloom"
  private val ledgerPart = s"$table/ledger"

  def corpus: Option[DataFrame] = store.read(docsPart)

  // Driver-side mirrors of the persisted CONTROL state — the applied
  // batch ids and the merged bloom bits — lazily seeded from the
  // store on first use. The store stays the crash-safe source of
  // truth (both still land in every atomic swap; a fresh instance
  // re-reads them); the mirrors remove a ledger-scan job and a bloom
  // head() job from every admit. Both are tiny by construction (the
  // ledger is O(batches) ids; the filter is already merged on the
  // driver). Contract: one instance is the sole writer of its table
  // — the TableStore schema-catalog contract this store already
  // lives under.
  private var appliedMemo: Option[scala.collection.mutable.Set[String]] = None
  private var bloomMemo: Option[Option[Array[Byte]]] = None

  private def appliedIds: scala.collection.mutable.Set[String] =
    appliedMemo.getOrElse {
      val s = scala.collection.mutable.Set.empty[String]
      // bounded-collect: O(batches) ids — the ledger's documented size
      store.read(ledgerPart).foreach(
        _.select("batch_id").collect().foreach(r => s += r.getString(0)))
      appliedMemo = Some(s)
      s
    }

  // NULL bloom cell = "no keys admitted yet" (an empty corpus after a
  // fully-duplicate or empty first batch) — flattened to None so every
  // consumer treats it as filter-absent
  private def bloomBytes: Option[Array[Byte]] =
    bloomMemo.getOrElse {
      val b = store.read(bloomPart)
        .flatMap(df => Option(df.head().getAs[Array[Byte]]("bloom")))
      bloomMemo = Some(b)
      b
    }

  /** Admit one batch; returns the number of documents actually added
    * (0 on a replayed batch id).
    */
  def admit(batchId: String, batch: DataFrame): Long = {
    val spark = batch.sparkSession
    import spark.implicits._
    if (appliedIds.contains(batchId)) return 0L

    // batch-internal exact dedup: lowest-ordered row per key wins
    val cols = batch.columns
    val internal = batch.withColumn("__rn",
        row_number().over(Window.partitionBy(keyCol).orderBy(cols.map(col): _*)))
      .filter(col("__rn") === 1).drop("__rn")

    // vs corpus: bloom prefilter (stored filter, no corpus scan) +
    // exact verify join for possible members only
    val fresh = (corpus, bloomBytes) match {
      case (Some(c), Some(bits)) =>
        val mc = BloomDedup.mightContain(bits, Seq(keyCol))
        internal.filter(!mc).unionByName(
          internal.filter(mc)
            .join(c.select(keyCol).dropDuplicates(keyCol), Seq(keyCol), "left_anti"))
      case _ => internal
    }
    val freshMat = fresh.localCheckpoint()
    // ONE aggregate job for the admit count AND the batch filter
    // (they were two full passes). An empty batch yields no filter:
    // BloomFilterAggregate over zero rows is NULL, which would poison
    // every later merge (found by DedupStorePropertiesSpec).
    val (added, batchBits) =
      BloomDedup.buildFilterAndCount(freshMat, Seq(keyCol), expectedItems)

    // fold the batch filter into the stored one (OR-merge) — the only
    // driver-side state is the filter itself.
    val mergedBits = (bloomBytes, batchBits) match {
      case (Some(old), Some(bits)) =>
        val f = BloomFilter.readFrom(old)
        f.mergeInPlace(BloomFilter.readFrom(bits))
        val out = new ByteArrayOutputStream()
        f.writeTo(out)
        out.toByteArray
      case (Some(old), None) => old
      case (None, Some(bits)) => bits
      // nothing admitted yet at all: keep the NULL "no filter" cell —
      // only aggregate-built filters are ever stored, so merges never
      // see a driver-built filter with an incompatible bit size
      case (None, None) => null
    }

    // No pre-swap materialization needed: swapWriteParts writes every
    // part into `<table>__tmp` BEFORE the one directory rename, so
    // these plans still read the live table files while writing —
    // the old localCheckpoints here were an extra materialization
    // pass per admit. (applyCdc keeps its checkpoint: it performs TWO
    // swaps, and the second plan reads files the first swap removed.)
    val newDocs = corpus.fold(freshMat)(_.unionByName(freshMat))
    // the ledger is O(batches) rows forever — one partition, always;
    // rebuilt from the driver mirror (sorted for determinism), no
    // read-union pass
    val newLedger = (appliedIds.toSeq :+ batchId).sorted.toDF("batch_id")
      .coalesce(1)
    store.swapWriteParts(table, Seq(
      "docs" -> newDocs,
      "bloom" -> Seq(Tuple1(mergedBits)).toDF("bloom"),
      "ledger" -> newLedger))
    appliedIds += batchId
    bloomMemo = Some(Option(mergedBits))
    added
  }
}
