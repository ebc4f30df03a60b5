package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.Engine

/** PERSISTENT near-duplicate band index — the `(doc_id, band, band_sig)`
  * MinHash-LSH index materialized as a Graft table, so incremental and
  * streaming dedup gates probe a standing index instead of re-aggregating
  * corpus text on every call (the one thing incremental dedup exists to
  * avoid).
  *
  * Lifecycle: [[create]] once, [[bootstrap]] from the standing corpus,
  * then per ingest batch [[admit]] — flag collisions against the index,
  * return the clean survivors, and append exactly the survivors'
  * signatures in one table commit so the next batch sees them. The
  * streaming twin passes [[signatures]] as the static side of
  * `EventStreams.nearDupStream`.
  *
  * Scale shape: the index table carries three fixed-width columns —
  * `nBands` rows per document, no text — and probing it is a band-bucket
  * equi-join against the (small) ingest batch, so each gate pass reads
  * the index's parquet (metadata-pruned like any Graft table scan) and
  * touches NO corpus documents. Signature parameters are pinned at
  * construction: an index probed with different (numPerm, rowsPerBand)
  * than it was built with would silently miss every collision.
  */
final class NearDupIndex(
    val engine: Engine,
    val ref: String,
    val numPerm: Int = 16,
    val rowsPerBand: Int = 4) {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("band", IntegerType, nullable = false),
    StructField("band_sig", LongType, nullable = false)))

  /** Create the (empty) index table. */
  def create(): Unit = engine.createTable(ref, schema)

  /** Seed the index from the standing corpus — the ONLY call that
    * aggregates corpus text; everything after probes the table. */
  def bootstrap(corpus: DataFrame): Unit = {
    engine.append(ref, Dedup.bandSignatures(corpus, numPerm, rowsPerBand)
      .select(col("doc_id"), col("band"), col("band_sig")))
    ()
  }

  /** The standing index — a plain Graft-table scan (ids and 8-byte band
    * keys; no document text anywhere in this plan). */
  def signatures: DataFrame = engine.readTable(ref)

  /** Flag increment docs whose bands collide with the index: one row per
    * flagged doc `(doc_id, dup_of, n_bands)`; absent docs are clean. */
  def check(increment: DataFrame): DataFrame =
    Dedup.incrementalNearDupAgainstIndex(
      increment, signatures, numPerm, rowsPerBand)

  /** Gate one ingest batch: return the docs that do NOT collide with the
    * index, and append exactly those docs' band signatures (one commit)
    * so subsequent batches — and any live `nearDupStream` readers on the
    * table — see them. Intra-batch near-duplicates are both admitted
    * (the gate's contract is "new vs standing corpus", matching
    * [[Dedup.incrementalNearDup]]); run a batch-local pass first if
    * intra-batch dedup is wanted. */
  def admit(increment: DataFrame): DataFrame = {
    val flagged = check(increment).select(col("doc_id"))
    val survivors = increment.join(flagged, Seq("doc_id"), "left_anti")
      // one evaluation feeds both the signature append and the caller
      .localCheckpoint()
    engine.append(ref, Dedup.bandSignatures(survivors, numPerm, rowsPerBand)
      .select(col("doc_id"), col("band"), col("band_sig")))
    survivors
  }
}
