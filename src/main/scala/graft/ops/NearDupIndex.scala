package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.Engine
import graft.meta.Transforms

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
  * `nBands` rows per document, no text — and it is written
  * `bucket[nBuckets](band_sig)`-partitioned, so a probe PRUNES to the
  * files whose bucket collides with the batch's band keys instead of
  * scanning the whole index: at 100 TB the index is corpus-rows × nBands
  * rows, and a small ingest batch (≤ a few hundred band keys) touches
  * ~batchBuckets/nBuckets of its files. Each gate pass still touches NO
  * corpus documents. Signature parameters are pinned at construction: an
  * index probed with different (numPerm, rowsPerBand) than it was built
  * with would silently miss every collision. (The BUCKET count, by
  * contrast, is read back from the table's own partition spec at probe
  * time — pruning with a different N than the files were written under
  * would be silently unsound, so the constructor value is only used by
  * [[create]].)
  */
final class NearDupIndex(
    val engine: Engine,
    val ref: String,
    val numPerm: Int = 16,
    val rowsPerBand: Int = 4,
    val nBuckets: Int = 32) {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("band", IntegerType, nullable = false),
    StructField("band_sig", LongType, nullable = false)))

  /** Create the (empty) index table, bucket-partitioned on the probe key
    * so gate passes prune (see [[probePaths]]). */
  def create(): Unit =
    engine.createTable(ref, schema, Seq(s"bucket[$nBuckets](band_sig)"))

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

  /** Bucket count the index TABLE was built with, read from its own
    * partition spec — NOT the constructor: pruning with a different N
    * than the files were written under would silently miss collisions.
    * None = not bucket-partitioned on band_sig (or conflicting specs
    * after evolution) → probes fall back to the full scan. Soundness
    * rules shared with the component ledger: [[BucketPrune]]. */
  private def tableBucketCount(t: graft.meta.IcebergTable): Option[Int] =
    BucketPrune.bucketCount(t, "band_sig")

  /** Paths of the index files a probe for `batchSigs` must read: the
    * batch's distinct band-sig buckets (≤ nBuckets ints — a
    * metadata-scale collect) prune the files relation to colliding
    * buckets. Files with no recorded bucket value (written before the
    * table was bucketed) survive conservatively. */
  def probePaths(batchSigs: DataFrame): Seq[String] =
    probePaths(batchSigs, engine.load(ref))

  /** [[probePaths]] against an already-loaded table — the probe paths
    * (one `load` + metadata parse, a catalog round-trip on network
    * backends) reuse it instead of re-loading per helper. */
  private def probePaths(
      batchSigs: DataFrame, t: graft.meta.IcebergTable): Seq[String] = {
    if (t.metadata.currentSnapshotId.isEmpty) return Seq.empty
    val files = graft.rel.MetaRelations.files(engine.spark, t, None)
    val keep = tableBucketCount(t) match {
      case None => files
      case Some(n) =>
        val buckets = batchSigs
          .select(Transforms.column(s"bucket[$n]", col("band_sig"), "long").as("b"))
          .distinct().collect().map(_.getInt(0).toString).toSeq
        val pv = col("partition")(Transforms.fieldName("band_sig", s"bucket[$n]"))
        files.filter(pv.isNull || pv.isin(buckets: _*))
    }
    // metadata-scale collect: the surviving PATH LIST parameterizes the
    // scan, exactly like ScanPlanner.readTableWhere
    keep.select("file_path").collect()
      .map(r => t.resolvePath(r.getString(0))).toIndexedSeq
  }

  /** The index restricted to the files `batchSigs` can collide with —
    * a bucket-pruned scan with merge-on-read deletes still applied. */
  private def probeSignatures(batchSigs: DataFrame): DataFrame = {
    val t = engine.load(ref) // ONE load feeds both the prune and the scan
    val paths = probePaths(batchSigs, t)
    if (paths.isEmpty)
      engine.spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    else ScanPlanner.readFiles(engine.spark, t, paths)
  }

  /** Flag increment docs whose bands collide with the index: one row per
    * flagged doc `(doc_id, dup_of, n_bands)`; absent docs are clean.
    * The batch's signatures are materialized ONCE (they feed both the
    * bucket-prune census and the collision join), and the index side is
    * the bucket-pruned file subset, not the whole table. */
  def check(increment: DataFrame): DataFrame = {
    val batchSigs = Dedup.bandSignatures(increment, numPerm, rowsPerBand)
      .localCheckpoint()
    Dedup.bandCollisions(batchSigs, probeSignatures(batchSigs))
  }

  /** Gate one ingest batch: return the docs that do NOT collide with the
    * index, and append exactly those docs' band signatures (one commit)
    * so subsequent batches — and any live `nearDupStream` readers on the
    * table — see them.
    *
    * By default intra-batch near-duplicates are both admitted (the
    * gate's contract is "new vs standing corpus", matching
    * [[Dedup.incrementalNearDup]]). `dedupWithinBatch = true` runs the
    * batch-local pass first: docs sharing a band within the batch form a
    * collision graph, [[Dedup.connectedComponents]] keeps the min-id doc
    * of every component (the same keep rule as the corpus dedup
    * pipeline), and only the kept docs face the index gate — so the
    * very first post-bootstrap batch can't seed the index with its own
    * internal duplicates. The intra-batch pair join is band-bucketed
    * (equi-join on `(band, band_sig)`), never all-pairs. */
  def admit(
      increment: DataFrame, dedupWithinBatch: Boolean = false): DataFrame = {
    val batch =
      if (!dedupWithinBatch) increment
      else {
        val sigs = Dedup.bandSignatures(increment, numPerm, rowsPerBand)
          .localCheckpoint()
        val pairs = sigs
          .select(col("doc_id").as("a_id"), col("band"), col("band_sig"))
          .join(sigs.select(col("doc_id").as("b_id"), col("band"), col("band_sig")),
            Seq("band", "band_sig"))
          .filter(col("a_id") < col("b_id"))
          .select("a_id", "b_id").distinct()
        val drop = Dedup.connectedComponents(pairs)
          .filter(col("doc_id") =!= col("component")).select("doc_id")
        increment.join(drop, Seq("doc_id"), "left_anti")
      }
    val flagged = check(batch).select(col("doc_id"))
    val survivors = batch.join(flagged, Seq("doc_id"), "left_anti")
      // one evaluation feeds both the signature append and the caller
      .localCheckpoint()
    engine.append(ref, Dedup.bandSignatures(survivors, numPerm, rowsPerBand)
      .select(col("doc_id"), col("band"), col("band_sig")))
    survivors
  }

  /** Maintenance: every [[admit]] commits one small file per colliding
    * bucket, so the file count grows with batch count — fold each
    * bucket's small files back into one. The rewrite re-stages through
    * the table's partition spec, so the bucketed layout (and probe
    * pruning) is preserved. Run periodically, like any ingest table's
    * compaction. None = nothing small enough to fold. */
  def compact(smallBytes: Long = 32L * 1024 * 1024): Option[graft.meta.TableWriter.CommitResult] =
    engine.rewriteSmallFiles(ref, smallBytes = smallBytes)

  /** RETIRE docs from the index (corpus deletion): one pure keyed
    * equality-delete commit drops every band row of the retired ids —
    * without it, future gate probes still collide with the GHOSTS of
    * deleted documents and wrongly reject fresh copies. Merge-on-read
    * (no data rewrite); [[compact]] folds the tombstones later. The
    * ledger twin is [[ComponentIndex.retire]] — retire the signatures
    * FIRST so its `pairsAmong` provider no longer sees retired docs. */
  def retire(retired: Seq[Long]): graft.meta.TableWriter.CommitResult = {
    val spark2 = engine.spark
    import spark2.implicits._
    retire(retired.toDF("doc_id"))
  }

  /** [[retire]] with the retired ids as a DataFrame (`doc_id` column) —
    * the corpus-scale form: a compliance batch of millions of ids never
    * becomes a driver-side literal (the equality-delete keys distribute
    * through the commit like any other frame). */
  def retire(retired: DataFrame): graft.meta.TableWriter.CommitResult = {
    val empty = engine.spark.createDataFrame(
      new java.util.ArrayList[Row](), schema)
    engine.rowDelta(ref, empty, Seq("doc_id"), retired.select("doc_id"))
  }

  /** Residual candidate pairs among `ids` — the canonical `pairsAmong`
    * provider for [[ComponentIndex.retire]] over a CORPUS ledger: the
    * docs' OWN band signatures, read back from this index through the
    * file-stats POINT-SET prune ([[ScanPlanner.readTableWhereInSet]] —
    * per-admit files carry tight doc_id bounds, so a file is opened only
    * if it may hold one of THESE ids; a span prune over a scattered
    * retire set would degrade to reading nearly every live file between
    * min and max), self-collide within band buckets. `ids` is
    * affected-component-bounded (the retire contract), so the driver
    * collect is safe. Call AFTER [[retire]]-ing the deleted docs here,
    * or their ghosts re-enter the residual graph.
    *
    * CONTRACT CAVEAT: this provider only sees docs whose signatures the
    * index HOLDS — admitted/corpus docs. A GATE-COMPOSED ledger
    * ([[admitStream]]'s `components`) also records REJECTED docs, whose
    * signatures were never appended; a retire touching their component
    * would degrade them to singletons (their provenance edges are
    * invisible here). For such ledgers derive the residual pairs from
    * the raw document store instead ([[Dedup.pairsFromDocs]]). */
  def pairsAmong(ids: DataFrame): DataFrame = pairsAmong(ids, 1000)

  /** [[pairsAmong]] with an explicit literal-vs-join threshold: at or
    * under `inMaxIds` distinct ids the read point-set-prunes through
    * driver-known bounds; above it — a mass deletion hitting a giant
    * dup component — the member set never comes to the driver at all:
    * the signatures semi-join against the id frame broadcast-side
    * (full index scan, the honest at-scale form — bounds pruning needs
    * driver-known points). */
  def pairsAmong(ids: DataFrame, inMaxIds: Int): DataFrame = {
    val rids = ids.select(col("doc_id")).distinct().localCheckpoint()
    val sigs = (Dedup.literalIds(rids, inMaxIds) match {
      case Some(seq) if seq.isEmpty =>
        engine.spark.createDataFrame(new java.util.ArrayList[Row](), schema)
      case Some(seq) =>
        ScanPlanner.readTableWhereInSet(engine.spark, engine.load(ref),
          "doc_id", seq)
      case None =>
        // hint only under the ceiling — a nation-scale member set must
        // not be FORCED through the driver as a broadcast
        engine.readTable(ref)
          .join(Dedup.hintIf(Dedup.fitsBroadcast(rids))(rids),
            Seq("doc_id"), "left_semi")
    }).localCheckpoint()
    Dedup.bandCollisionPairs(sigs, sigs)
      .filter(col("doc_id") =!= col("corpus_doc_id"))
      .select(col("doc_id").as("a_id"), col("corpus_doc_id").as("b_id"))
  }

  /** STREAMING gate: run every micro-batch of `docs` through the
    * [[admit]] logic — bucket-pruned probe against the standing index,
    * survivors' band signatures appended in one commit, survivors handed
    * to `onSurvivors` (write them to the corpus table, a sink, etc.).
    *
    * Versus `EventStreams.nearDupStream` (a stream-static band join that
    * re-scans the WHOLE index every micro-batch and only FLAGS
    * collisions), this is the closed-loop form: each batch's probe reads
    * only the index files its band keys collide with, and admitted docs
    * become part of the index for the very next batch.
    *
    * Redelivery-safe under foreachBatch's at-least-once (doc_ids must be
    * stable across redelivery): a doc whose FULL band-signature set is
    * already in the index under its own id was admitted by a previous
    * delivery of this batch — it passes through to `onSurvivors` again
    * (the sink sees at-least-once, never loses a survivor) and appends
    * nothing. Matching on (id, band, band_sig) rather than id presence
    * means a NEW doc that merely reuses an indexed id (a source restarting
    * its id sequence) is NOT mistaken for a redelivery: its signatures
    * differ, so it is gated against the index like any other doc. The
    * already-indexed check probes the same PRUNED slice as the collision
    * join — a doc's own signatures live in its own band buckets — so no
    * full index scan enters the loop.
    *
    * `components`, when given, maintains the persisted dup-cluster
    * assignment alongside the gate: each micro-batch's COMPLETE
    * collision pair set ([[Dedup.bandCollisionPairs]] — not the
    * min-aggregated `dup_of`, so a doc bridging two standing components
    * merges them) folds into the [[ComponentIndex]]
    * ([[Dedup.incrementalComponents]] under the hood), so rejected docs
    * keep a provenance row in the assignment ledger and transitive dup
    * chains close ACROSS micro-batches. Redelivery-safe for free: a
    * redelivered batch's pairs are already absorbed and the fold is an
    * idempotent no-op (no commit). Collision-free batches never load
    * the component table at all. NOTE the ledger is PROVENANCE here,
    * not a corpus drop list: rejected docs never enter the corpus, so a
    * cluster's min id can be a doc that exists only in the ledger
    * ([[ComponentIndex.dropList]] documents the distinction).
    *
    * INTRA-micro-batch edges: two mutual near-dups arriving in the SAME
    * micro-batch are both ADMITTED (the gate's contract is "new vs
    * standing index", unchanged) — but without their edge the ledger
    * would permanently diverge from a signature-level from-scratch
    * closure (neither doc ever collides with the index afterwards;
    * each is already IN it). `intraBatchEdges` (default true) therefore
    * folds the batch's internal collision pairs as well — fold-only,
    * never flag — restricted to docs NOT already indexed, so a
    * redelivered batch contributes nothing and idempotence holds.
    * Set it false to record strictly what the gate REJECTED on. */
  def admitStream(
      docs: DataFrame,
      checkpointDir: String,
      components: Option[ComponentIndex] = None,
      intraBatchEdges: Boolean = true)(
      onSurvivors: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val batchSigs = Dedup.bandSignatures(batch, numPerm, rowsPerBand)
          .localCheckpoint()
        // the bucket-pruned index slice, materialized once — feeds the
        // collision join AND both already-indexed checks
        val probed = probeSignatures(batchSigs).localCheckpoint()
        // redelivered iff EVERY band row matches the index under the
        // doc's own id — id presence alone would mistake an id-reusing
        // new doc for a redelivery (and silently skip gating it)
        val nBands = numPerm / rowsPerBand
        val selfIndexed = batchSigs
          .join(probed, Seq("doc_id", "band", "band_sig"), "left_semi")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
          .filter(col("n") === nBands).select(col("doc_id"))
          .localCheckpoint()
        // with a component ledger attached, the fold needs the FULL
        // pair structure (a doc bridging two components must merge
        // them — bandCollisions' min-aggregated dup_of loses that
        // edge), and it feeds both the gate and the fold — materialize
        // once and derive the flag set from it. Without a ledger, keep
        // the original lazy aggregated single-consumer shape.
        val collisionPairs = components.map { _ =>
          Dedup.bandCollisionPairs(batchSigs, probed)
            .join(selfIndexed, Seq("doc_id"), "left_anti") // redelivery ≠ dup
            .localCheckpoint()
        }
        val flagged = collisionPairs match {
          case Some(pairs) => pairs.select(col("doc_id")).distinct()
          case None => Dedup.bandCollisions(batchSigs, probed)
            .join(selfIndexed, Seq("doc_id"), "left_anti") // redelivery ≠ dup
            .select(col("doc_id"))
        }
        val survivors = batch.join(flagged, Seq("doc_id"), "left_anti")
          .localCheckpoint()
        val fresh = survivors.join(selfIndexed, Seq("doc_id"), "left_anti")
          .localCheckpoint()
        // dup-cluster ledger: fold this batch's COMPLETE collision pair
        // set into the persisted assignment (idempotent across
        // redeliveries; skipped entirely — no table load — when the
        // batch had no collisions). Intra-batch edges join the FOLD
        // only (both endpoints were admitted — the gate flag set above
        // is untouched); both-endpoint selfIndexed restriction keeps
        // redelivered batches contributing nothing. The fold runs
        // BEFORE the signature append and with conflict retry:
        //   - ORDER: intra-edge suppression keys on selfIndexed, which
        //     the append establishes — a crash between an append-first
        //     commit and the fold would lose the admitted-admitted
        //     intra edges FOREVER (the redelivered batch suppresses
        //     them). Fold-first is safe in both crash orders: an
        //     unfolded redelivery re-derives everything, a folded-but-
        //     unappended redelivery re-gates (not selfIndexed yet) and
        //     its re-fold is an absorbed no-op.
        //   - RETRY: a concurrent fold/retire on a SHARED ledger (the
        //     other gate, or Engine.forget) landing mid-fold surfaces
        //     as CommitConflictException; foldWithRetry re-derives from
        //     the fresh snapshot instead of killing the stream.
        components.zip(collisionPairs).foreach { case (comps, pairs) =>
          val intra =
            if (!intraBatchEdges) pairs.limit(0)
            else Dedup.bandCollisionPairs(batchSigs, batchSigs)
              .filter(col("doc_id") =!= col("corpus_doc_id"))
              .join(selfIndexed, Seq("doc_id"), "left_anti")
              .join(selfIndexed.select(col("doc_id").as("corpus_doc_id")),
                Seq("corpus_doc_id"), "left_anti")
          // ONE eager checkpoint: the emptiness probe, the fold's
          // several passes over the edge set, and any CAS retry reuse
          // the materialized frame instead of re-running the band
          // self-join per consumer
          val edges = pairs.unionByName(intra).localCheckpoint()
          if (!edges.isEmpty)
            comps.foldWithRetry(edges.select(col("doc_id").as("a_id"),
              col("corpus_doc_id").as("b_id")))
        }
        if (fresh.count() > 0)
          // the fresh docs' signatures are already materialized in
          // batchSigs — append from the checkpoint instead of paying a
          // second tokenize+hash pass over the batch text
          engine.append(ref,
            batchSigs.join(fresh.select("doc_id"), Seq("doc_id"), "left_semi")
              .select(col("doc_id"), col("band"), col("band_sig")))
        onSurvivors(survivors)
      }
      .start()
}
