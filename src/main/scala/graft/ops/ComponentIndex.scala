package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.Engine
import graft.meta.Transforms

/** PERSISTENT dedup component assignment — the `(doc_id, component)`
  * frame [[Dedup.connectedComponents]] produces, materialized as a Graft
  * table and maintained INCREMENTALLY: each ingest batch's candidate
  * edges fold in through [[Dedup.incrementalComponents]] and the table
  * is updated by one MERGE-style row-delta commit over exactly the
  * affected docs. A 100 TB corpus never re-runs global label propagation
  * after bootstrap — the per-batch cost is two passes over this table
  * (one pruned) plus a batch-bounded contracted-graph clustering.
  *
  * Lifecycle mirrors [[NearDupIndex]] (the two compose: `NearDupIndex
  * .admit` gates a batch and its collision pairs are exactly the new
  * edges this index folds): [[create]] once, [[bootstrap]] from the
  * standing corpus' candidate pairs, then per batch [[fold]].
  *
  * Storage is SPARSE: only non-trivial memberships (`doc_id !=
  * component`) are stored — singleton docs are implicit, so the table
  * holds only duplicate docs (typically a small fraction of the corpus).
  * Labels can only DECREASE under the min-id invariant, so a stored row
  * never becomes trivial and sparseness is maintained by filtering
  * inserts alone.
  *
  * Scale shape: the table is `bucket[nBuckets](component)`-partitioned,
  * so [[fold]]'s relabel pass — the one that rewrites WHOLE components —
  * prunes to the merged-away labels' buckets (a batch merges a handful
  * of components, so this reads a handful of buckets, not the corpus
  * assignment). The endpoint-resolution pass is one scan of the table
  * with the batch's id set pushed down, emitting batch-bounded rows.
  * The update commit is merge-on-read ([[Engine.upsert]]): an equality
  * delete on `doc_id` plus the delta rows, no data-file rewrite.
  */
final class ComponentIndex(
    val engine: Engine,
    val ref: String,
    val nBuckets: Int = 32) {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("component", LongType, nullable = false)))

  /** Create the (empty) assignment table, bucket-partitioned on the
    * RELABEL key (see class doc for why `component`, not `doc_id`). */
  def create(): Unit =
    engine.createTable(ref, schema, Seq(s"bucket[$nBuckets](component)"))

  /** Seed the assignment from the standing corpus' candidate pairs —
    * the ONLY call that runs global connected components. A pair-free
    * corpus (every doc a singleton) seeds nothing; [[fold]] works off
    * the empty table. */
  def bootstrap(pairs: DataFrame): Unit = {
    val rows = Dedup.connectedComponents(pairs)
      .filter(col("doc_id") =!= col("component")).localCheckpoint()
    if (!rows.isEmpty) engine.append(ref, rows)
    ()
  }

  private def emptyStore: DataFrame =
    engine.spark.createDataFrame(new java.util.ArrayList[Row](), schema)

  /** The table's live rows off an already-pinned load — empty-safe (a
    * fresh or fully-singleton index has no snapshot or no files). */
  private def storeOf(t: graft.meta.IcebergTable): DataFrame = {
    if (t.metadata.currentSnapshotId.isEmpty) return emptyStore
    val paths = t.files().map(e => t.resolvePath(e.filePath))
    if (paths.isEmpty) emptyStore
    else ScanPlanner.readFiles(engine.spark, t, paths)
  }

  /** The standing sparse assignment (non-trivial memberships only). */
  def assignments: DataFrame = storeOf(engine.load(ref))

  /** The corpus-dedup DROP list, for free — VALID ONLY when every doc
    * in the ledger is corpus-resident (bootstrap/fold over edges among
    * kept docs): under the sparse convention every stored row is a doc
    * that is NOT its component's min-id survivor, i.e. exactly what the
    * keep-min rule drops. No join, no recompute: one projection.
    *
    * NOT valid for a gate-composed ledger
    * ([[NearDupIndex.admitStream]]'s `components`): there REJECTED docs
    * join the ledger without ever entering the corpus, and a rejected
    * doc with the smallest id becomes the component label — its
    * corpus-resident dup lands on this list and dropping it would
    * remove the only retained copy. A gate ledger is dup PROVENANCE;
    * derive a corpus drop list from it by intersecting with the corpus
    * and keeping the min CORPUS member per component instead. */
  def dropList: DataFrame = assignments.select("doc_id")

  /** Paths of the files a relabel of `labels`' components must read:
    * the labels' buckets prune the files relation. The labels are
    * driver-known longs, so their bucket values compute DRIVER-SIDE
    * ([[Transforms.literal]], the partition-prune twin of the column
    * transform) — no Spark job just to hash a handful of longs. Files
    * with no recorded bucket value survive conservatively, and an
    * unmappable label disables the prune rather than guessing. */
  def relabelPaths(labels: Seq[Long]): Seq[String] =
    relabelPaths(labels, engine.load(ref))

  private def relabelPaths(
      labels: Seq[Long], t: graft.meta.IcebergTable): Seq[String] = {
    if (t.metadata.currentSnapshotId.isEmpty) return Seq.empty
    val files = graft.rel.MetaRelations.files(engine.spark, t, None)
    val keep = BucketPrune.bucketCount(t, "component") match {
      case None => files
      case Some(n) =>
        val lits = labels.map(l =>
          Transforms.literal(s"bucket[$n]", l.toString, "long"))
        if (lits.exists(_.isEmpty)) files
        else {
          val buckets = lits.flatten.distinct
          val pv = col("partition")(Transforms.fieldName("component", s"bucket[$n]"))
          files.filter(pv.isNull || pv.isin(buckets: _*))
        }
    }
    keep.select("file_path").collect()
      .map(r => t.resolvePath(r.getString(0))).toIndexedSeq
  }

  /** The assignment restricted to the files `labels`' relabel can touch
    * — a bucket-pruned scan with merge-on-read deletes still applied. */
  private def relabelRows(
      labels: Seq[Long], t: graft.meta.IcebergTable): DataFrame = {
    val paths = relabelPaths(labels, t)
    if (paths.isEmpty)
      engine.spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    else ScanPlanner.readFiles(engine.spark, t, paths)
  }

  /** [[relabelRows]] for a DataFrame label set (`doc_id` column) — the
    * corpus-scale twin: the labels' bucket census runs DISTRIBUTED
    * through the column transform ([[Transforms.column]], the same
    * Spark-side hash the probe prune uses) and only the ≤ nBuckets
    * distinct bucket ints come back to the driver, so a retire set of
    * millions never materializes as a driver literal just to decide
    * which files to read. */
  private def relabelRowsDf(
      labels: DataFrame, t: graft.meta.IcebergTable): DataFrame = {
    if (t.metadata.currentSnapshotId.isEmpty)
      return engine.spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    val files = graft.rel.MetaRelations.files(engine.spark, t, None)
    val keep = BucketPrune.bucketCount(t, "component") match {
      case None => files
      case Some(n) =>
        val buckets = labels
          .select(Transforms.column(s"bucket[$n]", col("doc_id"), "long").as("b"))
          .distinct().collect().map(_.getInt(0).toString).toSeq
        val pv = col("partition")(Transforms.fieldName("component", s"bucket[$n]"))
        files.filter(pv.isNull || pv.isin(buckets: _*))
    }
    val paths = keep.select("file_path").collect()
      .map(r => t.resolvePath(r.getString(0))).toIndexedSeq
    if (paths.isEmpty)
      engine.spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    else ScanPlanner.readFiles(engine.spark, t, paths)
  }

  /** Fold one batch's candidate edges into the standing assignment:
    * compute the delta ([[Dedup.incrementalComponents]], sparse
    * convention, relabel served from the bucket-pruned read), commit the
    * non-trivial delta rows as ONE merge-on-read upsert keyed on
    * `doc_id`, and return the FULL delta (trivial rows included — the
    * caller-facing "what changed" view). An empty delta commits
    * nothing. CAS-guarded against concurrent folds: the commit carries
    * the pinned snapshot id, so a racing fold surfaces as
    * [[graft.meta.CommitConflictException]] (rerun; it picks up the
    * winner's rows) instead of silently erasing the winner's merges. */
  def fold(newEdges: DataFrame): DataFrame = {
    // ONE load pins the whole fold: resolution scan and pruned relabel
    // read — and the commit below is CAS-CONDITIONAL on that same
    // snapshot still being current. The delta was DERIVED from the
    // pinned store, so a concurrent fold landing in between would be
    // silently un-merged by an unconditional retry-rebase (this fold's
    // doc_id equality delete would erase the other's fresher rows);
    // instead the race surfaces as CommitConflictException — rerun the
    // fold, it picks up the other's rows. (A fresh, snapshot-less table
    // has no id to pin; the first concurrent folds of an EMPTY ledger
    // are the one window this cannot guard.)
    val t = engine.load(ref)
    val store = storeOf(t)
    val delta = Dedup.incrementalComponents(store, newEdges,
      sparseAssign = true,
      relabelSource = Some(labels => relabelRows(labels, t)))
      .localCheckpoint()
    val upserts = delta.filter(col("doc_id") =!= col("component"))
    if (!upserts.isEmpty) engine.upsert(ref, upserts, Seq("doc_id"),
      expectedCurrentSnapshotId = t.metadata.currentSnapshotId)
    delta
  }

  /** [[fold]] with a bounded reload-and-rerun on CAS conflict: a racing
    * fold/retire that lands first surfaces as
    * [[graft.meta.CommitConflictException]]; the rerun re-pins the table
    * (picking up the winner's rows) and recomputes the delta, so both
    * edge sets land and the final ledger equals the from-scratch closure
    * over their union (spec-pinned with two concurrent folds). The
    * ledger-side twin of [[graft.meta.TableWriter]]'s append
    * `retryOnConflict` — retried HERE, not inside the commit, because
    * the DELTA itself must be re-derived from the fresh snapshot (a
    * commit-level rebase would silently erase the winner's merges, the
    * exact failure the CAS guard exists to surface). */
  def foldWithRetry(newEdges: DataFrame, maxAttempts: Int = 7): DataFrame =
    ComponentIndex.retryOnConflict(maxAttempts)(fold(newEdges))

  /** [[retire]]'s conflict-retrying twin of [[foldWithRetry]]: the
    * affected-component surgery re-derives from the fresh snapshot on
    * each attempt. */
  def retireWithRetry(retired: DataFrame,
      pairsAmong: DataFrame => DataFrame, inMaxIds: Int = 1000,
      maxAttempts: Int = 7): DataFrame =
    ComponentIndex.retryOnConflict(maxAttempts)(
      retire(retired, pairsAmong, inMaxIds))

  /** RETIRE docs from the ledger (corpus deletion / right-to-be-
    * forgotten): removing a doc removes its similarity EDGES, so the
    * component it sat in can SPLIT — the remaining members must be
    * re-clustered over their residual candidate pairs, not merely have
    * the retired rows dropped. Only the AFFECTED components pay:
    *
    *   1. retired docs' own rows resolve their components (one
    *      pushed-filter scan); retired ids that are themselves LABELS
    *      are found by the bucket-pruned relabel read (their own rows
    *      are implicit, their members' rows are not);
    *   2. every affected component's members read off the SAME pruned
    *      read; the remaining-member set (minus retired) goes to
    *      `pairsAmong` — supply residual candidate pairs among those
    *      docs (e.g. [[Dedup.bandCollisionPairs]] over a
    *      [[NearDupIndex]]'s signatures — after retiring them there
    *      too, or restricted to remaining ids as this method does
    *      defensively);
    *   3. [[Dedup.connectedComponents]] re-clusters the residual graph
    *      (affected-size, not corpus-size) — splits fall out naturally,
    *      min-id labels are re-derived from scratch;
    *   4. ONE CAS-guarded row-delta commit deletes ALL stored rows of
    *      affected components and inserts the re-clustered non-trivial
    *      rows (docs that became singletons simply vanish — sparse).
    *
    * Soundness: deleting docs only removes edges, so components can
    * only split WITHIN old boundaries — re-clustering affected
    * components over their residual pairs reproduces exactly the
    * from-scratch closure over the surviving corpus (spec-pinned).
    * Returns the re-clustered assignment of the remaining affected
    * members (trivial rows included); unaffected components never
    * appear and never shuffle. */
  def retire(retired: Seq[Long],
      pairsAmong: DataFrame => DataFrame): DataFrame = {
    val s2 = engine.spark
    import s2.implicits._
    retire(retired.toDF("doc_id"), pairsAmong)
  }

  /** [[retire]] with the retired ids as a DataFrame (`doc_id` column) —
    * the corpus-scale form. Sets at or under `inMaxIds` distinct ids
    * (one fused size-probe-and-collect job, the
    * [[Dedup.incrementalComponents]] `resolveInMaxIds` idiom) keep the
    * literal path: pushed-down `isin` predicates reach the parquet
    * readers and the relabel prune hashes a driver-known label list.
    * Above the threshold every retired-id filter switches to a
    * broadcast semi/anti-join and the relabel prune's bucket census
    * runs distributed ([[Transforms.column]]) — a compliance batch of
    * millions of ids never inflates a plan or the driver. Same final
    * table state either way (spec-pinned with the threshold forced to
    * 0). */
  def retire(retired: DataFrame, pairsAmong: DataFrame => DataFrame,
      inMaxIds: Int = 1000): DataFrame = {
    val rids = retired.select(col("doc_id")).distinct().localCheckpoint()
    retireImpl(rids, Dedup.literalIds(rids, inMaxIds), pairsAmong)
  }

  private def retireImpl(rids: DataFrame, lits: Option[IndexedSeq[Long]],
      pairsAmong: DataFrame => DataFrame): DataFrame = {
    val t = engine.load(ref)
    val store = storeOf(t)
    // join-tier hint ceiling: the explicit broadcast hints below are the
    // mass-deletion form, but a hint FORCES the broadcast regardless of
    // size — probe the checkpointed frame once (join path only: the
    // literal path never evaluates this) and drop the hint above the
    // ceiling, letting AQE pick the join
    lazy val ridsFit = Dedup.fitsBroadcast(rids)
    // components of retired MEMBER docs (their own stored rows): the
    // pushed-down literal reaches the parquet scan for bounded sets; a
    // corpus-scale set probes through a broadcast semi-join instead
    val retiredRows = (lits match {
      case Some(seq) => store.filter(col("doc_id").isin(seq: _*))
      case None => store.join(Dedup.hintIf(ridsFit)(rids),
        Seq("doc_id"), "left_semi")
    }).localCheckpoint()
    // all affected components' stored rows: members of those comps PLUS
    // rows labeled by a retired id (a retired LABEL's own row is
    // implicitly trivial — its members' rows are what the pruned read
    // finds). One bucket-pruned read covers both label sets.
    val affectedRows = (lits match {
      case Some(seq) =>
        val memberComps = retiredRows.select("component").distinct()
          .collect().map(_.getLong(0))
        val affectedLabels = (memberComps ++ seq).distinct.toIndexedSeq
        relabelRows(affectedLabels, t)
          .filter(col("component").isin(affectedLabels: _*))
      case None =>
        val labels = retiredRows.select(col("component").as("doc_id"))
          .union(rids).distinct().localCheckpoint()
        val labelsFit = Dedup.fitsBroadcast(labels)
        relabelRowsDf(labels, t)
          .join(Dedup.hintIf(labelsFit)(
              labels.select(col("doc_id").as("component"))),
            Seq("component"), "left_semi")
    }).localCheckpoint()
    // remaining members: stored members plus the (implicit) label docs
    // themselves, minus everything retired. (retiredRows ⊆ affectedRows
    // — both read off the same pinned table and memberComps ⊆
    // affectedLabels — so its labels are already covered here.)
    val remaining0 = affectedRows.select("doc_id")
      .union(affectedRows.select(col("component").as("doc_id")))
      .distinct()
    val remaining = (lits match {
      case Some(seq) => remaining0.filter(!col("doc_id").isin(seq: _*))
      case None => remaining0.join(Dedup.hintIf(ridsFit)(rids),
        Seq("doc_id"), "left_anti")
    }).localCheckpoint()
    // residual candidate pairs among the remaining members only —
    // restricted defensively so a generous provider cannot leak edges
    // to retired or unaffected docs (one ceiling probe covers both
    // projections of the checkpointed frame)
    val remFit = Dedup.fitsBroadcast(remaining)
    val residual = pairsAmong(remaining)
      .join(Dedup.hintIf(remFit)(
        remaining.select(col("doc_id").as("a_id"))), Seq("a_id"), "left_semi")
      .join(Dedup.hintIf(remFit)(
        remaining.select(col("doc_id").as("b_id"))), Seq("b_id"), "left_semi")
    val reclustered = Dedup.connectedComponents(residual).localCheckpoint()
    // ONE commit: drop every stored row of the affected components,
    // insert the re-clustered non-trivial memberships. Nothing stored
    // was affected (all retired docs were singletons) → no commit.
    if (!affectedRows.isEmpty) {
      val deleteKeys = affectedRows.select("doc_id")
      val inserts = reclustered.filter(col("doc_id") =!= col("component"))
      engine.rowDelta(ref, inserts, Seq("doc_id"), deleteKeys,
        expectedCurrentSnapshotId = t.metadata.currentSnapshotId)
    }
    // caller-facing outcome: the full post-retire assignment of the
    // remaining affected members (re-clustered singletons fall back to
    // themselves — CC only emits nodes with edges)
    remaining
      .join(reclustered.select(col("doc_id").as("rid"), col("component").as("rc")),
        col("doc_id") === col("rid"), "left")
      .select(col("doc_id"), coalesce(col("rc"), col("doc_id")).as("component"))
  }

  /** Fold per-batch small files back into one per bucket (the bucketed
    * layout is preserved by the rewrite). */
  def compact(smallBytes: Long = 32L * 1024 * 1024): Option[graft.meta.TableWriter.CommitResult] =
    engine.rewriteSmallFiles(ref, smallBytes = smallBytes)
}

object ComponentIndex {
  /** Bounded rerun on [[graft.meta.CommitConflictException]] — the whole
    * BODY re-executes (reload, re-derive, re-commit), never just the
    * commit. */
  private[ops] def retryOnConflict[A](maxAttempts: Int)(body: => A): A = {
    var attempt = 1
    while (true) {
      try return body
      catch {
        case e: graft.meta.CommitConflictException =>
          if (attempt >= maxAttempts) throw e
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
