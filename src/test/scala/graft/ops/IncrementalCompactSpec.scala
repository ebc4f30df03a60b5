package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.fixtures.FixtureWriter
import graft.meta.IcebergTable

/** Incremental compaction on a delete-carrying table: the candidate
  * partition rewrites merge-on-read (no resurrection), delete manifests
  * carry forward for untouched files, dangling deletes prune as a
  * metadata-only commit, and expiry reclaims the pruned parquet —
  * the full partial-rewrite maintenance cycle a 100 TB table runs
  * instead of a whole-table fold. */
class IncrementalCompactSpec extends SparkSpec {

  test("incremental rewrite + dangling-delete prune + expiry reclaim") {
    val wh = Files.createTempDirectory("graft-inc-wh").toString
    val tableDir = s"$wh/lab/cdc"
    FixtureWriter.writeDeletesTable(spark, tableDir)

    val t0 = IcebergTable.load(tableDir)
    val morBefore = ScanPlanner.readTable(spark, t0).count()
    assert(morBefore == 280L) // 303 - 21 pos - 2 eq
    assert(t0.deleteFiles().size == 3)

    // shard 0 holds two small files (cdc-000, cdc-002); shard 1 only one
    // → incremental candidates = shard 0 only
    val res = Compact.rewriteSmallFilesIncremental(spark, tableDir).get
    val t1 = IcebergTable.load(tableDir)
    val live1 = t1.files()
    assert(live1.exists(_.filePath == "data/cdc-001.parquet")) // untouched
    assert(!live1.exists(_.filePath == "data/cdc-000.parquet")) // rewritten
    assert(!live1.exists(_.filePath == "data/cdc-002.parquet"))

    // delete manifests carried: cdc-001's position deletes still apply,
    // and the merge-on-read row set is EXACTLY what it was
    assert(t1.deleteFiles().size == 3)
    val after = ScanPlanner.readTable(spark, t1)
    assert(after.count() == morBefore)
    // rows position-deleted from the REWRITTEN file stay gone (folded in)
    assert(after.filter(col("row_id") === 0L).count() == 0L)
    // rows position-deleted from the UNTOUCHED file stay hidden (carried)
    assert(after.filter(col("row_id") === 1000L).count() == 0L)
    // pre-compaction snapshot time-travels identically
    val preSnap = t1.metadata.snapshot(res.snapshotId).get.parentSnapshotId.get
    assert(ScanPlanner.readTable(spark, t1, Some(preSnap)).count() == morBefore)

    // cdc-000's position-delete file now references no live file → prune;
    // cdc-001's deletes and the equality delete (scoping cdc-001) stay
    val pruned = Maintenance.pruneDanglingDeletes(spark, tableDir)
    assert(pruned.contains(1))
    val t2 = IcebergTable.load(tableDir)
    assert(t2.deleteFiles().size == 2)
    assert(ScanPlanner.readTable(spark, t2).count() == morBefore)
    // idempotent: nothing left to prune
    assert(Maintenance.pruneDanglingDeletes(spark, tableDir).isEmpty)

    // expiry reclaims the pruned delete parquet from disk
    assert(Files.exists(Paths.get(tableDir, "data/cdc-delete-000.parquet")))
    Maintenance.expireSnapshots(tableDir, olderThanMs = Long.MaxValue)
    assert(!Files.exists(Paths.get(tableDir, "data/cdc-delete-000.parquet")))
    // live delete files survive expiry; reads unchanged
    assert(Files.exists(Paths.get(tableDir, "data/cdc-delete-001.parquet")))
    assert(ScanPlanner.readTable(spark, IcebergTable.load(tableDir)).count() == morBefore)
  }
}
