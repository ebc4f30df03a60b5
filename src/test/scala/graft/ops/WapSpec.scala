package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.api.Engine
import graft.fixtures.FixtureWriter

/** Write-audit-publish (WAP): staged appends are invisible until
  * cherry-picked, publishable by fast-forward or metadata-only re-apply,
  * auditable through snapshot-pinned reads, and reclaimable by snapshot
  * expiration when the audit rejects them. */
class WapSpec extends SparkSpec {

  import spark.implicits._

  private def freshEngine(): Engine = {
    val dir = Files.createTempDirectory("graft-wap-wh").toString
    FixtureWriter.writeDemo(spark, dir)
    new Engine(spark, dir)
  }

  private def batch(ids: Long*): DataFrame =
    ids.map(i =>
      (i, s"Cust $i", "us-east", 10.0 + i, java.sql.Date.valueOf("2024-03-01"),
        java.sql.Timestamp.valueOf("2024-03-01 10:00:00")))
      .toDF("order_id", "customer_name", "region", "amount", "order_date", "created_at")

  test("a staged append is invisible to readers but auditable by snapshot id") {
    val e = freshEngine()
    val before = e.load("sales.orders").metadata
    val rowsBefore = e.readTable("sales.orders").count()

    val res = e.appendStaged("sales.orders", batch(900L, 901L), wapId = "audit-1")
    val after = e.load("sales.orders").metadata
    // snapshot exists in the log, tagged — but NO pointer moved
    assert(after.snapshots.size == before.snapshots.size + 1)
    assert(after.currentSnapshotId == before.currentSnapshotId)
    assert(after.refs.get("main").map(_.snapshotId) ==
      before.refs.get("main").map(_.snapshotId))
    assert(after.snapshot(res.snapshotId).get.summary("wap.id") == "audit-1")
    // readers of the table see nothing; the audit reads the pinned snapshot
    assert(e.readTable("sales.orders").count() == rowsBefore)
    assert(e.readTable("sales.orders", Some(res.snapshotId)).count() == rowsBefore + 2)
  }

  test("cherrypick fast-forwards when the base has not moved") {
    val e = freshEngine()
    val rowsBefore = e.readTable("sales.orders").count()
    val res = e.appendStaged("sales.orders", batch(910L), wapId = "audit-ff")

    val pub = e.cherrypick("sales.orders", res.snapshotId)
    assert(pub.fastForward)
    assert(pub.publishedSnapshotId == res.snapshotId)
    val md = e.load("sales.orders").metadata
    assert(md.currentSnapshotId.contains(res.snapshotId))
    assert(md.refs("main").snapshotId == res.snapshotId)
    assert(e.readTable("sales.orders").count() == rowsBefore + 1)
  }

  test("cherrypick re-applies onto a moved base without touching data files") {
    val e = freshEngine()
    val rowsBefore = e.readTable("sales.orders").count()
    val staged = e.appendStaged("sales.orders", batch(920L, 921L), wapId = "audit-ra")
    // an independent commit lands while the audit runs
    e.append("sales.orders", batch(950L))

    val stagedFiles = e.files("sales.orders", Some(staged.snapshotId))
      .select("file_path").as[String].collect().toSet

    val pub = e.publishWap("sales.orders", "audit-ra")
    assert(!pub.fastForward)
    assert(pub.publishedSnapshotId != staged.snapshotId)
    val md = e.load("sales.orders").metadata
    val snap = md.snapshot(pub.publishedSnapshotId).get
    assert(md.currentSnapshotId.contains(pub.publishedSnapshotId))
    assert(snap.summary("published-wap-id") == "audit-ra")
    assert(snap.summary("source-snapshot-id") == staged.snapshotId.toString)
    // both the interleaved append and the staged batch are live
    assert(e.readTable("sales.orders").count() == rowsBefore + 3)
    assert(e.readTable("sales.orders")
      .filter(col("order_id").isin(920L, 921L, 950L)).count() == 3)
    // metadata-only publish: the staged data files are live under their
    // ORIGINAL paths (no rewrite)
    val liveFiles = e.files("sales.orders").select("file_path").as[String]
      .collect().toSet
    val stagedOnly = stagedFiles -- e.files("sales.orders",
      Some(md.snapshot(staged.snapshotId).get.parentSnapshotId.get))
      .select("file_path").as[String].collect().toSet
    assert(stagedOnly.nonEmpty && stagedOnly.subsetOf(liveFiles))
  }

  test("publishing the same staged snapshot twice is refused (duplicate WAP commit)") {
    val e = freshEngine()
    val staged = e.appendStaged("sales.orders", batch(925L), wapId = "audit-dup")
    e.append("sales.orders", batch(955L)) // move the base → re-apply path
    e.cherrypick("sales.orders", staged.snapshotId)
    val rows = e.readTable("sales.orders").count()
    val err = intercept[IllegalArgumentException] {
      e.cherrypick("sales.orders", staged.snapshotId)
    }
    assert(err.getMessage.contains("duplicate WAP commit"))
    assert(e.readTable("sales.orders").count() == rows)
  }

  test("re-applied publish re-sequences: rows escape deletes committed during the audit") {
    val e = freshEngine()
    val staged = e.appendStaged("sales.orders", batch(970L), wapId = "audit-seq")
    // while the audit runs, an UPSERT on the same key commits an
    // equality delete at a NEWER sequence than the staged snapshot's
    e.upsert("sales.orders", batch(970L), Seq("order_id"))
    e.publishWap("sales.orders", "audit-seq")
    // the published row must carry the PUBLISH commit's sequence (newer
    // than the delete), so both the upserted and the published row live
    assert(e.readTable("sales.orders")
      .filter(col("order_id") === 970L).count() == 2)
    // and must stay alive after the unreferenced staged snapshot expires
    // (its sequence must not collapse to 0 under old equality deletes)
    e.expireSnapshots("sales.orders",
      olderThanMs = System.currentTimeMillis() + 1000L, retainLast = 1)
    assert(e.readTable("sales.orders")
      .filter(col("order_id") === 970L).count() == 2)
  }

  test("cherrypick refuses already-published snapshots and unknown wap ids") {
    val e = freshEngine()
    val cur = e.load("sales.orders").metadata.currentSnapshotId.get
    val err = intercept[IllegalArgumentException] { e.cherrypick("sales.orders", cur) }
    assert(err.getMessage.contains("already in the current line"))
    intercept[IllegalArgumentException] { e.cherrypick("sales.orders", 424242L) }
    intercept[IllegalArgumentException] { e.publishWap("sales.orders", "nope") }
  }

  test("a rejected staged snapshot is reclaimed by snapshot expiration") {
    val e = freshEngine()
    val tdir = e.tableDir("sales.orders")
    val staged = e.appendStaged("sales.orders", batch(930L), wapId = "audit-bad")
    // the audit fails (say, a quality gate rejects the batch): nothing to
    // do — the staged snapshot has no ref, so expiration reclaims it
    val stagedList = staged.snapshotId
    val res = e.expireSnapshots("sales.orders",
      olderThanMs = System.currentTimeMillis() + 1000L, retainLast = 1)
    assert(res.expiredSnapshots.contains(stagedList))
    assert(e.load("sales.orders").metadata.snapshot(stagedList).isEmpty)
    assert(e.readTable("sales.orders").filter(col("order_id") === 930L).count() == 0)
    // the published line is intact
    assert(e.readTable("sales.orders").count() > 0)
  }

  test("audit gate end-to-end: quality rules decide publish vs reject") {
    val e = freshEngine()
    val rowsBefore = e.readTable("sales.orders").count()
    // stage a batch, audit it with an engine predicate over the PINNED
    // snapshot (the reference's health-check shape applied pre-publish)
    val staged = e.appendStaged("sales.orders", batch(940L, 941L), wapId = "gate-1")
    val auditDf = e.readTable("sales.orders", Some(staged.snapshotId))
      .filter(col("order_id") >= 940L)
    val bad = auditDf.filter(col("amount") <= 0.0 || col("customer_name").isNull).count()
    if (bad == 0) e.publishWap("sales.orders", "gate-1")
    assert(e.readTable("sales.orders").count() == rowsBefore + 2)
  }

  test("staged append cannot target a branch") {
    val e = freshEngine()
    intercept[IllegalArgumentException] {
      graft.meta.TableWriter.append(spark, e.tableDir("sales.orders"),
        batch(960L), branch = Some("exp"), wapId = Some("w"))
    }
  }
}
