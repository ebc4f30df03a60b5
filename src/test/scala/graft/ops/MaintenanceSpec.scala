package graft.ops

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.api.Engine
import graft.fixtures.FixtureWriter

/** Snapshot expiration, rollback, and orphan detection against a real
  * on-disk demo warehouse (round-5 maintenance trio). */
class MaintenanceSpec extends SparkSpec {

  import spark.implicits._

  private def freshWarehouse(): String = {
    val dir = Files.createTempDirectory("graft-maint-wh").toString
    FixtureWriter.writeDemo(spark, dir)
    dir
  }

  test("rollback moves the current pointer; later snapshots stay readable") {
    val wh = freshWarehouse()
    val e = new Engine(spark, wh)
    val md = e.load("sales.orders").metadata
    val snaps = md.snapshots.map(_.snapshotId)
    val preOverwrite = snaps(2) // 3rd append, before the overwrite
    val rowsAt2 = e.files("sales.orders", Some(preOverwrite))
      .agg(sum("record_count")).as[Long].head()

    e.rollback("sales.orders", preOverwrite)
    val after = e.load("sales.orders").metadata
    assert(after.currentSnapshotId.contains(preOverwrite))
    assert(after.snapshots.size == md.snapshots.size) // log untouched
    assert(e.files("sales.orders").agg(sum("record_count")).as[Long].head() == rowsAt2)
    // the overwrite snapshot is still addressable (roll-forward possible)
    assert(e.files("sales.orders", Some(snaps.last)).count() > 0)

    intercept[IllegalArgumentException] { e.rollback("sales.orders", 424242L) }
  }

  test("expireSnapshots deletes unreferenced manifests and data files") {
    val wh = freshWarehouse()
    val e = new Engine(spark, wh)
    val tdir = s"$wh/sales/orders"
    val md = e.load("sales.orders").metadata
    assert(md.snapshots.size == 4)
    val liveBefore = e.files("sales.orders").select("file_path").as[String]
      .collect().toSet
    def dataFiles() = scala.util.Using.resource(Files.list(Paths.get(tdir, "data")))(
      _.iterator().asScala.size)
    val dataBefore = dataFiles()

    // expire everything but the newest (the overwrite) — the three append
    // snapshots' files are unreferenced afterwards and must be deleted
    val res = e.expireSnapshots("sales.orders",
      olderThanMs = md.snapshots.last.timestampMs, retainLast = 1)
    assert(res.expiredSnapshots.size == 3)
    assert(res.deletedManifestLists == 3)
    assert(res.deletedManifests == 3)
    assert(res.deletedDataFiles > 0)

    val after = e.load("sales.orders").metadata
    assert(after.snapshots.map(_.snapshotId) == Seq(md.snapshots.last.snapshotId))
    assert(after.currentSnapshotId == md.currentSnapshotId)
    // live read unchanged; dead files physically gone
    assert(e.files("sales.orders").select("file_path").as[String]
      .collect().toSet == liveBefore)
    assert(dataFiles() < dataBefore)
    // health still runs on the pruned table
    assert(e.health("sales.orders").fileStats.collect().head
      .getAs[Long]("file_count") > 0)

    // idempotent: nothing further to expire
    val res2 = e.expireSnapshots("sales.orders",
      olderThanMs = Long.MaxValue, retainLast = 1)
    assert(res2.expiredSnapshots.isEmpty)
  }

  test("expireSnapshots that loses the CAS deletes NOTHING (publish-first)") {
    val wh = freshWarehouse()
    val e = new Engine(spark, wh)
    val tdir = s"$wh/sales/orders"
    val md = e.load("sales.orders").metadata
    def dataFiles() = scala.util.Using.resource(Files.list(Paths.get(tdir, "data")))(
      _.iterator().asScala.size)
    val dataBefore = dataFiles()
    // make the metadata publish fail (same failure point as losing the
    // version-slot CAS to a concurrent commit): with delete-before-
    // publish ordering, files would already be gone when this throws.
    // POSIX permissions don't stop root, so use the immutable flag;
    // cancel on filesystems that lack it.
    val metaDir = Paths.get(tdir, "metadata")
    def chattr(flag: String): Int =
      new ProcessBuilder("chattr", flag, metaDir.toString)
        .redirectErrorStream(true).start().waitFor()
    assume(chattr("+i") == 0, "chattr immutable flag unsupported here")
    try {
      intercept[Exception] {
        e.expireSnapshots("sales.orders",
          olderThanMs = md.snapshots.last.timestampMs, retainLast = 1)
      }
    } finally assert(chattr("-i") == 0)
    // the failed commit must not have unlinked anything: the surviving
    // metadata still references every snapshot's files
    assert(dataFiles() == dataBefore)
    md.snapshots.foreach { s =>
      assert(Files.exists(Paths.get(
        new graft.meta.IcebergTable(tdir, md).resolvePath(s.manifestList))),
        s"manifest list of ${s.snapshotId} deleted despite failed CAS")
    }
  }

  test("history + metadataLog relations reflect commits and rollback") {
    val wh = freshWarehouse()
    val e = new Engine(spark, wh)
    // orders: 3 appends + overwrite — all ancestors of current
    val h0 = e.history("sales.orders").collect()
    assert(h0.length == 4 && h0.forall(_.getAs[Boolean]("is_current_ancestor")))

    // append then roll back: the appended snapshot stays in the log but
    // is no longer a current ancestor
    val cur = e.load("sales.orders").metadata.currentSnapshotId.get
    val df = Seq((700L, "X Y", "us-east", 1.0, java.sql.Date.valueOf("2024-06-01"),
      java.sql.Timestamp.valueOf("2024-06-01 00:00:00")))
      .toDF("order_id", "customer_name", "region", "amount", "order_date", "created_at")
    val r = e.append("sales.orders", df)
    e.rollback("sales.orders", cur)
    val h1 = e.history("sales.orders").collect()
      .map(x => x.getAs[Long]("snapshot_id") -> x.getAs[Boolean]("is_current_ancestor")).toMap
    assert(!h1(r.snapshotId) && h1(cur))

    // metadata log: fixture v1 + append v2 + rollback v3
    val ml = e.metadataLog("sales.orders").collect()
    assert(ml.map(_.getAs[Int]("version")).toSeq == Seq(1, 2, 3))
    assert(ml.forall(_.getAs[Long]("size_bytes") > 0))
  }

  test("tags survive expiration, resolve for time travel, and drop cleanly") {
    val wh = freshWarehouse()
    val e = new Engine(spark, wh)
    val md0 = e.load("sales.orders").metadata
    val firstAppend = md0.snapshots.head.snapshotId

    // tag the FIRST append, then expire everything old — the tagged
    // snapshot must survive while its untagged siblings expire
    e.createTag("sales.orders", "v1-audit", Some(firstAppend))
    val res = e.expireSnapshots("sales.orders",
      olderThanMs = md0.snapshots.last.timestampMs, retainLast = 1)
    assert(!res.expiredSnapshots.contains(firstAppend))
    assert(res.expiredSnapshots.size == 2) // the 2nd/3rd appends

    // time travel by name still reads the tagged snapshot's data
    val sid = e.resolveRef("sales.orders", "v1-audit")
    assert(sid == firstAppend)
    assert(e.readTable("sales.orders", Some(sid)).count() == 20L)

    // engine commits move the main branch; tags stay pinned
    import spark.implicits._
    val df = Seq((800L, "Tag Test", "us-east", 1.0,
      java.sql.Date.valueOf("2024-07-01"),
      java.sql.Timestamp.valueOf("2024-07-01 00:00:00")))
      .toDF("order_id", "customer_name", "region", "amount", "order_date", "created_at")
    val r = e.append("sales.orders", df)
    val refs = e.load("sales.orders").metadata.refs
    assert(refs("main") == graft.meta.SnapshotRef(r.snapshotId, "branch"))
    assert(refs("v1-audit") == graft.meta.SnapshotRef(firstAppend, "tag"))

    e.dropRef("sales.orders", "v1-audit")
    assert(!e.load("sales.orders").metadata.refs.contains("v1-audit"))
    intercept[NoSuchElementException] { e.resolveRef("sales.orders", "v1-audit") }
    intercept[IllegalArgumentException] { e.dropRef("sales.orders", "nope") }
  }

  test("branch writes chain from the branch head; main line untouched") {
    val wh = freshWarehouse()
    val e = new Engine(spark, wh)
    val mainRows = e.readTable("staging.metrics").count()
    val mainSnap = e.load("staging.metrics").metadata.currentSnapshotId.get

    import spark.implicits._
    def metric(id: Long) = Seq((id, "host-b", "api", 1.0, 1.0, 1L, 1L, 0, 1, true,
      java.sql.Timestamp.valueOf("2024-08-01 00:00:00")))
      .toDF("metric_id", "host", "service", "cpu_pct", "mem_pct",
        "disk_read_bytes", "net_rx_bytes", "error_count", "request_count",
        "is_healthy", "collected_at")

    // two commits onto an experiment branch
    val b1 = e.append("staging.metrics", metric(900L), branch = Some("exp"))
    val b2 = e.append("staging.metrics", metric(901L), branch = Some("exp"))

    val md = e.load("staging.metrics").metadata
    // main line untouched: current pointer + default reads unchanged
    assert(md.currentSnapshotId.contains(mainSnap))
    assert(e.readTable("staging.metrics").count() == mainRows)
    // the branch chains: b2's parent is b1, b1's parent the old main head
    assert(md.snapshot(b2.snapshotId).get.parentSnapshotId.contains(b1.snapshotId))
    assert(md.snapshot(b1.snapshotId).get.parentSnapshotId.contains(mainSnap))
    assert(md.refs("exp") == graft.meta.SnapshotRef(b2.snapshotId, "branch"))
    // reading the branch sees main's data + both branch appends
    val expSnap = e.resolveRef("staging.metrics", "exp")
    assert(e.readTable("staging.metrics", Some(expSnap)).count() == mainRows + 2)
    // a main-line commit afterwards does not disturb the branch ref
    e.append("staging.metrics", metric(902L))
    assert(e.resolveRef("staging.metrics", "exp") == b2.snapshotId)
  }

  test("orphan files are detected and removed; live files untouched") {
    val wh = freshWarehouse()
    val e = new Engine(spark, wh)
    val tdir = s"$wh/analytics/events"
    val stray = Paths.get(tdir, "data", "stray-leftover.parquet")
    Files.writeString(stray, "not really parquet")

    val orphans = e.orphanFiles("analytics.events")
    assert(orphans == Seq(stray.toString))
    assert(e.removeOrphans("analytics.events") == 1)
    assert(!Files.exists(stray))
    assert(e.orphanFiles("analytics.events").isEmpty)
    // all live files still present and readable
    assert(e.files("analytics.events").count() > 0)
  }

  test("rewriteManifests bin-packs data manifests without changing the live file set") {
    val wh = freshWarehouse()
    val tdir = s"$wh/sales/orders"
    // two engine appends on top of the demo table: each adds a manifest
    val base = ScanPlanner.readTable(spark, graft.meta.IcebergTable.load(tdir))
    graft.meta.TableWriter.append(spark, tdir, base.limit(3))
    graft.meta.TableWriter.append(spark, tdir, base.limit(2))
    val before = graft.meta.IcebergTable.load(tdir)
    val beforeManifests = before.manifests().count(_.content == 0)
    assert(beforeManifests > 1, "table should carry several manifests")
    val beforeFiles = before.files().map(e =>
      (e.filePath, e.recordCount, e.partition)).toSet
    val beforeSnaps = before.metadata.snapshots.map(_.snapshotId)

    val res = Maintenance.rewriteManifests(tdir).get
    assert(res.manifestsBefore == beforeManifests && res.manifestsAfter == 1)

    val after = graft.meta.IcebergTable.load(tdir)
    assert(after.manifests().count(_.content == 0) == 1)
    // identical live set, entries keep their adding snapshot + partition
    val afterFiles = after.files().map(e =>
      (e.filePath, e.recordCount, e.partition)).toSet
    assert(afterFiles == beforeFiles)
    assert(after.files().forall(e => beforeSnaps.contains(e.snapshotId)))
    // prior snapshots still resolve through their old manifest lists
    assert(after.files(Some(beforeSnaps.head)).nonEmpty)
    // already packed: second run is a no-op
    assert(Maintenance.rewriteManifests(tdir).isEmpty)
    // the replace snapshot carries honest totals
    val snap = after.metadata.snapshots.last
    assert(snap.operation == "replace")
    assert(snap.summary("total-data-files").toInt == afterFiles.size)
  }

  /** Simulate a pre-upgrade writer: strip the stamped sequence from every
    * manifest entry of `snapshotId`, so delete scoping must resolve
    * through the snapshot log again. */
  private def stripSequences(t: graft.meta.IcebergTable, snapshotId: Long): Unit =
    t.manifests(Some(snapshotId)).foreach { m =>
      val p = t.resolvePath(m.manifestPath)
      val stripped = graft.meta.AvroManifests.readManifest(p)
        .map(_.copy(sequenceNumber = -1L))
      graft.meta.AvroManifests.writeManifest(p, stripped)
    }

  test("ref-pinned legacy entries keep their resolving snapshots through expiration") {
    val wh = Files.createTempDirectory("graft-legacy-wh").toString
    val e = new Engine(spark, wh)
    e.createTable("ns.t", new org.apache.spark.sql.types.StructType()
      .add("k", org.apache.spark.sql.types.LongType)
      .add("v", org.apache.spark.sql.types.StringType))
    // A1: upsert — data file + equality delete, both at sequence 1
    e.upsert("ns.t", Seq((1L, "one")).toDF("k", "v"), Seq("k"))
    // A2: plain append at sequence 2, carrying A1's manifests forward
    e.append("ns.t", Seq((2L, "two")).toDF("k", "v"))
    val a1 = e.load("ns.t").metadata.snapshots.head.snapshotId
    val a2 = e.load("ns.t").metadata.currentSnapshotId.get
    stripSequences(e.load("ns.t"), a2)
    e.createTag("ns.t", "audit", Some(a2))
    // main moves on — the current snapshot carries only fresh stamps
    e.overwrite("ns.t", Seq((9L, "nine")).toDF("k", "v"))
    assert(e.readTable("ns.t", Some(a2)).select("k").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L))

    // expire everything age allows: the tag head survives as a ref, and
    // the guard must ALSO retain the snapshots the tag's legacy entries
    // resolve their delete-scoping sequences through — losing A1 would
    // collapse the equality delete's scope to everything (rows vanish)
    e.expireSnapshots("ns.t", olderThanMs = Long.MaxValue, retainLast = 1)
    val mdAfter = e.load("ns.t").metadata
    assert(mdAfter.snapshots.exists(_.snapshotId == a1),
      "legacy-resolving snapshot A1 expired despite the ref-pinned legacy entries")
    assert(e.readTable("ns.t", Some(a2)).select("k").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L),
      "ref-pinned read lost rows after expiration (equality delete over-applied)")
  }

  test("advise recommends rewrite-manifests when live entries carry legacy sequences") {
    val wh = Files.createTempDirectory("graft-advise-legacy-wh").toString
    val e = new Engine(spark, wh)
    e.createTable("ns.t", new org.apache.spark.sql.types.StructType()
      .add("k", org.apache.spark.sql.types.LongType))
    e.append("ns.t", Seq(1L, 2L).toDF("k"))
    // fresh writers stamp every entry: no legacy recommendation
    val before = e.advise("ns.t").filter(col("action") === "rewrite-manifests")
      .collect().head
    assert(!before.getString(2).contains("legacy"))
    stripSequences(e.load("ns.t"), e.load("ns.t").metadata.currentSnapshotId.get)
    val row = e.advise("ns.t").filter(col("action") === "rewrite-manifests")
      .collect().head
    assert(row.getString(1) == "RECOMMENDED", row.mkString("|"))
    assert(row.getString(2).contains("legacy"), row.mkString("|"))
  }
}
