package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.api.Engine
import graft.fixtures.FixtureWriter

/** v2 delete-manifest awareness + the incremental changelog scan
  * (VERDICT r4 items 5-6). */
class DeletesAndChangelogSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val dir = Files.createTempDirectory("graft-del-wh").toString
    FixtureWriter.writeDemo(spark, dir)
    FixtureWriter.writeDeletesTable(spark, s"$dir/lab/cdc")
    dir
  }
  private lazy val engine = new Engine(spark, warehouse)

  import spark.implicits._

  test("delete manifest: census flags compaction, files()/deleteFiles() split") {
    val census = engine.health("lab.cdc").manifestCensus.collect().head
    assert(census.getAs[Long]("data_manifests") == 1L)
    assert(census.getAs[Long]("delete_manifests") == 1L)
    assert(census.getAs[Boolean]("compaction_recommended"))

    // files() lists ONLY data files; deleteFiles() only the delete files
    assert(engine.files("lab.cdc").count() == 3L)
    val dels = engine.deleteFiles("lab.cdc")
    assert(dels.count() == 3L) // 2 position + 1 equality
    assert(dels.select("file_path").as[String].collect().forall(_.contains("delete")))
    // delete record counts surface (10 + 11 positions, 2 equality rows)
    assert(dels.agg(sum("record_count")).as[Long].head() == 23L)
    // the equality delete carries its id list; position deletes don't
    assert(dels.filter(size(col("equality_ids")) > 0).count() == 1L)

    // the pre-delete snapshot has no delete files
    val dataSnap = engine.load("lab.cdc").metadata.snapshots.head.snapshotId
    assert(engine.deleteFiles("lab.cdc", Some(dataSnap)).count() == 0L)
  }

  test("merge-on-read: readTable applies position AND equality deletes") {
    val totalRows = 100L + 101L + 102L // three data files
    val deletedPositions = 10L + 11L   // two position-delete files, even rows
    val equalityDeletes = 2L           // row_id in (2001, 2003)
    // pinned to the pre-delete snapshot: every row visible
    val dataSnap = engine.load("lab.cdc").metadata.snapshots.head.snapshotId
    assert(engine.readTable("lab.cdc", Some(dataSnap)).count() == totalRows)
    // current snapshot: deleted (file, pos) + equality-matched rows gone
    val live = engine.readTable("lab.cdc")
    assert(live.count() == totalRows - deletedPositions - equalityDeletes)
    // exactly the EVEN positions of files 0/1 disappeared: file 0 lost
    // row_ids {0,2,..,18}, file 1 lost {1000,1002,..,1020}
    val ids = live.select("row_id").as[Long].collect().toSet
    assert(!ids.contains(0L) && !ids.contains(18L) && ids.contains(1L) && ids.contains(20L))
    assert(!ids.contains(1000L) && !ids.contains(1020L) && ids.contains(1001L))
    // file 2 lost exactly the equality-matched row_ids
    assert(!ids.contains(2001L) && !ids.contains(2003L) && ids.contains(2002L))
    assert(ids.count(_ >= 2000L) == 100)

    // SEQUENCE SCOPING: re-appending a deleted key AFTER the delete
    // commit (sequence 3 > delete's 2) must survive the equality delete
    val revived = Seq((2001L, "revived", 1))
      .toDF("row_id", "payload", "shard")
    engine.append("lab.cdc", revived)
    val after = engine.readTable("lab.cdc")
    assert(after.filter(col("row_id") === 2001L).count() == 1L)
    assert(after.count() == totalRows - deletedPositions - equalityDeletes + 1)
  }

  test("changes() walks the parent chain with per-snapshot adds/deletes") {
    val md = engine.load("sales.orders").metadata
    val snaps = md.snapshots.map(_.snapshotId) // 3 appends + 1 overwrite
    val ch = engine.changes("sales.orders", snaps.head, snaps.last).collect()

    // three change-sets: append#2, append#3, overwrite
    val bySnap = ch.groupBy(_.getAs[Long]("snapshot_id"))
    assert(bySnap.keySet == snaps.tail.toSet)

    // appends only add
    Seq(snaps(1), snaps(2)).foreach { sid =>
      assert(bySnap(sid).forall(_.getAs[String]("change") == "added"))
    }
    // the overwrite deletes every prior live file and adds its own
    val ow = bySnap(snaps.last)
    assert(ow.exists(_.getAs[String]("change") == "deleted"))
    assert(ow.exists(_.getAs[String]("change") == "added"))
    val deletedPaths = ow.filter(_.getAs[String]("change") == "deleted")
      .map(_.getAs[String]("file_path")).toSet
    // deleted set == all files live at the previous snapshot
    val prevLive = engine.files("sales.orders", Some(snaps(2)))
      .select("file_path").as[String].collect().toSet
    assert(deletedPaths == prevLive)

    // per-snapshot adds agree with diff() over the same pair
    val d = engine.diff("sales.orders", snaps(1), snaps(2))
    val chAdds = bySnap(snaps(2)).filter(_.getAs[String]("change") == "added")
      .map(_.getAs[String]("file_path")).toSet
    assert(chAdds == d.added.select("file_path").as[String].collect().toSet)

    // range validation
    intercept[IllegalArgumentException] {
      engine.changes("sales.orders", 999999L, snaps.last).collect()
    }
  }

  test("changes() composes with the engine write path end-to-end") {
    val wh = Files.createTempDirectory("graft-chg-wh").toString
    FixtureWriter.writeDemo(spark, wh)
    val e = new Engine(spark, wh)
    val s0 = e.load("staging.metrics").metadata.currentSnapshotId.get
    val df = Seq((200L, "host-x", "web", 5.0, 6.0, 7L, 8L, 1, 99, false,
      java.sql.Timestamp.valueOf("2024-06-01 00:00:00")))
      .toDF("metric_id", "host", "service", "cpu_pct", "mem_pct",
        "disk_read_bytes", "net_rx_bytes", "error_count", "request_count",
        "is_healthy", "collected_at")
    val r1 = e.append("staging.metrics", df)
    val r2 = e.append("staging.metrics", df.withColumn("metric_id", lit(201L)))
    val ch = e.changes("staging.metrics", s0, r2.snapshotId)
    assert(ch.count() == 2L) // one added file per append, nothing deleted
    assert(ch.select("snapshot_id").as[Long].collect().toSet ==
      Set(r1.snapshotId, r2.snapshotId))
    assert(ch.select("change").as[String].collect().forall(_ == "added"))
  }

  test("rowChanges: row-level CDC across append / delete / upsert / compaction") {
    val dir = Files.createTempDirectory("graft-cdc2-t").toString + "/t"
    import org.apache.spark.sql.types._
    graft.meta.TableCreator.create(dir, StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    val t0 = graft.meta.TableWriter
      .append(spark, dir, Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    // MoR position delete of id=2
    val t1 = graft.meta.TableWriter
      .deleteWhere(spark, dir, col("id") === 2L).get
    // upsert: id=3 changes value, id=4 is new (equality delete + append)
    val t2 = graft.meta.TableWriter
      .upsert(spark, dir, Seq((3L, "C"), (4L, "d")).toDF("id", "v"), Seq("id"))
    // compaction folds the deletes: physical only, no CDC rows
    val t3 = graft.ops.Compact.rewriteSmallFiles(spark, dir).get

    def changes(from: Long, to: Long): Set[(Long, String, String, Long)] =
      graft.ops.ChangeFeed.rowChanges(spark, graft.meta.IcebergTable.load(dir), from, to)
        .select(col("id"), col("v"), col("_change_type"), col("_commit_snapshot_id"))
        .as[(Long, String, String, Long)].collect().toSet

    // delete commit: exactly the (2, b) row disappears
    assert(changes(t0.snapshotId, t1.snapshotId) ==
      Set((2L, "b", "delete", t1.snapshotId)))
    // upsert commit: old (3, c) deleted, (3, C) and (4, d) inserted
    assert(changes(t1.snapshotId, t2.snapshotId) == Set(
      (3L, "c", "delete", t2.snapshotId),
      (3L, "C", "insert", t2.snapshotId),
      (4L, "d", "insert", t2.snapshotId)))
    // compaction contributes nothing
    assert(changes(t2.snapshotId, t3.snapshotId).isEmpty)
    // whole range composes
    val full = changes(t0.snapshotId, t3.snapshotId)
    assert(full.count(_._3 == "insert") == 2 && full.count(_._3 == "delete") == 2)
  }

  test("rowChanges: copy-on-write DELETE and UPDATE are CDC-visible as overwrite") {
    val dir = Files.createTempDirectory("graft-cdc-cow").toString + "/t"
    import org.apache.spark.sql.types._
    graft.meta.TableCreator.create(dir, StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    // ONE data file, so the CoW rewrite has survivors (coarse CDC path)
    val t0 = graft.meta.TableWriter.append(spark, dir,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1))
    // copy-on-write delete of id=2 — must NOT be stamped "replace"
    // (compaction's label), or CDC and fail-fast streams skip it
    val t1 = graft.ops.Delete.copyOnWrite(spark, dir, col("id") === 2L).get
    val op1 = graft.meta.IcebergMeta.load(dir)
      .snapshot(t1.snapshotId).get.operation
    assert(op1 == "overwrite", s"CoW delete stamped '$op1'")
    // copy-on-write update of id=3
    val t2 = graft.ops.Delete.updateWhere(spark, dir,
      col("id") === 3L, Map("v" -> lit("C"))).get
    assert(graft.meta.IcebergMeta.load(dir)
      .snapshot(t2.snapshotId).get.operation == "overwrite")

    def changes(from: Long, to: Long): Set[(Long, String, String)] =
      graft.ops.ChangeFeed.rowChanges(spark, graft.meta.IcebergTable.load(dir), from, to)
        .select(col("id"), col("v"), col("_change_type"))
        .as[(Long, String, String)].collect().toSet

    // coarse COW changelog: every row of the rewritten file reported as
    // delete + the survivors re-inserted; the net-gone row is (2, b)
    val d1 = changes(t0.snapshotId, t1.snapshotId)
    assert(d1.contains((2L, "b", "delete")))
    assert(!d1.contains((2L, "b", "insert")))
    assert(d1.contains((1L, "a", "insert")) && d1.contains((3L, "c", "insert")))
    val d2 = changes(t1.snapshotId, t2.snapshotId)
    assert(d2.contains((3L, "c", "delete")) && d2.contains((3L, "C", "insert")))
    assert(!d2.contains((3L, "c", "insert")))

    // net mode: unchanged rewritten rows cancel — the UPDATE commit is
    // exactly one delete + one insert, no (1, a) survivor noise
    val net2 = graft.ops.ChangeFeed.rowChanges(
        spark, graft.meta.IcebergTable.load(dir),
        t1.snapshotId, t2.snapshotId, net = true)
      .select(col("id"), col("v"), col("_change_type"))
      .as[(Long, String, String)].collect().toSet
    assert(net2 == Set((3L, "c", "delete"), (3L, "C", "insert")), net2.toString)
  }

  test("rowChanges net mode is a true MULTISET diff: duplicate rows keep their counts") {
    val dir = Files.createTempDirectory("graft-cdc-multiset").toString + "/t"
    import org.apache.spark.sql.types._
    graft.meta.TableCreator.create(dir, StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    // before: (1,a) ×2, (2,b) ×1 — after the overwrite: (1,a) ×1, (2,b) ×2
    val t0 = graft.meta.TableWriter.append(spark, dir,
      Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    val t1 = graft.meta.TableWriter.overwrite(spark, dir,
      Seq((1L, "a"), (2L, "b"), (2L, "b")).toDF("id", "v").coalesce(1))
    val net = graft.ops.ChangeFeed.rowChanges(
        spark, graft.meta.IcebergTable.load(dir),
        t0.snapshotId, t1.snapshotId, net = true)
      .select(col("id"), col("v"), col("_change_type"))
      .as[(Long, String, String)].collect().toSeq
    // one copy of (1,a) net-gone, one extra copy of (2,b) net-new —
    // a set-based diff would report nothing at all
    assert(net.sorted == Seq((1L, "a", "delete"), (2L, "b", "insert")), net.toString)
  }

  test("rowChanges: 50-commit range unions stay shallow (tree reduce)") {
    val dir = Files.createTempDirectory("graft-cdc-50").toString + "/t"
    import org.apache.spark.sql.types._
    graft.meta.TableCreator.create(dir, StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    val first = graft.meta.TableWriter
      .append(spark, dir, Seq((0L, "v0")).toDF("id", "v"))
    var last = first
    (1 until 50).foreach { i =>
      last = graft.meta.TableWriter
        .append(spark, dir, Seq((i.toLong, s"v$i")).toDF("id", "v"))
    }
    val t = graft.meta.IcebergTable.load(dir)
    val ch = graft.ops.ChangeFeed.rowChanges(
      spark, t, first.snapshotId, last.snapshotId)
    assert(ch.count() == 49L)
    assert(ch.select("_change_type").distinct().as[String].collect().toSeq == Seq("insert"))
    // plan depth must be O(log n): a linear fold of 49 unions nests ~49
    // deep; a balanced reduce nests ~6. Count max Union nesting.
    def unionDepth(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int = {
      val kids = p.children.map(unionDepth)
      val mine = if (p.nodeName == "Union") 1 else 0
      mine + (if (kids.isEmpty) 0 else kids.max)
    }
    val depth = unionDepth(ch.queryExecution.logical)
    assert(depth <= 8, s"union nesting depth $depth — linear fold?")
  }
}
