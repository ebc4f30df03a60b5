package graft.meta

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkSpec
import graft.api.Engine

/** `version-hint.text` fast-path resolution and opt-in metadata-log
  * retention (round 18): every load used to LIST the whole metadata
  * directory to find the latest version — tens of thousands of Avro
  * files on a streaming table — and old vN.metadata.json accumulated
  * forever. The hint is ADVISORY (stale/torn/absent degrade to probes or
  * the listing, never to a stale read); retention only ever deletes
  * strictly-old version files, which carry nothing but metadata-log
  * history. */
class MetadataHintSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(): (Engine, String, String) = {
    val wh = Files.createTempDirectory("graft-hint-wh").toString
    val e = new Engine(spark, wh)
    val ref = "ns.h"
    e.createTable(ref, StructType(Seq(
      StructField("id", LongType), StructField("v", LongType))))
    (e, ref, s"$wh/ns/h")
  }

  test("publish writes the hint; resolution probes forward past a " +
      "regressed hint and falls back past a corrupt or missing one") {
    val (e, ref, dir) = freshTable()
    e.append(ref, Seq((1L, 10L)).toDF("id", "v")) // v2
    e.append(ref, Seq((2L, 20L)).toDF("id", "v")) // v3
    val hint = Paths.get(dir, "metadata", "version-hint.text")
    assert(Files.readString(hint).trim == "3")
    val latest = IcebergMeta.latestMetadataPath(dir)
    assert(latest.getFileName.toString == "v3.metadata.json")

    // regressed hint (a slow racer overwrote): forward probe still finds v3
    Files.writeString(hint, "1")
    assert(IcebergMeta.latestMetadataPath(dir).getFileName.toString ==
      "v3.metadata.json")
    // and the next commit repairs it
    e.append(ref, Seq((3L, 30L)).toDF("id", "v")) // v4
    assert(Files.readString(hint).trim == "4")

    // corrupt hint: full-listing fallback
    Files.writeString(hint, "not-a-number")
    assert(IcebergMeta.latestMetadataPath(dir).getFileName.toString ==
      "v4.metadata.json")
    // absent hint: same
    Files.delete(hint)
    assert(IcebergMeta.latestMetadataPath(dir).getFileName.toString ==
      "v4.metadata.json")
    // hint pointing at a version that does not exist: fallback, not error
    Files.writeString(hint, "99")
    assert(IcebergMeta.latestMetadataPath(dir).getFileName.toString ==
      "v4.metadata.json")
    // reads stay correct through all of it
    assert(e.readTable(ref).count() == 3L)
  }

  test("retention under RACING writers: CAS losers retry through the " +
      "hint, the version window and the chain hold") {
    val dir = Files.createTempDirectory("graft-hint-race").toString + "/t"
    TableCreator.create(dir, StructType(Seq(StructField("id", LongType))),
      properties = Map("graft.metadata.previous-versions-max" -> "3"))
    val threads = 4
    val perThread = 3
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val ec = scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = (0 until threads).map { th =>
      scala.concurrent.Future {
        (0 until perThread).foreach { i =>
          TableWriter.append(spark, dir,
            Seq((th * 100 + i).toLong).toDF("id"))
        }
      }(ec)
    }
    futures.foreach(f => scala.concurrent.Await.result(
      f, scala.concurrent.duration.Duration(300, "s")))
    pool.shutdown()
    val t = IcebergTable.load(dir)
    assert(t.metadata.snapshots.size == threads * perThread)
    t.metadata.snapshots.sliding(2).foreach { case Seq(a, b) =>
      assert(b.parentSnapshotId.contains(a.snapshotId))
    }
    assert(graft.ops.ScanPlanner.readTable(spark, t).count() ==
      (threads * perThread).toLong)
    // v1 create + 12 commits = v13; keep-last 3 (older = tombstones)
    val metaDir = Paths.get(dir, "metadata")
    val versions = scala.util.Using.resource(Files.list(metaDir)) { s =>
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(p => p.getFileName.toString.matches("v\\d+\\.metadata\\.json") &&
          Files.size(p) > 0)
        .map(_.getFileName.toString
          .stripPrefix("v").stripSuffix(".metadata.json").toInt)
        .toSeq.sorted
    }
    assert(versions == Seq(11, 12, 13), s"got $versions")
    assert(Files.readString(
      metaDir.resolve("version-hint.text")).trim == "13")
  }

  test("previous-versions-max retention unlinks old version files; " +
      "snapshots, time travel and rollback live in the current document") {
    val (e, ref, dir) = freshTable()
    val s1 = e.append(ref, Seq((1L, 10L)).toDF("id", "v")).snapshotId // v2
    e.setProperties(ref, Map(
      "graft.metadata.previous-versions-max" -> "2")) // v3
    e.append(ref, Seq((2L, 20L)).toDF("id", "v")) // v4: clears backlog
    e.append(ref, Seq((3L, 30L)).toDF("id", "v")) // v5
    val metaDir = Paths.get(dir, "metadata")
    def liveVersions: Seq[Int] = scala.util.Using.resource(Files.list(metaDir)) { s =>
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(p => p.getFileName.toString.matches("v\\d+\\.metadata\\.json") &&
          Files.size(p) > 0)
        .map(_.getFileName.toString
          .stripPrefix("v").stripSuffix(".metadata.json").toInt)
        .toSeq.sorted
    }
    assert(liveVersions == Seq(4, 5)) // keep-last 2; v1..v3 retired
    // retired versions are zero-byte TOMBSTONES, not unlinked: the
    // version number stays claimed, so a stale writer can never fork
    // history by re-creating it…
    assert(Files.exists(metaDir.resolve("v2.metadata.json")))
    assert(Files.size(metaDir.resolve("v2.metadata.json")) == 0L)
    intercept[CommitConflictException](IcebergMeta.publish(
      metaDir.resolve("v2.metadata.json"), "{\"forged\": true}"))
    // …and the hint's forward probe never meets a gap
    Files.writeString(metaDir.resolve("version-hint.text"), "1")
    assert(IcebergMeta.latestMetadataPath(dir).getFileName.toString ==
      "v5.metadata.json")
    // the metadata log shrinks to the retained files, loads stay exact
    assert(graft.rel.MetaRelations.metadataLog(spark, dir).count() == 2L)
    assert(e.readTable(ref).count() == 3L)
    // time travel to the FIRST snapshot (whose publishing FILE is retired
    // — the snapshot itself lives in the current document)
    assert(e.readTable(ref, Some(s1)).count() == 1L)
    // rollback is metadata-only and unaffected
    e.rollback(ref, s1)
    assert(e.readTable(ref).count() == 1L)
    assert(liveVersions == Seq(5, 6))
  }
}
