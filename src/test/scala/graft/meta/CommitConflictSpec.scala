package graft.meta

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkSpec

/** Optimistic concurrency: publishing a metadata version is a
  * compare-and-swap ([[IcebergMeta.publish]] — hard-link, not rename) —
  * the loser of a race gets [[CommitConflictException]], the winner's
  * document is untouched, and no staging files leak. Every commit path
  * (TableWriter, SchemaEvolution, Maintenance) routes through it. */
class CommitConflictSpec extends SparkSpec {

  import spark.implicits._

  test("publish is first-writer-wins: the loser conflicts, the winner survives") {
    val dir = Files.createTempDirectory("graft-cas")
    val target = dir.resolve("v3.metadata.json")
    IcebergMeta.publish(target, """{"winner": true}""")

    val e = intercept[CommitConflictException](
      IcebergMeta.publish(target, """{"loser": true}"""))
    assert(e.getMessage.contains("v3.metadata.json"))
    assert(Files.readString(target) == """{"winner": true}""")
    // no staging junk left behind by either attempt
    assert(!scala.util.Using.resource(Files.list(dir))(
      _.iterator().asScala.exists(_.getFileName.toString.endsWith(".tmp"))))
  }

  test("concurrent appends all land: CAS losers retry, no artifact clobbering") {
    val dir = Files.createTempDirectory("graft-cas3").toString + "/t"
    TableCreator.create(dir, StructType(Seq(StructField("id", LongType))))
    val threads = 4
    val perThread = 3
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val ec = scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = (0 until threads).map { t =>
      scala.concurrent.Future {
        (0 until perThread).foreach { i =>
          TableWriter.append(spark, dir, Seq((t * 100 + i).toLong).toDF("id"))
        }
      }(ec)
    }
    futures.foreach(f => scala.concurrent.Await.result(
      f, scala.concurrent.duration.Duration(300, "s")))
    pool.shutdown()

    val t2 = IcebergTable.load(dir)
    // every commit landed, on one linear parent chain
    assert(t2.metadata.snapshots.size == threads * perThread)
    val snaps = t2.metadata.snapshots
    snaps.sliding(2).foreach { case Seq(a, b) =>
      assert(b.parentSnapshotId.contains(a.snapshotId),
        s"non-linear chain: ${snaps.map(s => (s.snapshotId, s.parentSnapshotId))}")
    }
    // all rows present, every referenced artifact exists on disk
    val rows = graft.ops.ScanPlanner.readTable(spark, t2).as[Long].collect().toSet
    val want = (for (t <- 0 until threads; i <- 0 until perThread)
      yield (t * 100 + i).toLong).toSet
    assert(rows == want)
    t2.files().foreach(e =>
      assert(Files.exists(Paths.get(t2.resolvePath(e.filePath))),
        s"clobbered data file ${e.filePath}"))
    t2.manifests().foreach(m =>
      assert(Files.exists(Paths.get(t2.resolvePath(m.manifestPath)))))
  }

  test("a normal append publishes through the CAS path and stays readable") {
    val dir = Files.createTempDirectory("graft-cas2").toString + "/t"
    TableCreator.create(dir, StructType(Seq(StructField("id", LongType))))
    TableWriter.append(spark, dir, Seq(1L, 2L).toDF("id"))
    TableWriter.append(spark, dir, Seq(3L).toDF("id"))
    val md = IcebergMeta.load(dir)
    assert(md.snapshots.size == 2)
    assert(Files.exists(Paths.get(dir, "metadata", "v3.metadata.json")))
    assert(graft.ops.ScanPlanner.readTable(
      spark, IcebergTable.load(dir)).count() == 3L)
  }

  test("conditional overwrite: a table that advanced past the pinned snapshot conflicts") {
    // the rebuild-style flow: derive rows from a pinned snapshot read,
    // replace conditionally on that snapshot still being current — an
    // interleaved append must surface as a conflict, never be erased
    val dir = Files.createTempDirectory("graft-cas4").toString + "/t"
    TableCreator.create(dir, StructType(Seq(StructField("id", LongType))))
    TableWriter.append(spark, dir, Seq(1L, 2L).toDF("id"))
    val pinned = IcebergMeta.load(dir).currentSnapshotId.get

    // interleaved writer lands between the pinned load and the replace
    TableWriter.append(spark, dir, Seq(3L).toDF("id"))
    val e = intercept[CommitConflictException](
      TableWriter.overwrite(spark, dir, Seq(9L).toDF("id"),
        expectedCurrentSnapshotId = Some(pinned)))
    assert(e.getMessage.contains(pinned.toString))
    // nothing was erased: the interleaved row is still live
    assert(graft.ops.ScanPlanner.readTable(
      spark, IcebergTable.load(dir)).count() == 3L)

    // re-pinned on the CURRENT snapshot the replace goes through
    val cur = IcebergMeta.load(dir).currentSnapshotId.get
    TableWriter.overwrite(spark, dir, Seq(9L).toDF("id"),
      expectedCurrentSnapshotId = Some(cur))
    assert(graft.ops.ScanPlanner.readTable(
      spark, IcebergTable.load(dir)).count() == 1L)
  }

  test("conditional upsert: a stale pinned snapshot conflicts instead of " +
      "retry-rebasing over the interleaved writer's rows") {
    // the ledger-fold flow: the delta was DERIVED from a pinned read, so
    // an unconditional retry would let this upsert's equality delete
    // erase rows a concurrent fold upserted in between
    val dir = Files.createTempDirectory("graft-cas5").toString + "/t"
    TableCreator.create(dir, StructType(Seq(StructField("id", LongType))))
    TableWriter.append(spark, dir, Seq(1L, 2L).toDF("id"))
    val pinned = IcebergMeta.load(dir).currentSnapshotId.get

    // interleaved upsert lands between the pinned load and this commit
    TableWriter.upsert(spark, dir, Seq(2L).toDF("id"), Seq("id"))
    val e = intercept[CommitConflictException](
      TableWriter.upsert(spark, dir, Seq(2L).toDF("id"), Seq("id"),
        expectedCurrentSnapshotId = Some(pinned)))
    assert(e.getMessage.contains(pinned.toString))

    // unconditional (no expectation) keeps the old retry-rebase behavior
    TableWriter.upsert(spark, dir, Seq(2L).toDF("id"), Seq("id"))
    assert(graft.ops.ScanPlanner.readTable(
      spark, IcebergTable.load(dir)).count() == 2L)
  }
}
