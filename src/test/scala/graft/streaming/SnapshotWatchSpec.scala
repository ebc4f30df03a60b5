package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.fixtures.FixtureWriter

class SnapshotWatchSpec extends SparkSpec {

  test("micro-batch stream emits every snapshot of the fixture table") {
    val wh = Files.createTempDirectory("graft-stream-wh").toString
    FixtureWriter.writeDemo(spark, wh)
    val tableDir = s"$wh/analytics/events"

    val stream = spark.readStream
      .format("graft.streaming.SnapshotWatchProvider")
      .option("tableDir", tableDir)
      .load()
    val q = stream.writeStream
      .format("memory")
      .queryName("watched_snapshots")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT snapshot_id, operation FROM watched_snapshots ORDER BY snapshot_id")
        .collect()
      assert(rows.length == 3)
      assert(rows.map(_.getLong(0)).toSeq == Seq(1000L, 1001L, 1002L))
      assert(rows.forall(_.getString(1) == "append"))
    } finally q.stop()
  }

  test("offsets are monotonic and ranges replay deterministically") {
    val wh = Files.createTempDirectory("graft-stream-wh2").toString
    FixtureWriter.writeDemo(spark, wh)
    val stream = new SnapshotWatchStream(s"$wh/sales/orders")
    assert(stream.initialOffset() == SnapshotKeyOffset.zero)
    assert(stream.latestOffset() == SnapshotKeyOffset(4L, 1003L))
    assert(stream.deserializeOffset("""{"seq":2,"id":1001}""") == SnapshotKeyOffset(2L, 1001L))
    val parts = stream.planInputPartitions(
      SnapshotKeyOffset(1L, 1000L), SnapshotKeyOffset(3L, 1002L))
    assert(parts.length == 1)
    val reader = stream.createReaderFactory().createReader(parts.head)
    val ids = Iterator.continually(reader)
      .takeWhile(_.next()).map(_.get().getLong(0)).toVector
    assert(ids == Vector(1001L, 1002L))
    // empty range → no partitions
    assert(stream.planInputPartitions(
      SnapshotKeyOffset(3L, 1002L), SnapshotKeyOffset(3L, 1002L)).isEmpty)
  }

  test("commit-key offsets survive snapshot expiry (stable, not positional)") {
    import graft.meta.Snapshot
    def snap(id: Long, seq: Long): Snapshot =
      Snapshot(id, None, id, "append", Map.empty, s"metadata/snap-$id.avro",
        sequenceNumber = seq)
    val full = Seq(snap(1000L, 1L), snap(1001L, 2L), snap(1002L, 3L), snap(1003L, 4L))
    val checkpointed = SnapshotKeyOffset(2L, 1001L) // processed through 1001
    // expiry drops the two oldest and re-sorts — a positional index 2
    // would now skip 1003; the key range still selects exactly the unseen
    val afterExpiry = full.drop(2).reverse
    val replay = SnapshotKeyOffset.slice(afterExpiry, checkpointed,
      SnapshotKeyOffset(4L, 1003L))
    assert(replay.map(_.snapshotId) == Seq(1002L, 1003L))
    // pre-sequence (v1) metadata: all seq 0 → id order still keys batches
    val v1 = Seq(snap(7L, 0L), snap(5L, 0L), snap(6L, 0L))
    assert(SnapshotKeyOffset.slice(v1, SnapshotKeyOffset(0L, 5L),
      SnapshotKeyOffset(0L, 7L)).map(_.snapshotId) == Seq(6L, 7L))
  }
}
