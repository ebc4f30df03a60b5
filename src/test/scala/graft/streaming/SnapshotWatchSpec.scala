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
    assert(stream.initialOffset() == SnapshotIndexOffset(0))
    assert(stream.latestOffset() == SnapshotIndexOffset(4))
    assert(stream.deserializeOffset("""{"index":2}""") == SnapshotIndexOffset(2))
    val parts = stream.planInputPartitions(SnapshotIndexOffset(1), SnapshotIndexOffset(3))
    assert(parts.length == 1)
    val reader = stream.createReaderFactory().createReader(parts.head)
    val ids = Iterator.continually(reader)
      .takeWhile(_.next()).map(_.get().getLong(0)).toVector
    assert(ids == Vector(1001L, 1002L))
    // empty range → no partitions
    assert(stream.planInputPartitions(SnapshotIndexOffset(3), SnapshotIndexOffset(3)).isEmpty)
  }
}
