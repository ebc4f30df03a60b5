package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.api.Engine
import graft.fixtures.FixtureWriter

/** The streaming changelog source must agree with the batch
  * `Engine.changes` scan and pick up engine-append commits live. */
class ChangelogSourceSpec extends SparkSpec {

  test("changelog stream emits per-snapshot file diffs incl. overwrite deletes") {
    val wh = Files.createTempDirectory("graft-chlog-wh").toString
    FixtureWriter.writeDemo(spark, wh)
    val tableDir = s"$wh/sales/orders" // 3 appends + 1 overwrite

    val q = spark.readStream
      .format("graft.streaming.ChangelogProvider")
      .option("tableDir", tableDir)
      .load()
      .writeStream.format("memory").queryName("chlog")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM chlog").collect()
      // batch twin over the full chain agrees row-for-row on (snap, change, path)
      val e = new Engine(spark, wh)
      val snaps = e.load("sales.orders").metadata.snapshots.map(_.snapshotId)
      val batch = e.changes("sales.orders", snaps.head, snaps.last).collect()
      val streamKeys = rows.map(r => (r.getAs[Long]("snapshot_id"),
        r.getAs[String]("change"), r.getAs[String]("file_path"))).toSet
      val batchKeys = batch.map(r => (r.getAs[Long]("snapshot_id"),
        r.getAs[String]("change"), r.getAs[String]("file_path"))).toSet
      // stream also covers snapshot #1 (vs empty parent); drop it to compare
      assert(batchKeys.subsetOf(streamKeys))
      assert((streamKeys -- batchKeys).forall(_._1 == snaps.head))
      // the overwrite snapshot contributes deletes
      assert(rows.exists(r => r.getAs[Long]("snapshot_id") == snaps.last &&
        r.getAs[String]("change") == "deleted"))

      // a live engine append lands in the next micro-batch
      import spark.implicits._
      val df = Seq((500L, "New Person", "us-west", 1.0,
        java.sql.Date.valueOf("2024-05-01"),
        java.sql.Timestamp.valueOf("2024-05-01 00:00:00")))
        .toDF("order_id", "customer_name", "region", "amount", "order_date", "created_at")
      val res = e.append("sales.orders", df)
      q.processAllAvailable()
      val newRows = spark.sql(
        s"SELECT change FROM chlog WHERE snapshot_id = ${res.snapshotId}").collect()
      assert(newRows.nonEmpty && newRows.forall(_.getString(0) == "added"))
    } finally q.stop()
  }
}
