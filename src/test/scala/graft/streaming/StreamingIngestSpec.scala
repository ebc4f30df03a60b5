package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.api.Engine
import graft.meta.IcebergTable
import graft.ops.ScanPlanner

final case class IngestDoc(doc_id: Long, body: String)

/** Streaming ingest into a graft table: each micro-batch becomes an
  * append snapshot, batch ids stamp the snapshot summary, and
  * re-delivered batches (at-least-once foreachBatch) are skipped —
  * exactly-once table contents across restarts. */
class StreamingIngestSpec extends SparkSpec {

  test("micro-batches land as append snapshots; rows match; batch ids recorded") {
    val wh = Files.createTempDirectory("graft-ingest-wh").toString
    val engine = new Engine(spark, wh)
    Files.createDirectories(java.nio.file.Paths.get(s"$wh/stream"))
    engine.createTable("stream.docs", StructType(Seq(
      StructField("doc_id", LongType), StructField("body", StringType))))

    val s2 = spark
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s2.sqlContext
    val input = MemoryStream[IngestDoc]
    val ckpt = Files.createTempDirectory("graft-ingest-ckpt").toString
    val q = engine.appendStream("stream.docs", input.toDF(), ckpt)
    try {
      input.addData(IngestDoc(1, "a"), IngestDoc(2, "b"))
      q.processAllAvailable()
      input.addData(IngestDoc(3, "c"))
      q.processAllAvailable()
    } finally q.stop()

    val t = IcebergTable.load(s"$wh/stream/docs")
    val snaps = t.metadata.snapshots
    assert(snaps.map(_.operation) == Seq("append", "append"))
    assert(snaps.flatMap(_.summary.get("streaming-batch-id")) == Seq("0", "1"))
    val rows = ScanPlanner.readTable(spark, t)
      .as[(Long, String)].collect().sorted.toSeq
    assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("a re-delivered batch id is skipped (restart idempotence)") {
    val wh = Files.createTempDirectory("graft-ingest2-wh").toString
    val engine = new Engine(spark, wh)
    Files.createDirectories(java.nio.file.Paths.get(s"$wh/stream"))
    engine.createTable("stream.docs", StructType(Seq(
      StructField("doc_id", LongType), StructField("body", StringType))))

    val s2 = spark
    import s2.implicits._
    val batch = Seq(IngestDoc(1, "a")).toDF()
    assert(engine.commitStreamBatch("stream.docs", batch, 0L).nonEmpty)
    // the same micro-batch re-delivered after a crash-restart: no commit
    assert(engine.commitStreamBatch("stream.docs", batch, 0L).isEmpty)
    // and the next batch still lands
    assert(engine.commitStreamBatch("stream.docs",
      Seq(IngestDoc(2, "b")).toDF(), 1L).nonEmpty)

    val t = IcebergTable.load(s"$wh/stream/docs")
    assert(t.metadata.snapshots.size == 2)
    assert(ScanPlanner.readTable(spark, t).count() == 2L)
  }

  test("two streaming queries keep disjoint batch-id spaces") {
    val wh = Files.createTempDirectory("graft-ingest3-wh").toString
    val engine = new Engine(spark, wh)
    Files.createDirectories(java.nio.file.Paths.get(s"$wh/stream"))
    engine.createTable("stream.docs", StructType(Seq(
      StructField("doc_id", LongType), StructField("body", StringType))))

    val s2 = spark
    import s2.implicits._
    // query A is already at batch 5; query B starting at batch 0 must
    // NOT be suppressed by A's higher watermark
    assert(engine.commitStreamBatch("stream.docs",
      Seq(IngestDoc(1, "a")).toDF(), 5L, queryId = "qA").nonEmpty)
    assert(engine.commitStreamBatch("stream.docs",
      Seq(IngestDoc(2, "b")).toDF(), 0L, queryId = "qB").nonEmpty)
    // but each query's own re-delivery is still skipped
    assert(engine.commitStreamBatch("stream.docs",
      Seq(IngestDoc(1, "a")).toDF(), 5L, queryId = "qA").isEmpty)
    assert(engine.commitStreamBatch("stream.docs",
      Seq(IngestDoc(2, "b")).toDF(), 0L, queryId = "qB").isEmpty)

    val t = IcebergTable.load(s"$wh/stream/docs")
    assert(t.metadata.snapshots.size == 2)
    assert(ScanPlanner.readTable(spark, t).count() == 2L)
  }

  test("idempotence survives snapshot expiration (property watermark)") {
    val wh = Files.createTempDirectory("graft-ingest4-wh").toString
    val engine = new Engine(spark, wh)
    Files.createDirectories(java.nio.file.Paths.get(s"$wh/stream"))
    engine.createTable("stream.docs", StructType(Seq(
      StructField("doc_id", LongType), StructField("body", StringType))))

    val s2 = spark
    import s2.implicits._
    assert(engine.commitStreamBatch("stream.docs",
      Seq(IngestDoc(1, "a")).toDF(), 0L, queryId = "q1").nonEmpty)
    assert(engine.commitStreamBatch("stream.docs",
      Seq(IngestDoc(2, "b")).toDF(), 1L, queryId = "q1").nonEmpty)
    // expire EVERY streaming snapshot except the current one; the
    // summary-based watermark is gone for batch 0
    graft.ops.Maintenance.expireSnapshots(s"$wh/stream/docs",
      olderThanMs = System.currentTimeMillis() + 60000, retainLast = 1)
    // a re-delivered batch 0 must still be skipped — the table property
    // high-water mark survives expiration
    assert(engine.commitStreamBatch("stream.docs",
      Seq(IngestDoc(1, "a")).toDF(), 0L, queryId = "q1").isEmpty)
    assert(engine.commitStreamBatch("stream.docs",
      Seq(IngestDoc(1, "a")).toDF(), 1L, queryId = "q1").isEmpty)
    // and genuinely new batches land
    assert(engine.commitStreamBatch("stream.docs",
      Seq(IngestDoc(3, "c")).toDF(), 2L, queryId = "q1").nonEmpty)
    val t = IcebergTable.load(s"$wh/stream/docs")
    assert(ScanPlanner.readTable(spark, t)
      .as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }
}
