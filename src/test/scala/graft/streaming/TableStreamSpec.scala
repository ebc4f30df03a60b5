package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.meta.{IcebergTable, TableCreator, TableWriter}

/** The streaming TABLE source: committed rows arrive incrementally with
  * their commit snapshot id; change commits fail fast unless skipped. */
class TableStreamSpec extends SparkSpec {

  import spark.implicits._

  test("appended rows stream per commit and live appends are picked up") {
    val dir = Files.createTempDirectory("graft-tstream").toString + "/t"
    TableCreator.create(dir, StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    val c1 = TableWriter.append(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val c2 = TableWriter.append(spark, dir, Seq((3L, "c")).toDF("id", "v"))

    val q = spark.readStream
      .format("graft.streaming.TableStreamProvider")
      .option("tableDir", dir)
      .load()
      .writeStream.format("memory").queryName("tstream")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT id, v, _commit_snapshot_id FROM tstream")
        .as[(Long, String, Long)].collect().toSet
      assert(got == Set(
        (1L, "a", c1.snapshotId), (2L, "b", c1.snapshotId),
        (3L, "c", c2.snapshotId)))

      // a live append lands in the next micro-batch
      val c3 = TableWriter.append(spark, dir, Seq((4L, "d")).toDF("id", "v"))
      q.processAllAvailable()
      val after = spark.sql(
        s"SELECT id FROM tstream WHERE _commit_snapshot_id = ${c3.snapshotId}")
        .as[Long].collect().toSeq
      assert(after == Seq(4L))
    } finally q.stop()
  }

  test("change commits fail fast, or stream appends-only with skip-change-commits") {
    val dir = Files.createTempDirectory("graft-tstream2").toString + "/t"
    TableCreator.create(dir, StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    TableWriter.append(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    TableWriter.deleteWhere(spark, dir, col("id") === 1L).get
    val c3 = TableWriter.append(spark, dir, Seq((5L, "e")).toDF("id", "v"))

    // strict mode: the delete commit aborts the stream
    val strict = spark.readStream
      .format("graft.streaming.TableStreamProvider")
      .option("tableDir", dir)
      .load()
      .writeStream.format("memory").queryName("tstrict")
      .outputMode("append").start()
    try {
      val err = intercept[Exception] { strict.processAllAvailable() }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert(msgs(err).exists(_.contains("skip-change-commits")))
    } finally strict.stop()

    // skip mode: appended rows before AND after the delete commit stream
    val q = spark.readStream
      .format("graft.streaming.TableStreamProvider")
      .option("tableDir", dir)
      .option("skip-change-commits", "true")
      .load()
      .writeStream.format("memory").queryName("tskip")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT id FROM tskip").as[Long].collect().toSet
      assert(got == Set(1L, 2L, 5L)) // raw appends; MoR delete skipped
      assert(spark.sql(
        s"SELECT count(*) FROM tskip WHERE _commit_snapshot_id = ${c3.snapshotId}")
        .as[Long].head() == 1L)
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains all existing commits, then stops") {
    val dir = Files.createTempDirectory("graft-tstream-an").toString + "/t"
    TableCreator.create(dir, StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    TableWriter.append(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    TableWriter.append(spark, dir, Seq((3L, "c")).toDF("id", "v"))

    val q = spark.readStream
      .format("graft.streaming.TableStreamProvider")
      .option("tableDir", dir)
      .load()
      .writeStream.format("memory").queryName("tavnow")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    // AvailableNow terminates on its own once the pinned offset is reached
    assert(q.awaitTermination(60000), "AvailableNow query did not self-terminate")
    val got = spark.sql("SELECT id FROM tavnow").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L))
  }

  test("skip-change-commits skips the WHOLE overwrite snapshot — no survivor re-emit") {
    val dir = Files.createTempDirectory("graft-tstream3").toString + "/t"
    TableCreator.create(dir, StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    TableWriter.append(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // copy-on-write UPDATE: the overwrite commit's ADDED file holds the
    // rewritten survivors (1,a)+(2,B) — rows a naive reader re-emits
    val up = graft.ops.Delete.updateWhere(spark, dir,
      col("id") === 2L, Map("v" -> org.apache.spark.sql.functions.lit("B"))).get
    val c3 = TableWriter.append(spark, dir, Seq((5L, "e")).toDF("id", "v"))

    // strict mode fails fast on the CoW commit (it's overwrite, not replace)
    val strict = spark.readStream
      .format("graft.streaming.TableStreamProvider")
      .option("tableDir", dir)
      .load()
      .writeStream.format("memory").queryName("tcowstrict")
      .outputMode("append").start()
    try {
      val err = intercept[Exception] { strict.processAllAvailable() }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert(msgs(err).exists(_.contains("skip-change-commits")))
    } finally strict.stop()

    // skip mode: the overwrite snapshot contributes NOTHING — (1,a) and
    // (2,b) arrive once from the original append, (2,B) never appears
    val q = spark.readStream
      .format("graft.streaming.TableStreamProvider")
      .option("tableDir", dir)
      .option("skip-change-commits", "true")
      .load()
      .writeStream.format("memory").queryName("tcowskip")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT id, v FROM tcowskip")
        .as[(Long, String)].collect().toSeq
      assert(got.sorted == Seq((1L, "a"), (2L, "b"), (5L, "e")))
      assert(spark.sql(
        s"SELECT count(*) FROM tcowskip WHERE _commit_snapshot_id = ${up.snapshotId}")
        .as[Long].head() == 0L)
    } finally q.stop()
  }

  test("stream reads pre-rename commits' data by field id under the new name") {
    val dir = Files.createTempDirectory("graft-tstream-ren").toString + "/t"
    TableCreator.create(dir, StructType(Seq(
      StructField("id", LongType), StructField("v", LongType))))
    TableWriter.append(spark, dir, Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))
    graft.meta.SchemaEvolution.renameColumn(dir, "v", "value")
    TableWriter.append(spark, dir, Seq((3L, 30L)).toDF("id", "value"))

    val q = spark.readStream
      .format("graft.streaming.TableStreamProvider")
      .option("tableDir", dir)
      .load()
      .writeStream.format("memory").queryName("tstreamren")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT id, value FROM tstreamren")
        .as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 10L), (2L, 20L), (3L, 30L)),
        s"pre-rename generation must stream its values under the new name, got $got")
    } finally q.stop()
  }
}
