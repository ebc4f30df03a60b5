package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.api.Engine
import graft.meta.TableWriter
import graft.ops.TextStats

/** END-TO-END derived-table pipeline over the streaming surface: a raw
  * table's commits stream through the table source, a batch-expression
  * quality filter, and the exactly-once ingest sink into a clean table —
  * the "bronze → silver" shape a training-data pipeline runs
  * continuously. Asserts the streamed result equals the batch-computed
  * equivalent after multiple incremental commits. */
class StreamingPipelineSpec extends SparkSpec {

  import spark.implicits._

  test("raw commits stream through a quality filter into a derived table, exactly once") {
    val wh = Files.createTempDirectory("graft-pipe-wh").toString
    val engine = new Engine(spark, wh)
    Files.createDirectories(java.nio.file.Paths.get(s"$wh/lake"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    engine.createTable("lake.raw", schema)
    engine.createTable("lake.clean", schema)
    val rawDir = s"$wh/lake/raw"

    val good = "A perfectly reasonable sentence about analytics engines."
    val noisy = "@@@@ 111 ???? !!!! ####"
    TableWriter.append(spark, rawDir,
      Seq((1L, good), (2L, noisy)).toDF("doc_id", "text"))

    val filtered = spark.readStream
      .format("graft.streaming.TableStreamProvider")
      .option("tableDir", rawDir)
      .load()
      .filter(TextStats.qualityScore(col("text")) >= 0.4)
      .select("doc_id", "text")
    val ckpt = Files.createTempDirectory("graft-pipe-ckpt").toString
    val q = engine.appendStream("lake.clean", filtered, ckpt)
    try {
      q.processAllAvailable()
      assert(engine.readTable("lake.clean").select("doc_id")
        .as[Long].collect().toSeq == Seq(1L))

      // two more raw commits land incrementally — only the good rows flow
      TableWriter.append(spark, rawDir,
        Seq((3L, good + " Again with words."), (4L, noisy)).toDF("doc_id", "text"))
      TableWriter.append(spark, rawDir,
        Seq((5L, good + " More clean prose here.")).toDF("doc_id", "text"))
      q.processAllAvailable()

      val streamed = engine.readTable("lake.clean")
        .select("doc_id", "text").as[(Long, String)].collect().toSet
      val batch = engine.readTable("lake.raw")
        .filter(TextStats.qualityScore(col("text")) >= 0.4)
        .select("doc_id", "text").as[(Long, String)].collect().toSet
      assert(streamed == batch)
      assert(streamed.map(_._1) == Set(1L, 3L, 5L))

      // each processed micro-batch became exactly one append snapshot,
      // every one stamped with its batch id (exactly-once bookkeeping)
      val snaps = engine.load("lake.clean").metadata.snapshots
      assert(snaps.nonEmpty &&
        snaps.forall(_.summary.contains("streaming-batch-id")))
    } finally q.stop()
  }
}
