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

  test("full ingest loop: quality gate -> exact dedup -> near-dup index gate -> corpus append, batch-parity") {
    import graft.ops.{Dedup, NearDupIndex, Selection}
    import graft.streaming.EventStreams
    val wh = Files.createTempDirectory("graft-loop-wh").toString
    val engine = new Engine(spark, wh)
    Files.createDirectories(java.nio.file.Paths.get(s"$wh/lake"))
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("ts", org.apache.spark.sql.types.TimestampType)))
    engine.createTable("lake.raw", docSchema)
    engine.createTable("lake.corpus", docSchema)
    engine.createTable("lake.corpus_batch", docSchema)
    val rawDir = s"$wh/lake/raw"

    // frozen quality classifier, batch-trained once on a labeled sample
    // of the same distribution the stream carries (clean prose vs noise)
    val goodA = "the quick brown fox jumps over the lazy dog near the river bank today"
    val trainDocs = Seq(
      (1L, goodA),
      (2L, "data pipelines stream documents through gates before training begins"),
      (3L, "entirely different clean text about storage formats and engines"),
      (4L, "@@@@ #### 1111 ???? !!!! %%%% &&&& ****"),
      (5L, "~~~~ |||| 0101010101 ^^^^ ```` {{{{ }}}}")).toDF("doc_id", "text")
    val (weights, _) = Selection.perceptronWeights(
      trainDocs, col("doc_id") <= 3L, rounds = 10)

    // standing corpus seeds the near-dup index; the dup-cluster ledger
    // rides the stream gate (one fold per colliding micro-batch)
    val idx = new NearDupIndex(engine, "lake.nd_index")
    idx.create()
    idx.bootstrap(Seq((100L, goodA)).toDF("doc_id", "text"))
    val comps = new graft.ops.ComponentIndex(engine, "lake.comps")
    comps.create()

    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-06-01 10:$m%02d:00")
    val garbage = "@@@@ 1111 ???? !!!! #### %%%% &&&&"
    val cleanB = "data pipelines stream documents through gates before training begins"
    val cleanC = "entirely different clean text about storage formats and engines"
    val nearB = "data pipelines stream documents through gates before training starts"
    val commit1 = Seq(
      (10L, goodA, ts(1)),        // near-dup (exact) of the standing corpus -> index gate
      (11L, cleanB, ts(2)),       // clean, novel -> admitted
      (13L, garbage, ts(3)))      // fails the quality gate
    val commit2 = Seq(
      (12L, cleanB, ts(4)),       // exact duplicate of 11 -> digest dedup
      (14L, cleanC, ts(5)),       // clean, novel -> admitted
      (15L, nearB, ts(6)))        // near-dup of 11 (admitted last batch) -> index gate
    TableWriter.append(spark, rawDir, commit1.toDF("doc_id", "text", "ts"))

    // the WHOLE ingest loop as one stream graph
    val raw = spark.readStream
      .format("graft.streaming.TableStreamProvider")
      .option("tableDir", rawDir).load()
      .select("doc_id", "text", "ts")
    val gated = EventStreams.dedupStream(
      EventStreams.qualityGateStream(raw, weights))
    val ckpt = Files.createTempDirectory("graft-loop-ckpt").toString
    val q = idx.admitStream(gated, ckpt, Some(comps)) { survivors =>
      engine.append("lake.corpus", survivors.select("doc_id", "text", "ts"))
      ()
    }
    try {
      q.processAllAvailable()
      TableWriter.append(spark, rawDir, commit2.toDF("doc_id", "text", "ts"))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = engine.readTable("lake.corpus")
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    assert(streamed.map(_._1) == Set(11L, 14L), streamed)

    // BATCH PARITY: the same input through the batch pipeline — quality
    // filter, deterministic min-id digest dedup, index admission with
    // intra-batch dedup — lands the identical corpus and index state
    val idx2 = new NearDupIndex(engine, "lake.nd_index2")
    idx2.create()
    idx2.bootstrap(Seq((100L, goodA)).toDF("doc_id", "text"))
    val rawAll = (commit1 ++ commit2).toDF("doc_id", "text", "ts")
    val qualityKept = rawAll.filter(
      Selection.marginColumn(weights, col("text")) > 0)
    val keepIds = qualityKept
      .withColumn("digest", Dedup.contentDigest())
      .groupBy("digest").agg(org.apache.spark.sql.functions.min("doc_id").as("doc_id"))
      .select("doc_id")
    val deduped = qualityKept.join(keepIds, Seq("doc_id"), "left_semi")
    // ledger twin: the batch path's collision structure is the
    // corpus-vs-batch pairs PLUS the intra-batch pairs (the stream saw
    // the latter as batch-vs-index because earlier admissions were
    // already indexed) — pairs captured against the PRE-admission index
    val dedupSigs = Dedup.bandSignatures(
      deduped, idx2.numPerm, idx2.rowsPerBand).localCheckpoint()
    val twinPairs = Dedup.bandCollisionPairs(dedupSigs, idx2.signatures)
      .unionByName(Dedup.bandCollisionPairs(dedupSigs, dedupSigs)
        .filter(col("doc_id") =!= col("corpus_doc_id")))
      .select(col("doc_id").as("a_id"), col("corpus_doc_id").as("b_id"))
      .localCheckpoint()
    val admitted = idx2.admit(deduped, dedupWithinBatch = true)
    engine.append("lake.corpus_batch", admitted.select("doc_id", "text", "ts"))

    val batch = engine.readTable("lake.corpus_batch")
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    assert(batch == streamed, s"batch $batch vs streamed $streamed")
    // the two indexes hold identical signature sets (corpus + admissions)
    val sigs1 = idx.signatures.as[(Long, Int, Long)].collect().toSet
    val sigs2 = idx2.signatures.as[(Long, Int, Long)].collect().toSet
    assert(sigs1 == sigs2)

    // LEDGER PARITY: the per-micro-batch incremental folds and one
    // batch fold over the equivalent collision structure land the
    // identical persisted assignment
    val comps2 = new graft.ops.ComponentIndex(engine, "lake.comps2")
    comps2.create()
    comps2.fold(twinPairs)
    def ledger(c: graft.ops.ComponentIndex) = c.assignments.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ledger(comps) == ledger(comps2),
      s"stream ${ledger(comps)} vs batch ${ledger(comps2)}")
    assert(ledger(comps).nonEmpty, "fixture must exercise the ledger")
  }
}
