package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.EventStreams.Event

class EventStreamsSpec extends SparkSpec {

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  final case class Doc(doc_id: Long, text: String, ts: Timestamp)
  final case class Pur(user_id: Long, ts: Timestamp, value: Double)

  test("streaming quality gate: frozen perceptron weights filter the ingest stream") {
    val s2 = spark
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s2.sqlContext
    // train OFFLINE on a labeled seed with disjoint vocabularies
    val seed = Seq(
      (1L, "good clean prose reads well here", "en", "a", 0L),
      (2L, "good clean text reads well here", "en", "a", 0L),
      (3L, "spam junk noise garbage filler spam", "xx", "b", 0L),
      (4L, "junk noise spam garbage filler junk", "xx", "b", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val (w, _) = graft.ops.Selection.perceptronWeights(
      seed, org.apache.spark.sql.functions.col("lang") === "en",
      buckets = 64, rounds = 3)

    // gate ONLINE: the stream keeps positive-margin docs only
    val input = MemoryStream[Doc]
    val q = EventStreams.qualityGateStream(input.toDF(), w, buckets = 64)
      .writeStream.format("memory").queryName("quality_gate")
      .outputMode("append").trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    try {
      input.addData(
        Doc(10, "clean prose reads well", ts("10:00")),
        Doc(11, "spam junk noise garbage", ts("10:01")),
        Doc(12, "good clean text here", ts("10:02")))
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM quality_gate ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(kept == Seq(10L, 12L))
    } finally q.stop()
  }

  test("streaming dedup drops same-digest docs across batches within the watermark") {
    val s2 = spark
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s2.sqlContext
    val input = MemoryStream[Doc]
    val q = EventStreams.dedupStream(input.toDF())
      .writeStream.format("memory").queryName("dedup_docs")
      .outputMode("append").trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    try {
      input.addData(
        Doc(1, "the quick brown fox", ts("10:00")),
        Doc(2, "THE QUICK BROWN FOX  ", ts("10:01")), // same digest (lower+trim)
        Doc(3, "something else", ts("10:02")))
      q.processAllAvailable()
      input.addData(Doc(4, "the quick brown fox", ts("10:10"))) // dup in later batch
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM dedup_docs ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(1L, 3L)) // 2 and 4 deduped by state-store digest
    } finally q.stop()
  }

  test("watermarked windowed counts aggregate by event-time hour") {
    val s2 = spark
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s2.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    try {
      input.addData(
        Event(1, "click", ts("10:05")), Event(2, "click", ts("10:40")),
        Event(1, "view", ts("10:59")), Event(3, "click", ts("11:10")))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT window.start, event_type, cnt FROM win_counts ORDER BY 1, 2")
        .collect()
      assert(rows.map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSeq ==
        Seq(
          ("2024-01-01 10:00:00.0", "click", 2L),
          ("2024-01-01 10:00:00.0", "view", 1L),
          ("2024-01-01 11:00:00.0", "click", 1L)))
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to in-window clicks") {
    val s2 = spark
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s2.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Pur]
    val q = EventStreams.clickPurchaseJoin(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    try {
      clicks.addData(Event(1, "click", ts("10:00")), Event(2, "click", ts("08:00")))
      purchases.addData(Pur(1, ts("10:30"), 9.99), Pur(2, ts("10:30"), 5.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, value FROM attrib ORDER BY user_id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      // user 1's purchase is 30m after the click (in window); user 2's
      // click is 2.5h earlier (outside the 1h window) → no attribution
      assert(rows == Seq((1L, 9.99)))
    } finally q.stop()
  }

  test("session windows merge events within the gap and split across it") {
    val s2 = spark
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s2.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionCounts(input.toDF(), gap = "30 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    try {
      input.addData(
        Event(1, "click", ts("10:00")), Event(1, "view", ts("10:20")), // one session
        Event(1, "click", ts("12:00")),                                // gap > 30m → new
        Event(2, "click", ts("10:05")))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, n_events FROM sessions ORDER BY user_id, session_start")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows == Seq((1L, 2L), (1L, 1L), (2L, 1L)))
    } finally q.stop()
  }

  test("streaming funnel advances per-user state across batches, order enforced") {
    val s2 = spark
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s2.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.funnelProgress(input.toDS(), Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel_hits")
      .outputMode("append").trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    try {
      // batch 1: user 1 views+clicks (out of arrival order, in event-time
      // order once sorted); user 2's click precedes any view — no hits
      input.addData(
        Event(1, "click", ts("10:05")), Event(1, "view", ts("10:00")),
        Event(2, "click", ts("10:00")))
      q.processAllAvailable()
      // batch 2: user 1 purchases (state carried over); user 2 views —
      // the funnel starts only now
      input.addData(
        Event(1, "purchase", ts("10:10")), Event(2, "view", ts("10:06")))
      q.processAllAvailable()
      val hits = spark.sql(
        "SELECT user_id, step_no, step FROM funnel_hits ORDER BY user_id, step_no")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
      assert(hits == Seq(
        (1L, 0, "view"), (1L, 1, "click"), (1L, 2, "purchase"),
        (2L, 0, "view")))
    } finally q.stop()
  }

  test("streaming near-dup flags docs colliding with the static corpus index") {
    val s2 = spark
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s2.sqlContext
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "totally different reference material about databases"))
      .toDF("doc_id", "text")
    val index = graft.ops.Dedup.bandSignatures(corpus)
    val input = MemoryStream[Doc]
    val q = EventStreams.nearDupStream(input.toDF(), index)
      .writeStream.format("memory").queryName("near_dups")
      .outputMode("append").trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    try {
      input.addData(
        Doc(1, "the quick brown fox jumps over the lazy dog", ts("10:00")), // dup of 100
        Doc(2, "fresh unseen content nothing like the corpus", ts("10:01")))
      q.processAllAvailable()
      val hits = spark.sql(
        "SELECT DISTINCT doc_id, corpus_doc_id FROM near_dups ORDER BY doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(hits == Seq((1L, 100L)))
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates per-user counts across batches") {
    val s2 = spark
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s2.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.runningUserCounts(input.toDS())
      .writeStream.format("memory").queryName("user_counts")
      .outputMode("update").trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    try {
      input.addData(Event(1, "click", ts("10:00")), Event(1, "view", ts("10:01")),
        Event(2, "click", ts("10:02")))
      q.processAllAvailable()
      input.addData(Event(1, "click", ts("10:10")))
      q.processAllAvailable()
      val latest = spark.sql(
        "SELECT user_id, max(events) AS events FROM user_counts GROUP BY user_id ORDER BY user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(latest.toSeq == Seq((1L, 3L), (2L, 1L))) // state carried over batches
    } finally q.stop()
  }
}
