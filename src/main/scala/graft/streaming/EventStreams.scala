package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Event-stream transforms for the training-data pipeline's streaming
  * regime (`readStream` → transforms → `writeStream`): watermarked
  * event-time windows and custom keyed state via `mapGroupsWithState`.
  * The reference's only stream is the snapshot log
  * ([[SnapshotWatchSource]]); these are the north-star upgrades a
  * large-scale ingest pipeline needs (late-data tolerance, per-key state).
  */
object EventStreams {

  final case class Event(user_id: Long, event_type: String, ts: java.sql.Timestamp)
  final case class UserState(count: Long)
  final case class UserActivity(user_id: Long, events: Long)

  implicit val eventEnc: Encoder[Event] = Encoders.product[Event]
  implicit val stateEnc: Encoder[UserState] = Encoders.product[UserState]
  implicit val activityEnc: Encoder[UserActivity] = Encoders.product[UserActivity]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  /** Watermarked hourly counts per event type: late events beyond the
    * watermark are dropped, window state is bounded — the 100 TB/day
    * streaming-aggregation shape. */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"))

  /** Per-user running event count with explicit keyed state
    * (`mapGroupsWithState`): state lives in the state store, sized by
    * distinct keys, independent of stream volume. */
  def runningUserCounts(events: Dataset[Event]): Dataset[UserActivity] =
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserActivity](GroupStateTimeout.NoTimeout) {
        (user, rows, state) =>
          val total = state.getOption.map(_.count).getOrElse(0L) + rows.size
          state.update(UserState(total))
          UserActivity(user, total)
      }

  /** Event-time SESSION windows per user: a session extends while events
    * arrive within `gap` of each other and closes at the watermark — the
    * standard sessionization shape (state per open session, bounded by
    * the watermark, merging handled by Spark's session-window state
    * store). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Stream-STREAM interval join: attribute each purchase to clicks by
    * the same user within `within` BEFORE the purchase. Both sides are
    * watermarked and the join condition bounds event time on both ends,
    * so Spark can expire join state — the only stream-stream join shape
    * whose state stays bounded at pipeline scale. */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      within: String = "1 hour", watermark: String = "10 minutes"): DataFrame = {
    val c = clicks.select(col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases.select(col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", watermark)
    c.join(p, expr(
        s"user_id = p_user AND purchase_ts >= click_ts AND " +
          s"purchase_ts <= click_ts + interval $within"))
      .select("user_id", "click_ts", "purchase_ts", "value")
  }

  /** Streaming ORDERED FUNNEL: per-user state machine advancing through
    * `steps` as events arrive, emitting one [[FunnelHit]] the moment a
    * user completes each next step (`flatMapGroupsWithState` — the
    * custom-keyed-state shape; state is one `(level, lastTs)` pair per
    * user, independent of stream volume).
    *
    * Within a batch, events are processed in event-time order, so the
    * completion times match the batch [[graft.ops.Funnel.funnel]]
    * first-touch semantics exactly when each user's events arrive in
    * one batch. Across batches the advance is greedy: a LATE event that
    * event-time-precedes an already-recorded completion cannot retract
    * it (streaming funnels trade that retraction for bounded state).
    * Production deployments add `GroupStateTimeout.EventTimeTimeout` to
    * expire users who stall mid-funnel; kept `NoTimeout` here so the
    * semantics stay deterministic for the spec. */
  def funnelProgress(
      events: Dataset[Event], steps: Seq[String]): Dataset[FunnelHit] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) { (user, rows, state) =>
        var (level, lastTs) = state.getOption
          .map(s => (s.level, s.last_ts)).getOrElse((0, Long.MinValue))
        val hits = Seq.newBuilder[FunnelHit]
        for (e <- rows.toSeq.sortBy(_.ts.getTime) if level < steps.length)
          if (e.event_type == steps(level) && e.ts.getTime >= lastTs) {
            hits += FunnelHit(user, level, steps(level), e.ts)
            lastTs = e.ts.getTime
            level += 1
          }
        state.update(FunnelState(level, lastTs))
        hits.result().iterator
      }
  }

  final case class FunnelState(level: Int, last_ts: Long)
  final case class FunnelHit(
      user_id: Long, step_no: Int, step: String, ts: java.sql.Timestamp)
  implicit val funnelStateEnc: Encoder[FunnelState] = Encoders.product[FunnelState]
  implicit val funnelHitEnc: Encoder[FunnelHit] = Encoders.product[FunnelHit]

  /** Streaming NEAR-DUP gate: minhash band signatures of incoming docs
    * (computed per row — [[graft.ops.Dedup.rowBandSignatures]], a pure
    * projection so it is legal mid-stream) joined against a precomputed
    * STATIC band-bucket index of the corpus
    * ([[graft.ops.Dedup.bandSignatures]] output, typically read from a
    * table the batch pipeline maintains). Emits one row per
    * (stream doc, corpus doc, band) bucket collision; stream-static
    * inner joins are stateless, so state is zero regardless of stream
    * volume and the corpus index can be broadcast when it fits.
    * Consumers dedupe multi-band collisions with
    * `dropDuplicatesWithinWatermark` on (doc_id, corpus_doc_id) — kept
    * out of this operator so callers choose the watermark. */
  def nearDupStream(docs: DataFrame, corpusBands: DataFrame): DataFrame = {
    val idx = corpusBands.select(col("doc_id").as("corpus_doc_id"),
      col("band"), col("band_sig"))
    graft.ops.Dedup.rowBandSignatures(docs)
      .join(idx, Seq("band", "band_sig"))
      .filter(col("doc_id") =!= col("corpus_doc_id"))
      .select("doc_id", "corpus_doc_id", "band")
  }

  /** Streaming exact dedup on a content digest:
    * `dropDuplicatesWithinWatermark` keys the state store on the 32-hex
    * digest (never the document body) and EXPIRES state past the
    * watermark — the only dedup shape whose state stays bounded on an
    * unbounded corpus stream. Batch dedup of the same corpus is
    * [[graft.ops.Dedup.exactClusters]]. */
  def dedupStream(docs: DataFrame, tsCol: String = "ts",
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("digest", graft.ops.Dedup.contentDigest())
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("digest")

  /** Streaming QUALITY gate under a frozen trained classifier: keep only
    * documents the batch-trained perceptron
    * ([[graft.ops.Selection.perceptronWeights]]) scores positive. The
    * margin is one stateless kernel projection (feature bag → literal-map
    * weight fold — no join, no aggregate, no state store), so the gate
    * composes with any watermark/dedup stage and scales with the stream
    * alone. The train-offline / gate-online split is the standard
    * quality-filter deployment (CCNet/LLaMA-style). */
  def qualityGateStream(docs: DataFrame, weights: Map[Long, Long],
      buckets: Int = 256, textCol: String = "text"): DataFrame =
    docs.filter(
      graft.ops.Selection.marginColumn(weights, col(textCol), buckets) > 0)
}
