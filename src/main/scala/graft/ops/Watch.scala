package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.meta.IcebergTable
import graft.rel.MetaRelations

/** Snapshot watch (ref `snapshots --watch`, `cli.py:959-1023`): re-poll the
  * metadata, tag snapshot ids not seen before (SO2 — the reference's
  * `current_ids - seen_ids` set difference becomes an anti-join).
  * No watermarks/event-time semantics exist in the reference; the poll loop
  * is the faithful shape, and errors retry like `cli.py:1017-1020`.
  */
object Watch {

  final case class Poll(newSnapshots: DataFrame, seenIds: Set[Long])

  /** One poll: reload the table, anti-join against previously seen ids. */
  def poll(spark: SparkSession, tableDir: String, seen: Set[Long]): Poll = {
    val t = IcebergTable.load(tableDir)
    val snaps = MetaRelations.snapshots(spark, t)
    val newOnes =
      if (seen.isEmpty) snaps
      else {
        val seenDf = spark.createDataFrame(
          seen.toSeq.sorted.map(Tuple1(_))).toDF("snapshot_id")
        snaps.join(broadcast(seenDf), Seq("snapshot_id"), "left_anti")
      }
    Poll(
      newOnes.withColumn("is_new", lit(seen.nonEmpty)).orderBy("snapshot_id"),
      seen ++ t.metadata.snapshots.map(_.snapshotId))
  }

  /** Poll loop with injected clock/callback (testable without sleeping).
    * Returns the final seen-id set. Errors are retried (logged), matching
    * the reference's resilience. */
  def watch(
      spark: SparkSession,
      tableDir: String,
      rounds: Int,
      onUpdate: DataFrame => Unit,
      sleep: () => Unit = () => Thread.sleep(1000)): Set[Long] = {
    var seen = Set.empty[Long]
    (0 until rounds).foreach { i =>
      try {
        val p = poll(spark, tableDir, seen)
        seen = p.seenIds
        onUpdate(p.newSnapshots)
      } catch {
        case e: Exception =>
          System.err.println(s"[watch] poll failed (retrying): ${e.getMessage}")
      }
      if (i < rounds - 1) sleep()
    }
    seen
  }
}
