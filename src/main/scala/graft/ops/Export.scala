package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINING-EXPORT WRITER — the physical half of [[Sampling.shardAssign]]:
  * materialize a frame as `nShards` deterministic shard directories of
  * parquet, each internally ordered by the reproducible hash-shuffle
  * position. Re-running the export over the same input produces
  * byte-identical shard CONTENTS (same rows, same order) regardless of
  * input partitioning — the property a resumable training job needs.
  *
  * Scale shape: one hash repartition ON THE SHARD KEY (each output shard
  * is written by exactly one task — no post-write merge), an in-partition
  * sort, and a `partitionBy` parquet write. No driver-side data movement.
  */
object Export {

  /** Write `df` as `outDir/shard=N/...parquet`, one directory per shard.
    * Returns the per-shard row counts (shard → rows) read back from the
    * committed files, so callers can assert completeness cheaply.
    *
    * `key` must be UNIQUE per row — the within-shard order is
    * `(hash(key), key)`, so duplicate keys would tie and break the
    * byte-identical re-run guarantee silently (ties order by arrival).
    * The writer verifies this with one cheap aggregate and fails fast
    * instead. */
  def writeShards(df: DataFrame, key: Column, nShards: Int, outDir: String): Map[Int, Long] = {
    val Array(total, distinct) = df.agg(
      count(lit(1)), countDistinct(key)).head().toSeq.map(_.asInstanceOf[Long]).toArray
    require(total == distinct,
      s"writeShards key is not unique ($distinct distinct of $total rows) — " +
        "duplicate keys tie in the shard order and break deterministic re-runs")
    val assigned = Sampling.shardAssign(df, key, nShards)
    assigned
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    df.sparkSession.read.parquet(outDir)
      .groupBy("shard").count().collect()
      .map(r => r.getAs[Int]("shard") -> r.getAs[Long]("count")).toMap
  }

  /** Write `df` as `outDir/shard=N/...txt` JSON-LINES shards — the
    * interchange format training loaders consume directly. Same
    * determinism contract as [[writeShards]] (unique key, one task per
    * shard, `(hash(key), key)` in-shard order); each line is the row's
    * columns as a JSON object via `to_json` (codegen'd, executor-side —
    * no driver serialization). Re-running over the same input yields
    * byte-identical shard text. Returns shard → line counts. */
  def writeJsonlShards(
      df: DataFrame, key: Column, nShards: Int, outDir: String): Map[Int, Long] = {
    val Array(total, distinct) = df.agg(
      count(lit(1)), countDistinct(key)).head().toSeq.map(_.asInstanceOf[Long]).toArray
    require(total == distinct,
      s"writeJsonlShards key is not unique ($distinct distinct of $total rows) — " +
        "duplicate keys tie in the shard order and break deterministic re-runs")
    val assigned = Sampling.shardAssign(df, key, nShards)
    val payload = assigned
      .withColumn("value", to_json(struct(df.columns.map(col).toIndexedSeq: _*)))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))
      .select("shard", "value")
    payload.write.mode("overwrite").partitionBy("shard").text(outDir)
    df.sparkSession.read.schema("value STRING, shard INT").text(outDir)
      .groupBy("shard").count().collect()
      .map(r => r.getAs[Int]("shard") -> r.getAs[Long]("count")).toMap
  }
}
