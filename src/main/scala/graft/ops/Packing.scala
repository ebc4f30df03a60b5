package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence assembly for LLM training pipelines.
  *
  * [[packSequences]]: concatenating short documents into fixed-budget
  * training sequences ("sequence packing"). Documents are laid out in a
  * deterministic order inside each group (corpus/source) and assigned to
  * the bin their cumulative size prefix falls into — the standard
  * streaming-packing approximation (bin = floor(prefix_before / budget)),
  * which is one window shuffle per group at any scale, no driver state.
  *
  * [[chunkSpans]]: sliding-window chunking (RAG/embedding prep) —
  * `window`-sized spans every `stride` characters. The span table is
  * derived with `sequence` + `explode` (codegen'd, no UDF); all
  * arithmetic is integral so the result is engine-exact.
  */
object Packing {

  /** Adds `seq_id`: the training-sequence bin of each row within
    * `groupCol`, packing by `sizeCol` under `budget` in `orderCol`
    * order. One window shuffle per call. */
  def packSequences(
      df: DataFrame, groupCol: String, orderCol: String,
      sizeCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__prefix", coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      // integral DIV (not float-divide-then-cast): bit-exact at any scale
      .withColumn("seq_id", expr(s"CAST(__prefix DIV $budget AS BIGINT)"))
      .drop("__prefix")
  }

  /** One row per (doc, span): `span_start` every `stride` chars,
    * `span_len = min(window, n - span_start)`. Rows with `n <= 0` chunk
    * to nothing. */
  def chunkSpans(
      df: DataFrame, sizeCol: String, window: Int, stride: Int): DataFrame = {
    require(stride > 0 && window >= stride, "need window >= stride > 0")
    df.filter(col(sizeCol) > 0)
      .withColumn("span_start",
        explode(sequence(lit(0L), col(sizeCol) - 1, lit(stride.toLong))))
      .withColumn("span_len",
        least(lit(window.toLong), col(sizeCol) - col("span_start")))
  }

  /** Sequence-LENGTH BUCKETING for batch assembly: adds `len_bucket` in
    * `[1, nBuckets]` — equal-frequency buckets split at the exact
    * `i/nBuckets` percentiles of `sizeCol`. Co-batching sequences from
    * one bucket bounds padding waste (the standard length-grouped
    * batching trick). Scale shape: ONE distributed percentile aggregate
    * (a 1-row frame broadcast back over the data — never a global sort
    * or single-partition ntile) + a map-side comparison per row. Ties on
    * a boundary go to the lower bucket (strict `>`), so the assignment
    * is deterministic and engine-exact for integer sizes. */
  def lengthBuckets(
      df: DataFrame, sizeCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, "need at least 2 buckets")
    val probs = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val bounds = df.agg(
      probs.zipWithIndex.map { case (p, i) =>
        expr(s"percentile($sizeCol, $p)").as(s"__q$i") }.head,
      probs.zipWithIndex.drop(1).map { case (p, i) =>
        expr(s"percentile($sizeCol, $p)").as(s"__q$i") }: _*)
    val bucket = probs.indices
      .map(i => when(col(sizeCol).cast("double") > col(s"__q$i"), 1).otherwise(0))
      .reduce(_ + _) + lit(1)
    df.crossJoin(broadcast(bounds))
      .withColumn("len_bucket", bucket)
      .drop(probs.indices.map(i => s"__q$i"): _*)
  }
}
