package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-overlap detection (ref `formatters.py:606-658`): the reference
  * counts overlapping [lower,upper] file ranges exactly via an O(N²) pair
  * loop when N ≤ 1000, and falls back to an O(N log N) sweep-line boolean
  * above that (`formatters.py:632-653`, limit at `:341`).
  *
  * Spark re-expression of the same adaptive choice:
  *   - exact pair count → theta self-join (broadcast-nested-loop on the
  *     small interval frame — intervals are one row per group/file, already
  *     aggregated, so the broadcast is metadata-sized);
  *   - sweep-line → a running-max window (`max(hi) OVER (ORDER BY lo ROWS
  *     UNBOUNDED PRECEDING TO 1 PRECEDING)`), a single sort, no join —
  *     this is the 100 TB path.
  */
object Overlap {

  /** Build [lo,hi] intervals per key: one shuffle on `keyCol`. */
  def intervals(df: DataFrame, keyCol: String, boundCol: String): DataFrame =
    df.groupBy(col(keyCol).as("k"))
      .agg(min(col(boundCol)).as("lo"), max(col(boundCol)).as("hi"))

  /** Exact overlapping-pair count via theta self-join
    * (ref `formatters.py:643-653`). Intended for ≤ ~1000 intervals. */
  def pairCount(iv: DataFrame): DataFrame = {
    val a = iv.alias("a")
    val b = iv.alias("b")
    a.join(
        b,
        col("a.lo") <= col("b.hi") && col("b.lo") <= col("a.hi") &&
          col("a.k") < col("b.k"))
      .agg(count(lit(1)).as("pairs_cnt"))
  }

  /** Sweep-line: per interval, does it overlap any interval that starts
    * before it (ref `formatters.py:632-641`). O(N log N), join-free. */
  def sweep(iv: DataFrame): DataFrame = {
    val w = Window.orderBy("lo", "k").rowsBetween(Window.unboundedPreceding, -1)
    iv.withColumn("run_max", max(col("hi")).over(w))
      .select(col("k"), coalesce(col("lo") <= col("run_max"), lit(false)).as("overlapped"))
  }

  /** The reference's adaptive switch (`formatters.py:632-653`): exact pairs
    * below the limit, sweep boolean above — a mini cost-based plan choice
    * driven by a cheap count. */
  def adaptive(iv: DataFrame, exactLimit: Long = 1000L): DataFrame = {
    val n = iv.count()
    if (n <= exactLimit) pairCount(iv) else sweep(iv).agg(
      sum(when(col("overlapped"), 1L).otherwise(0L)).as("overlapping_cnt"))
  }
}
