package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Health-report statistics: the Spark-first re-expression of the reference
  * engine's table-health collectors (ref `formatters.py:375-660` — file-size
  * stats, small-file detection, partition skew, column null rates, column
  * storage share, column bounds, freshness classification).
  *
  * Design notes for 100 TB scale:
  *   - Every function is a declarative DataFrame→DataFrame transform: one
  *     shuffle on the grouping keys at most, map-side partial aggregation
  *     for free, whole-stage codegen (no UDFs).
  *   - Global statistics ("vs table average") are computed as a 1-row
  *     aggregate that is `broadcast` cross-joined — never a second shuffle
  *     of the fact table and never a driver collect.
  *   - Money/size sums go through `DecimalType(18,2)`: per-value cast is
  *     deterministic and decimal addition is order-independent, so results
  *     are bit-stable across partitionings (doubles are not).
  */
object Health {
  val Money: DecimalType = DecimalType(18, 2)

  /** Order-independent exact sum of a double column, returned as double. */
  def moneySum(c: Column): Column = sum(c.cast(Money)).cast("double")

  /** A1/A14 — count/min/max/mean/median/sum (ref `formatters.py:420-443`).
    * Mean is derived from the exact decimal sum so it is bit-deterministic. */
  def fileStats(df: DataFrame, valueCol: String): DataFrame =
    df.agg(
        count(lit(1)).as("cnt"),
        min(col(valueCol)).as("min_val"),
        max(col(valueCol)).as("max_val"),
        round(median(col(valueCol)), 2).as("med_val"),
        moneySum(col(valueCol)).as("sum_val"))
      .withColumn("avg_val", round(col("sum_val") / col("cnt"), 2))

  /** A2 — conditional count per group (small-file detector,
    * ref `formatters.py:422,430-431`). */
  def conditionalCount(df: DataFrame, groupCol: String, pred: Column): DataFrame =
    df.groupBy(groupCol)
      .agg(
        sum(when(pred, 1L).otherwise(0L)).as("cnt_small"),
        count(lit(1)).as("cnt_total"))

  /** S4/A4 — per-partition record/size stats (ref `formatters.py:485-514`).
    * Single hash-aggregate shuffle on the partition keys. */
  def partitionStats(df: DataFrame, keys: Seq[String], qtyCol: String, sizeCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        moneySum(col(qtyCol)).as("sum_qty"),
        moneySum(col(sizeCol)).as("sum_size"))

  /** J6/A4 — skew flag: group count > 2× global average
    * (ref `formatters.py:500-507`). Input is the already-grouped frame
    * (one row per partition — metadata-scale), so the empty-frame window
    * is cheap by construction. */
  def skewFlags(grouped: DataFrame, cntCol: String): DataFrame = {
    val w = Window.partitionBy()
    grouped
      .withColumn("avg_raw", avg(col(cntCol)).over(w))
      .withColumn("skewed", col(cntCol) > lit(2) * col("avg_raw"))
      .withColumn("avg_cnt", round(col("avg_raw"), 4))
      .drop("avg_raw")
  }

  /** A4 — skew ratio `max(cnt)/avg(cnt)` (ref `formatters.py:508-511`). */
  def skewRatio(grouped: DataFrame, cntCol: String): DataFrame =
    grouped.agg(
      round(max(col(cntCol)) / avg(col(cntCol)), 4).as("skew_ratio"),
      max(col(cntCol)).as("max_cnt"),
      count(lit(1)).as("n_groups"))

  /** A5 — per-column null counts + percentages (ref `formatters.py:522-559`).
    * One pass over the data (a single multi-column aggregate), then a
    * `stack` unpivot of the 1-row result — no per-column rescan. */
  def nullRates(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls")) :+
      count(lit(1)).as("total_cnt")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map(c => s"'$c', `${c}__nulls`")
      .mkString(s"stack(${cols.size}, ", ", ", ") as (col_name, null_cnt)")
    one.selectExpr(stackExpr, "total_cnt")
      .withColumn("null_pct",
        round(lit(100.0) * col("null_cnt") / col("total_cnt"), 4))
      .orderBy("col_name")
  }

  /** A7 — per-column min/max bounds (ref `formatters.py:576-604`), unpivoted
    * from a single multi-aggregate pass. */
  def columnBounds(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}__min"), max(col(c)).as(s"${c}__max")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map(c => s"'$c', `${c}__min`, `${c}__max`")
      .mkString(s"stack(${cols.size}, ", ", ", ") as (col_name, min_val, max_val)")
    one.selectExpr(stackExpr).orderBy("col_name")
  }

  /** A6 — per-group share of the grand total (ref `formatters.py:561-573`).
    * The total is a window sum over the grouped (small) frame, kept in
    * decimal until the final cast so the share is deterministic. */
  def columnShare(df: DataFrame, key: String, valueCol: String): DataFrame = {
    val g = df.groupBy(key).agg(sum(col(valueCol).cast(Money)).as("sum_dec"))
    val w = Window.partitionBy()
    g.withColumn("total_dec", sum(col("sum_dec")).over(w))
      .select(
        col(key),
        col("sum_dec").cast("double").as("sum_val"),
        round(lit(100.0) * col("sum_dec").cast("double") / col("total_dec").cast("double"), 4)
          .as("pct"))
  }

  /** W8 — classify each value vs the global average into green/yellow/red
    * (ref `formatters.py:38-47`). The 1-row average is broadcast, so the
    * fact table is scanned exactly once and never shuffled. */
  def sizeColor(df: DataFrame, valueCol: String): DataFrame = {
    val stats = df.agg(
      (moneySum(col(valueCol)) / count(lit(1))).as("avg_v"))
    df.crossJoin(broadcast(stats))
      .withColumn("bucket",
        when(col(valueCol) <= col("avg_v") * 0.5, "green")
          .when(col(valueCol) <= col("avg_v") * 1.5, "yellow")
          .otherwise(lit("red")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** W10/P5 — freshness bucketing by age vs the newest row
    * (ref `tui/widgets.py:799-817`). `tsUsCol` is epoch-micros. */
  def freshness(df: DataFrame, tsUsCol: String): DataFrame = {
    val day = 86400000000L // 1 day in µs
    val m = df.agg(max(col(tsUsCol)).as("mx"))
    df.crossJoin(broadcast(m))
      .withColumn("bucket",
        when(col("mx") - col(tsUsCol) < lit(day), "d1")
          .when(col("mx") - col(tsUsCol) < lit(7 * day), "d7")
          .otherwise(lit("older")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))
  }
}
