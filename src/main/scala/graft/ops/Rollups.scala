package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Namespace/warehouse rollups and top-k listings (ref
  * `formatters.py:1403-1494`, `tui/widgets.py:789-1108`): per-group totals
  * with grand-total rows (`rollup`), share-of-total percentages, and the
  * sorted top-k views (stalest tables, snapshot hogs, recent operations).
  */
object Rollups {

  /** A13 — per-group count plus share of the grand total
    * (ref `formatters.py:1276-1288` "45% of rows"). */
  def treePct(df: DataFrame, keyCol: String): DataFrame = {
    val w = Window.partitionBy()
    df.groupBy(keyCol)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("pct", round(lit(100.0) * col("cnt") / sum(col("cnt")).over(w), 4))
  }

  /** W1-W3 — deterministic top-k: explicit tiebreak ordering then limit.
    * Catalyst plans this as TakeOrderedAndProject (no global sort). */
  def topK(df: DataFrame, k: Int, orderCols: Column*): DataFrame =
    df.orderBy(orderCols: _*).limit(k)
}
