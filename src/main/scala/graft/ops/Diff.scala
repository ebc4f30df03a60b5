package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-diff operators (ref `formatters.py:1051-1111`): set difference
  * of keyed rows between two states plus per-side totals and nets.
  *
  * Scale notes: the set differences are expressed as equi anti-joins so
  * Catalyst can pick broadcast-hash when one side is small and shuffled-hash
  * / sort-merge otherwise; `netSummary` folds both sides into one scan with
  * conditional aggregates — no join at all when both states live in the
  * same table discriminated by a predicate.
  */
object Diff {

  /** SO1/J1 — rows of `cur` whose key is absent from `prev` ("added"). */
  def added(cur: DataFrame, prev: DataFrame, key: String): DataFrame =
    cur.join(prev.select(key), Seq(key), "left_anti")

  /** SO1/J1 — rows of `prev` whose key is absent from `cur` ("deleted"). */
  def deleted(cur: DataFrame, prev: DataFrame, key: String): DataFrame =
    prev.join(cur.select(key), Seq(key), "left_anti")

  /** A9 — added/deleted counts + value sums + nets in a single scan
    * (ref `formatters.py:1091-1108`). `curOnly` / `prevOnly` are disjoint
    * membership predicates. Value sums use the exact decimal type. */
  def netSummary(df: DataFrame, curOnly: Column, prevOnly: Column, value: Column): DataFrame = {
    val vdec = value.cast(Health.Money)
    df.agg(
        sum(when(curOnly, 1L).otherwise(0L)).as("added_cnt"),
        sum(when(prevOnly, 1L).otherwise(0L)).as("deleted_cnt"),
        sum(when(curOnly, vdec)).as("added_dec"),
        sum(when(prevOnly, vdec)).as("deleted_dec"))
      .select(
        col("added_cnt"),
        col("deleted_cnt"),
        (col("added_cnt") - col("deleted_cnt")).as("net_cnt"),
        col("added_dec").cast("double").as("added_sum"),
        col("deleted_dec").cast("double").as("deleted_sum"),
        (col("added_dec") - col("deleted_dec")).cast("double").as("net_sum"))
  }
}
