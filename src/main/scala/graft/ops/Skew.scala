package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation for hot grouping keys: two-phase SALTED aggregation.
  *
  * A single hot key sends all its rows to one reducer; salting appends a
  * random-but-deterministic bucket to the key so the first (heavy) shuffle
  * spreads the hot key over `buckets` reducers, and a second (tiny) shuffle
  * over the distinct keys merges the partials. Correct for any ADDITIVE
  * aggregate (count, sum, min, max). AQE's skew handling covers joins;
  * this covers aggregations, and at 100 TB it is the difference between a
  * straggler task and an even stage.
  */
object Skew {

  /** Deterministic salt in [0, buckets): hash of the whole row's key cols
    * plus a fast per-row discriminator (monotonically_increasing_id is
    * partition-local and never shuffles). */
  private def salt(buckets: Int): Column =
    pmod(hash(monotonically_increasing_id()), lit(buckets))

  /** Salted equivalent of `df.groupBy(keys).agg(count(*), sum(valueCol))`
    * with exact-decimal value sums. Result is bit-identical to the
    * unsalted aggregate (addition is associative; decimal sums are
    * order-independent). */
  def saltedStats(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", salt(buckets))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(
        count(lit(1)).as("__cnt"),
        sum(col(valueCol).cast(Health.Money)).as("__sum"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("__cnt")).as("cnt"),
        sum(col("__sum")).cast("double").as("sum_val"))
  }

  /** Unsalted twin, for equivalence tests and non-skewed inputs. */
  def plainStats(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        Health.moneySum(col(valueCol)).as("sum_val"))
}
