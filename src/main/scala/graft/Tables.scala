package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided parquet testdata
  * (`/root/testdata/sf*`, see TESTDATA.md / FIXTURES.md §B).
  *
  * Every reader is a plain lazy `spark.read.parquet` scan so Catalyst can
  * push filters/projections down to the parquet reader — callers should
  * `.select`/`.filter` directly on the returned DataFrame and let the
  * optimizer prune columns and row groups.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is parquet timestamp[ns]; sessions must set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[Sessions]]), so the
    * `ts` column surfaces as LongType epoch-nanoseconds. Oracles mirror it
    * with DuckDB's `epoch_ns(ts)`. */
  def events(s: SparkSession, d: String): DataFrame    = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** Session defaults shared by Verify / Bench / tests. */
object Sessions {
  /** Configs that query semantics depend on (must be set before first read). */
  val required: Seq[(String, String)] = Seq(
    // events.ts is parquet TIMESTAMP(NANOS) which Spark cannot represent;
    // read it as epoch-nanos LongType instead of failing the scan.
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    // Write timestamps as INT64 micros (DuckDB-friendly; INT96 is legacy).
    "spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS",
    "spark.sql.session.timeZone" -> "UTC",
  )
}
