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
  /** `events.ts` surfaces as LongType epoch-NANOSECONDS regardless of the
    * parquet physical type — the whole engine (and every oracle's
    * `epoch_us(ts)` ≡ Spark `ts div 1000`) is written against that
    * contract. Driver-generated data has shipped both timestamp[ns]
    * (reads as LONG under `spark.sql.legacy.parquet.nanosAsLong=true`,
    * see [[Sessions]]) and timestamp[us] (reads as TIMESTAMP_NTZ; session
    * timezone is pinned UTC so the NTZ→epoch conversion is exact). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ => raw.withColumn(
        "ts", org.apache.spark.sql.functions.expr(
          "unix_micros(CAST(ts AS TIMESTAMP)) * 1000L"))
    }
  }
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
    // Field-id column resolution for id-stamped engine tables (rename-
    // safe reads, see graft.meta.FieldIds). Safe globally: id-less read
    // schemas keep plain name matching. ScanPlanner also sets it lazily
    // (ensureReadEnabled) so user-built sessions are covered.
    "spark.sql.parquet.fieldId.read.enabled" -> "true",
    // The write half is Spark-4 default-on; pinned explicitly so a
    // future default flip can't silently produce id-less files from
    // attributed write schemas (the engine's id guarantee depends on it).
    "spark.sql.parquet.fieldId.write.enabled" -> "true",
  )
}
