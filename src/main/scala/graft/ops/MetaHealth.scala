package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.IcebergDecode
import graft.meta.IcebergTable
import graft.rel.MetaRelations

/** The multi-section table-health report (ref `collect_table_health`,
  * `formatters.py:375-660`) composed from the generic operators in
  * [[Health]] / [[Overlap]] over the metadata relations. Each section is a
  * lazy DataFrame; the `files` relation is built once and cached by the
  * caller if several sections will run (the reference re-scans per panel —
  * SURVEY §3.3 — we share the scan).
  */
final case class HealthReport(
    fileStats: DataFrame,
    manifestCensus: DataFrame,
    partitionStats: DataFrame,
    nullRates: DataFrame,
    columnShare: DataFrame,
    columnBounds: DataFrame,
    overlap: DataFrame)

object MetaHealth {

  val SmallFileBytes: Long = 32L * 1024 * 1024 // ref formatters.py:340

  /** A1/A2 — file-size stats + small-file count in one pass. */
  def fileStats(files: DataFrame): DataFrame =
    files.agg(
        count(lit(1)).as("file_count"),
        min(col("file_size_in_bytes")).as("min_bytes"),
        max(col("file_size_in_bytes")).as("max_bytes"),
        round(median(col("file_size_in_bytes")), 2).as("med_bytes"),
        sum(col("file_size_in_bytes")).as("total_bytes"),
        sum(when(col("file_size_in_bytes") < SmallFileBytes, 1L).otherwise(0L))
          .as("small_files"))
      .withColumn("avg_bytes",
        round(col("total_bytes").cast("double") / col("file_count"), 2))
      .withColumn("small_file_warning", col("small_files") > col("file_count") / 2)

  /** A3 — manifest content census + compaction flag
    * (ref `formatters.py:446-462`). */
  def manifestCensus(manifests: DataFrame): DataFrame =
    manifests.agg(
        sum(when(col("content") === 0, 1L).otherwise(0L)).as("data_manifests"),
        sum(when(col("content") =!= 0, 1L).otherwise(0L)).as("delete_manifests"),
        count(lit(1)).as("total_manifests"))
      .withColumn("compaction_recommended", col("delete_manifests") > 0)

  /** A4/J6 — per-partition stats with skew flags
    * (ref `formatters.py:485-514`). */
  def partitionStats(files: DataFrame): DataFrame =
    Health.skewFlags(
      MetaRelations.partitions(files).withColumnRenamed("file_count", "cnt"),
      "cnt")

  /** A5 — per-column null rates from the stat maps (ref
    * `formatters.py:522-559`). The null and value maps are merged per row
    * with `map_zip_with`, so the whole section is ONE explode + ONE
    * aggregate — no second scan and no join (the old two-explode + join
    * shape paid an extra broadcast job per call; at metadata scale job
    * count, not row count, is the cost). `nameById` is a literal
    * field_id→name map: the schema is driver-known metadata, so resolving
    * names costs an `element_at`, not a join. */
  def nullRates(files: DataFrame, nameById: Column): DataFrame =
    files
      .select(explode(expr(
        "map_zip_with(null_value_counts, value_counts, " +
          "(k, n, v) -> named_struct('nulls', n, 'vals', v))"))
        .as(Seq("field_id", "nv")))
      .groupBy("field_id")
      .agg(sum(col("nv.nulls")).as("null_count"), sum(col("nv.vals")).as("value_count"))
      .filter(col("null_count").isNotNull && col("value_count").isNotNull)
      .withColumn("field_name", element_at(nameById, col("field_id")))
      .withColumn("null_pct",
        round(lit(100.0) * col("null_count") / col("value_count"), 4))
      .orderBy("field_id")

  /** A6 — per-column storage share, sorted desc
    * (ref `formatters.py:561-573`). */
  def columnShare(files: DataFrame, nameById: Column): DataFrame = {
    val sizes = files
      .select(explode(col("column_sizes")).as(Seq("field_id", "bytes")))
      .groupBy("field_id").agg(sum(col("bytes")).as("total_bytes"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    sizes
      .withColumn("pct_of_total",
        round(lit(100.0) * col("total_bytes") / sum(col("total_bytes")).over(w), 4))
      .withColumn("field_name", element_at(nameById, col("field_id")))
      .orderBy(col("total_bytes").desc, col("field_id"))
  }

  /** A7 — per-column min/max bounds, decoded from the Iceberg single-value
    * binary via [[IcebergDecode]] (ref `formatters.py:576-604`; primitive
    * numeric types only, like the reference). The lower/upper maps are
    * merged per row with `map_zip_with`: ONE explode + ONE aggregate for
    * both sides, no join. Type/name lookup via literal maps. */
  def columnBounds(files: DataFrame, typeById: Column, nameById: Column): DataFrame =
    files
      .select(explode(expr(
        "map_zip_with(lower_bounds, upper_bounds, " +
          "(k, lo, hi) -> named_struct('lo', lo, 'hi', hi))"))
        .as(Seq("field_id", "b")))
      .select(col("field_id"),
        IcebergDecode.decodeNum(element_at(typeById, col("field_id")), col("b.lo")).as("lo"),
        IcebergDecode.decodeNum(element_at(typeById, col("field_id")), col("b.hi")).as("hi"))
      .groupBy("field_id")
      .agg(min(col("lo")).as("min_value"), max(col("hi")).as("max_value"))
      .filter(col("min_value").isNotNull)
      .withColumn("field_name", element_at(nameById, col("field_id")))
      .orderBy("field_id")

  /** J4/W6 — interval-overlap detection on the first partition-source
    * column's decoded [lower, upper] ranges, with the reference's adaptive
    * exact-vs-sweep switch (ref `formatters.py:606-658`). */
  def overlap(spark: SparkSession, t: IcebergTable, files: DataFrame,
      exactLimit: Long = 1000L): DataFrame = {
    val specFields = t.metadata.currentSpec.fields
    if (specFields.isEmpty) return spark.emptyDataFrame
    val srcId = specFields.head.sourceId
    val srcType = t.metadata.currentSchema.fields.find(_.id == srcId)
      .map(_.fieldType).getOrElse("long")
    val iv = files.select(
        col("file_path").as("k"),
        IcebergDecode.decodeNum(lit(srcType), col("lower_bounds")(srcId)).as("lo"),
        IcebergDecode.decodeNum(lit(srcType), col("upper_bounds")(srcId)).as("hi"))
      .filter(col("lo").isNotNull && col("hi").isNotNull)
    Overlap.adaptive(iv, exactLimit)
  }

  /** Full health report; pass a cached `files` DataFrame to share the scan
    * across sections. Schema lookups are literal maps (driver-known
    * metadata), so no section joins the schema relation. */
  def report(spark: SparkSession, t: IcebergTable, files: DataFrame): HealthReport = {
    val fields = t.metadata.currentSchema.fields
    val nameById = typedLit(fields.map(f => f.id -> f.name).toMap)
    val typeById = typedLit(fields.map(f => f.id -> f.fieldType).toMap)
    HealthReport(
      fileStats = fileStats(files),
      manifestCensus = manifestCensus(MetaRelations.manifests(spark, t)),
      partitionStats = partitionStats(files),
      nullRates = nullRates(files, nameById),
      columnShare = columnShare(files, nameById),
      columnBounds = columnBounds(files, typeById, nameById),
      overlap = overlap(spark, t, files))
  }
}
