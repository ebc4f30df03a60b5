package graft.ops

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.meta.{IcebergMeta, TableMetadata}

/** Namespace / warehouse rollups (ref `formatters.py:1403-1494`) built on
  * the **metadata-only fast path**: totals come from each current
  * snapshot's summary properties (`total-data-files` / `total-records` /
  * `total-files-size`, ref `formatters.py:1350-1360`) — zero manifest IO,
  * the aggregate-pushdown-to-stats analog (SURVEY §4).
  */
object Overview {

  val tableFactsSchema: StructType = StructType(Seq(
    StructField("namespace", StringType, nullable = false),
    StructField("table_name", StringType, nullable = false),
    StructField("format_version", IntegerType, nullable = false),
    StructField("last_updated_ms", LongType, nullable = false),
    StructField("snapshot_count", IntegerType, nullable = false),
    StructField("field_count", IntegerType, nullable = false),
    StructField("total_data_files", LongType, nullable = true),
    StructField("total_records", LongType, nullable = true),
    StructField("total_files_size", LongType, nullable = true)))

  /** Walk `<warehouse>/<namespace>/<table>` dirs (ref S2 namespace walk,
    * `catalog.py:164-189`) and parse each table's metadata JSON only. */
  def tableFacts(spark: SparkSession, warehouseDir: String): DataFrame = {
    val wh = Paths.get(warehouseDir)
    val rows = Files.list(wh).iterator().asScala.filter(Files.isDirectory(_)).toSeq
      .sortBy(_.getFileName.toString).flatMap { ns =>
        Files.list(ns).iterator().asScala.filter(Files.isDirectory(_)).toSeq
          .sortBy(_.getFileName.toString).flatMap { tbl =>
            val md: Option[TableMetadata] =
              try Some(IcebergMeta.load(tbl.toString))
              catch { case _: Exception => None }
            md.map { m =>
              val sum = m.currentSnapshot.map(_.summary).getOrElse(Map.empty)
              def longProp(k: String): Any =
                sum.get(k).map(v => Long.box(v.toLong)).orNull
              Row(ns.getFileName.toString, tbl.getFileName.toString,
                m.formatVersion, m.lastUpdatedMs, m.snapshots.size,
                m.currentSchema.fields.size,
                longProp("total-data-files"), longProp("total-records"),
                longProp("total-files-size"))
            }
          }
      }
    spark.createDataFrame(rows.asJava, tableFactsSchema)
  }

  /** A10 — per-namespace rollup (ref `formatters.py:1403-1435`). */
  def namespaceRollup(facts: DataFrame): DataFrame =
    facts.groupBy("namespace")
      .agg(
        count(lit(1)).as("table_count"),
        sum(col("total_data_files")).as("total_files"),
        sum(col("total_records")).as("total_records"),
        sum(col("total_files_size")).as("total_size"))
      .orderBy(col("total_size").desc_nulls_last, col("namespace"))

  /** A11 — warehouse rollup + grand total row via `rollup`, plus the
    * format-version census (ref `formatters.py:1438-1494`). */
  def warehouseRollup(facts: DataFrame): DataFrame =
    facts.rollup(col("namespace"))
      .agg(
        count(lit(1)).as("table_count"),
        sum(col("total_data_files")).as("total_files"),
        sum(col("total_records")).as("total_records"),
        sum(col("total_files_size")).as("total_size"))
      .orderBy(asc_nulls_first("namespace"))

  def formatVersionCensus(facts: DataFrame): DataFrame =
    facts.groupBy("format_version").agg(count(lit(1)).as("table_count"))
      .orderBy("format_version")

  /** W2 — stalest tables top-5 (ref `formatters.py:1474-1480`). */
  def stalest(facts: DataFrame, k: Int = 5): DataFrame =
    Rollups.topK(
      facts.select("namespace", "table_name", "last_updated_ms"),
      k, col("last_updated_ms"), col("namespace"), col("table_name"))

  /** W3 — snapshot hogs top-5 (ref `formatters.py:1481`). */
  def snapshotHogs(facts: DataFrame, k: Int = 5): DataFrame =
    Rollups.topK(
      facts.select("namespace", "table_name", "snapshot_count"),
      k, col("snapshot_count").desc, col("namespace"), col("table_name"))

  /** P5 — stale-table flags: age vs warn/crit thresholds
    * (ref `tui/widgets.py:789-817`). `nowMs` is injected for determinism. */
  def staleFlags(facts: DataFrame, nowMs: Long,
      warnMs: Long = 7L * 86400000L, critMs: Long = 30L * 86400000L): DataFrame =
    facts.select(col("namespace"), col("table_name"),
        (lit(nowMs) - col("last_updated_ms")).as("age_ms"))
      .withColumn("freshness",
        when(col("age_ms") > critMs, "crit")
          .when(col("age_ms") > warnMs, "warn")
          .otherwise(lit("ok")))
      .orderBy("namespace", "table_name")

  /** J5 — cross-table schema conflicts: same field name, >1 distinct type
    * across the warehouse (ref `formatters.py:1385-1400`). */
  def schemaConflicts(spark: SparkSession, warehouseDir: String): DataFrame = {
    val wh = Paths.get(warehouseDir)
    val rows = Files.list(wh).iterator().asScala.filter(Files.isDirectory(_)).toSeq
      .sortBy(_.getFileName.toString).flatMap { ns =>
        Files.list(ns).iterator().asScala.filter(Files.isDirectory(_)).toSeq
          .sortBy(_.getFileName.toString).flatMap { tbl =>
            (try Some(IcebergMeta.load(tbl.toString)) catch { case _: Exception => None })
              .toSeq.flatMap(m => m.currentSchema.fields.map(f =>
                Row(s"${ns.getFileName}.${tbl.getFileName}", f.name, f.fieldType)))
          }
      }
    val schema = StructType(Seq(
      StructField("table_ref", StringType, nullable = false),
      StructField("field_name", StringType, nullable = false),
      StructField("ftype", StringType, nullable = false)))
    SchemaDiff.conflicts(spark.createDataFrame(rows.asJava, schema),
      "field_name", "ftype").orderBy("field_name")
  }
}
