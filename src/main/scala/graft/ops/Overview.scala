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

  /** `<warehouse>/<namespace>/<table>` directory pairs, sorted (ref S2
    * namespace walk, `catalog.py:164-189`) — one cheap listing; the
    * per-table metadata parses hang off it. */
  private def tableDirs(warehouseDir: String): Seq[(String, java.nio.file.Path)] = {
    val wh = Paths.get(warehouseDir)
    Files.list(wh).iterator().asScala.filter(Files.isDirectory(_)).toSeq
      .sortBy(_.getFileName.toString).flatMap { ns =>
        Files.list(ns).iterator().asScala.filter(Files.isDirectory(_)).toSeq
          .sortBy(_.getFileName.toString)
          .map(tbl => ns.getFileName.toString -> tbl)
      }
  }

  /** Parse each table's metadata CONCURRENTLY, order-preserving — a
    * 10k-table warehouse overview is bound by per-table JSON parse +
    * stat latency, which pipelines; unparseable tables yield None. A
    * driver-side Future pool, not a Spark job: the work is metadata-scale
    * (one small file per table) and fan-out is I/O-bound. */
  private def parMetadata(dirs: Seq[(String, java.nio.file.Path)])
      : Seq[(String, java.nio.file.Path, Option[TableMetadata])] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(
      Future.traverse(dirs.toList) { case (ns, tbl) =>
        Future((ns, tbl,
          try Some(IcebergMeta.load(tbl.toString))
          catch { case _: Exception => None }))
      }, scala.concurrent.duration.Duration.Inf)
  }

  /** Walk the warehouse and parse each table's metadata JSON only
    * (concurrent per-table parse; see [[parMetadata]]). */
  def tableFacts(spark: SparkSession, warehouseDir: String): DataFrame = {
    val rows = parMetadata(tableDirs(warehouseDir)).flatMap { case (ns, tbl, md) =>
      md.map { m =>
        val sum = m.currentSnapshot.map(_.summary).getOrElse(Map.empty)
        def longProp(k: String): Any =
          sum.get(k).map(v => Long.box(v.toLong)).orNull
        Row(ns, tbl.getFileName.toString,
          m.formatVersion, m.lastUpdatedMs, m.snapshots.size,
          m.currentSchema.fields.size,
          longProp("total-data-files"), longProp("total-records"),
          longProp("total-files-size"))
      }
    }
    spark.createDataFrame(rows.asJava, tableFactsSchema)
  }

  /** [[tableFacts]] through the catalog SPI — the shape REST/JDBC-backed
    * engines use, where there is no warehouse directory to walk. Each
    * table's metadata loads concurrently (order-preserving Futures, like
    * [[parMetadata]]); unloadable tables are skipped. */
  def tableFactsFromCatalog(
      spark: SparkSession, catalog: graft.meta.MetaCatalog): DataFrame = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val loaded = Await.result(
      Future.traverse(catalog.listTables().toList) { case (ns, tbl) =>
        Future((ns, tbl,
          try Some(catalog.loadTable(s"$ns.$tbl").metadata)
          catch { case _: Exception => None }))
      }, scala.concurrent.duration.Duration.Inf)
    val rows = loaded.flatMap { case (ns, tbl, md) =>
      md.map { m =>
        val sum = m.currentSnapshot.map(_.summary).getOrElse(Map.empty)
        def longProp(k: String): Any =
          sum.get(k).map(v => Long.box(v.toLong)).orNull
        Row(ns, tbl, m.formatVersion, m.lastUpdatedMs, m.snapshots.size,
          m.currentSchema.fields.size,
          longProp("total-data-files"), longProp("total-records"),
          longProp("total-files-size"))
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
    val rows = parMetadata(tableDirs(warehouseDir)).flatMap { case (ns, tbl, md) =>
      md.toSeq.flatMap(m => m.currentSchema.fields.map(f =>
        Row(s"$ns.${tbl.getFileName}", f.name, f.fieldType)))
    }
    val schema = StructType(Seq(
      StructField("table_ref", StringType, nullable = false),
      StructField("field_name", StringType, nullable = false),
      StructField("ftype", StringType, nullable = false)))
    SchemaDiff.conflicts(spark.createDataFrame(rows.asJava, schema),
      "field_name", "ftype").orderBy("field_name")
  }
}
