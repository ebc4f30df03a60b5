package graft.fixtures

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.sql.{Date, Timestamp}

import scala.jdk.CollectionConverters._
import scala.util.Random

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.expr.IcebergDecode
import graft.meta._

/** Deterministic demo-catalog fixture writer — the Scala analog of the
  * reference's seeded demo (ref `demo.py:22-181`, seed 42): a warehouse of
  * `sales.orders` (3 appends + 1 overwrite, identity(region) partitioning),
  * `sales.customers` (schema evolution v0 → +phone/+signup_date, 2
  * appends), `analytics.events` (3 appends, identity(event_type)), laid out
  * as real mini Iceberg v2 trees (parquet data files + metadata.json +
  * Avro manifest list/manifests) that [[graft.meta.IcebergTable]] loads.
  *
  * Also a pure-metadata "monster" stress table (5 commits × ~1000 files
  * with overlapping id ranges — ref `scripts/generate_monster_table.py:
  * 44-107`): the engine only reads metadata, so monster data files are not
  * materialized.
  */
object FixtureWriter {

  private val BaseTs = 1704067200000L // 2024-01-01T00:00:00Z, fixture epoch

  final case class ColSpec(id: Int, name: String, iceType: String, required: Boolean)

  /** One commit: operation + rows (generic values per column). */
  final case class Commit(operation: String, rows: Seq[Seq[Any]], schemaId: Int)

  // ---------------------------------------------------------------- helpers

  private def sparkType(t: String): DataType = t match {
    case "long" => LongType
    case "int" => IntegerType
    case "double" => DoubleType
    case "string" => StringType
    case "date" => DateType
    case "timestamp" => TimestampType
    case "boolean" => BooleanType
  }

  private def boundBytes(t: String, v: Any): Array[Byte] = t match {
    case "date" => IcebergDecode.encode("date",
      (v.asInstanceOf[Date].toLocalDate.toEpochDay).toInt)
    case "timestamp" =>
      // full micros (getTime floors to millis — a floored UPPER bound
      // would let pruning drop rows in the file's last millisecond)
      val ts = v.asInstanceOf[Timestamp]
      IcebergDecode.encode("timestamp",
        ts.getTime * 1000L + (ts.getNanos / 1000) % 1000)
    case other => IcebergDecode.encode(other, v)
  }

  private def ordering(t: String): Ordering[Any] = (t match {
    case "long" => Ordering.Long.on[Any](_.asInstanceOf[Long])
    case "int" => Ordering.Int.on[Any](_.asInstanceOf[Int])
    case "double" => Ordering.Double.TotalOrdering.on[Any](_.asInstanceOf[Double])
    case "string" => Ordering.String.on[Any](_.asInstanceOf[String])
    case "date" => Ordering.Long.on[Any](_.asInstanceOf[Date].getTime)
    case "timestamp" => Ordering.Long.on[Any](_.asInstanceOf[Timestamp].getTime)
    case "boolean" => Ordering.Boolean.on[Any](_.asInstanceOf[Boolean])
  })

  /** Write a table as an Iceberg v2 layout. `partitionCol` = identity
    * partition source column name (None = unpartitioned). */
  def writeTable(
      spark: SparkSession,
      tableDir: String,
      schemaVersions: Seq[Seq[ColSpec]],
      partitionCol: Option[String],
      commits: Seq[Commit]): Unit = {

    val dir = Paths.get(tableDir)
    Files.createDirectories(dir.resolve("data"))
    Files.createDirectories(dir.resolve("metadata"))

    var liveFiles = Vector.empty[DataFileEntry] // current snapshot's live set
    var allManifests = Vector.empty[ManifestFile]
    var snapshots = Vector.empty[Snapshot]
    var prevSnapId: Option[Long] = None

    commits.zipWithIndex.foreach { case (commit, ci) =>
      val snapId = 1000L + ci
      val cols = schemaVersions(commit.schemaId)
      val sparkSchema = StructType(cols.map(c =>
        StructField(c.name, sparkType(c.iceType), nullable = !c.required)))

      // group rows into one data file per partition value
      val partIdx = partitionCol.map(p => cols.indexWhere(_.name == p))
      val groups: Seq[(Map[String, String], Seq[Seq[Any]])] = partIdx match {
        case Some(i) => commit.rows.groupBy(r => r(i).toString).toSeq.sortBy(_._1)
          .map { case (v, rs) => (Map(partitionCol.get -> v), rs) }
        case None => Seq((Map.empty[String, String], commit.rows))
      }

      val entries = groups.map { case (part, rows) =>
        val fileName = f"data-$snapId-${part.values.mkString("_").replaceAll("[^A-Za-z0-9_-]", "")}%s.parquet"
        val filePath = s"data/$fileName"
        // write a real single-file parquet for this group
        val tmp = Files.createTempDirectory("graft-fixture")
        spark.createDataFrame(rows.map(Row.fromSeq).asJava, sparkSchema)
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val partFile = Files.list(tmp).iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
        val target = dir.resolve(filePath)
        Files.move(partFile, target, StandardCopyOption.REPLACE_EXISTING)
        Files.list(tmp).iterator().asScala.foreach(Files.deleteIfExists)
        Files.deleteIfExists(tmp)

        // per-column stats from the in-memory rows (deterministic)
        val nonNullByCol = cols.zipWithIndex.map { case (c, i) =>
          c -> rows.map(_(i)).filter(_ != null)
        }
        val valueCounts = cols.map(c => c.id -> rows.size.toLong).toMap
        val nullCounts = nonNullByCol.map { case (c, vs) =>
          c.id -> (rows.size - vs.size).toLong
        }.toMap
        val colSizes = cols.zipWithIndex.map { case (c, i) =>
          c.id -> (8L * rows.size + i) // deterministic approximation
        }.toMap
        val lower = nonNullByCol.flatMap { case (c, vs) =>
          if (vs.isEmpty) None
          else Some(c.id -> boundBytes(c.iceType, vs.min(ordering(c.iceType))))
        }.toMap
        val upper = nonNullByCol.flatMap { case (c, vs) =>
          if (vs.isEmpty) None
          else Some(c.id -> boundBytes(c.iceType, vs.max(ordering(c.iceType))))
        }.toMap

        DataFileEntry(
          status = 1, snapshotId = snapId, content = 0,
          filePath = filePath, fileFormat = "PARQUET", partition = part,
          recordCount = rows.size.toLong,
          fileSizeInBytes = Files.size(target),
          columnSizes = colSizes, valueCounts = valueCounts,
          nullValueCounts = nullCounts, lowerBounds = lower, upperBounds = upper,
          sequenceNumber = ci + 1L)
      }

      val manifestPath = s"metadata/manifest-$snapId.avro"
      AvroManifests.writeManifest(dir.resolve(manifestPath).toString, entries)
      val manifest = ManifestFile(
        manifestPath, Files.size(dir.resolve(manifestPath)),
        partitionSpecId = 0, content = 0, addedSnapshotId = snapId,
        addedFilesCount = entries.size, existingFilesCount = 0,
        deletedFilesCount = 0,
        addedRowsCount = entries.map(_.recordCount).sum,
        existingRowsCount = 0, deletedRowsCount = 0)

      if (commit.operation == "overwrite") {
        liveFiles = entries.toVector
        allManifests = Vector(manifest)
      } else {
        liveFiles = liveFiles ++ entries
        allManifests = allManifests :+ manifest
      }

      val listPath = s"metadata/snap-$snapId.avro"
      AvroManifests.writeManifestList(dir.resolve(listPath).toString, allManifests)

      snapshots = snapshots :+ Snapshot(
        snapshotId = snapId,
        parentSnapshotId = prevSnapId,
        timestampMs = BaseTs + ci * 3600000L,
        sequenceNumber = ci + 1L,
        operation = commit.operation,
        summary = Map(
          "operation" -> commit.operation,
          "added-data-files" -> entries.size.toString,
          "added-records" -> entries.map(_.recordCount).sum.toString,
          "total-data-files" -> liveFiles.size.toString,
          "total-records" -> liveFiles.map(_.recordCount).sum.toString,
          "total-files-size" -> liveFiles.map(_.fileSizeInBytes).sum.toString),
        manifestList = listPath)
      prevSnapId = Some(snapId)
    }

    val lastSchemaId = commits.lastOption.map(_.schemaId).getOrElse(0)
    val md = TableMetadata(
      formatVersion = 2,
      tableUuid = java.util.UUID.nameUUIDFromBytes(tableDir.getBytes).toString,
      location = tableDir,
      lastUpdatedMs = BaseTs + commits.size * 3600000L,
      currentSchemaId = lastSchemaId,
      schemas = schemaVersions.zipWithIndex.map { case (cols, i) =>
        IceSchema(i, cols.map(c => SchemaField(c.id, c.name, c.required, c.iceType, c.name)))
      },
      defaultSpecId = 0,
      partitionSpecs = Seq(PartitionSpec(0, partitionCol.toSeq.map { p =>
        val src = schemaVersions(lastSchemaId).find(_.name == p).get
        SpecField(p, "identity", src.id, 1000)
      })),
      properties = Map("owner" -> "analytics-team", "write.format.default" -> "parquet"),
      currentSnapshotId = snapshots.lastOption.map(_.snapshotId),
      snapshots = snapshots)
    Files.writeString(dir.resolve("metadata/v1.metadata.json"), IcebergMeta.render(md))
  }

  // ------------------------------------------------------------ demo tables

  private val Regions = Seq("us-east", "us-west", "eu-west", "eu-central", "ap-south")
  private val Names = Seq("Alice Smith", "Bob Jones", "Carol White", "Dan Brown",
    "Eve Davis", "Frank Moore", "Grace Lee", "Henry Clark")
  private val EventTypes = Seq("page_view", "click", "scroll", "form_submit", "purchase")
  private val PageUrls = Seq("/home", "/products", "/cart", "/checkout", "/account")

  private def ordersRows(rng: Random, ids: Range): Seq[Seq[Any]] = ids.map { i =>
    Seq[Any](
      i.toLong,
      Names(rng.nextInt(Names.size)),
      Regions(rng.nextInt(Regions.size)),
      math.rint(10 + rng.nextDouble() * 989 * 100) / 100,
      new Date(BaseTs + rng.nextInt(180) * 86400000L),
      new Timestamp(BaseTs + (rng.nextDouble() * 180 * 86400000L).toLong))
  }

  /** The seeded demo warehouse: returns the warehouse dir. */
  def writeDemo(spark: SparkSession, warehouseDir: String): String = {
    val rng = new Random(42)

    val ordersSchema = Seq(
      ColSpec(1, "order_id", "long", required = true),
      ColSpec(2, "customer_name", "string", required = false),
      ColSpec(3, "region", "string", required = false),
      ColSpec(4, "amount", "double", required = false),
      ColSpec(5, "order_date", "date", required = false),
      ColSpec(6, "created_at", "timestamp", required = false))
    writeTable(spark, s"$warehouseDir/sales/orders",
      Seq(ordersSchema), Some("region"),
      Seq(
        Commit("append", ordersRows(rng, 1 to 20), 0),
        Commit("append", ordersRows(rng, 21 to 45), 0),
        Commit("append", ordersRows(rng, 46 to 60), 0),
        Commit("overwrite", ordersRows(rng, 1 to 15), 0)))

    val custV0 = Seq(
      ColSpec(1, "customer_id", "long", required = true),
      ColSpec(2, "name", "string", required = false),
      ColSpec(3, "email", "string", required = false))
    val custV1 = custV0 ++ Seq(
      ColSpec(4, "phone", "string", required = false),
      ColSpec(5, "signup_date", "date", required = false))
    def custRows(ids: Range, v1: Boolean): Seq[Seq[Any]] = ids.map { i =>
      val base = Seq[Any](i.toLong, Names(rng.nextInt(Names.size)), s"user$i@example.com")
      if (v1) base ++ Seq[Any](f"+1-555-${rng.nextInt(10000)}%04d",
        new Date(BaseTs + rng.nextInt(365) * 86400000L))
      else base
    }
    writeTable(spark, s"$warehouseDir/sales/customers",
      Seq(custV0, custV1), None,
      Seq(
        Commit("append", custRows(1 to 10, v1 = false), 0),
        Commit("append", custRows(11 to 20, v1 = true), 1)))

    val eventsSchema = Seq(
      ColSpec(1, "event_id", "long", required = true),
      ColSpec(2, "user_id", "long", required = false),
      ColSpec(3, "event_type", "string", required = false),
      ColSpec(4, "page_url", "string", required = false),
      ColSpec(5, "duration_ms", "int", required = false),
      ColSpec(6, "ts", "timestamp", required = false))
    def eventRows(ids: Range): Seq[Seq[Any]] = ids.map { i =>
      Seq[Any](
        i.toLong, 1000L + rng.nextInt(201),
        EventTypes(rng.nextInt(EventTypes.size)),
        PageUrls(rng.nextInt(PageUrls.size)),
        100 + rng.nextInt(29901),
        new Timestamp(BaseTs + (rng.nextDouble() * 300 * 86400000L).toLong))
    }
    writeTable(spark, s"$warehouseDir/analytics/events",
      Seq(eventsSchema), Some("event_type"),
      Seq(
        Commit("append", eventRows(1 to 25), 0),
        Commit("append", eventRows(26 to 50), 0),
        Commit("append", eventRows(51 to 75), 0)))

    // staging.metrics — the quickstart's wide table: 1 snapshot, 12 rows
    // (ref quickstart/seed.py:123-170)
    val metricsSchema = Seq(
      ColSpec(1, "metric_id", "long", required = true),
      ColSpec(2, "host", "string", required = false),
      ColSpec(3, "service", "string", required = false),
      ColSpec(4, "cpu_pct", "double", required = false),
      ColSpec(5, "mem_pct", "double", required = false),
      ColSpec(6, "disk_read_bytes", "long", required = false),
      ColSpec(7, "net_rx_bytes", "long", required = false),
      ColSpec(8, "error_count", "int", required = false),
      ColSpec(9, "request_count", "int", required = false),
      ColSpec(10, "is_healthy", "boolean", required = false),
      ColSpec(11, "collected_at", "timestamp", required = false))
    val metricRows = (1 to 12).map { i =>
      Seq[Any](
        i.toLong, s"host-${i % 4}", Seq("api", "etl", "web")(i % 3),
        math.rint(rng.nextDouble() * 10000) / 100,
        math.rint(rng.nextDouble() * 10000) / 100,
        rng.nextInt(1 << 20).toLong, rng.nextInt(1 << 20).toLong,
        rng.nextInt(10), 100 + rng.nextInt(9900), rng.nextInt(10) > 0,
        new Timestamp(BaseTs + i * 60000L))
    }
    writeTable(spark, s"$warehouseDir/staging/metrics",
      Seq(metricsSchema), None, Seq(Commit("append", metricRows, 0)))

    // legacy.inventory — a FORMAT-V1 table with nested struct/list fields:
    // exercises the v1 singular schema/partition-spec keys and the nested
    // type parser (mixed-version warehouses are the reason the reference
    // has a format-version census, tui/widgets.py:996-1001)
    writeV1Table(s"$warehouseDir/legacy/inventory")

    warehouseDir
  }

  /** Minimal Iceberg FORMAT-V1 table: singular `schema` / `partition-spec`
    * keys (no `schemas`/`partition-specs` lists, no `current-schema-id`),
    * one snapshot with a real Avro manifest, and nested struct + list
    * fields. The metadata JSON is authored directly — `IcebergMeta.render`
    * deliberately emits only the v2 shape. */
  def writeV1Table(tableDir: String): Unit = {
    val dir = Paths.get(tableDir)
    Files.createDirectories(dir.resolve("metadata"))
    val snapId = 3000L
    val entries = (0 until 3).map { i =>
      DataFileEntry(
        status = 1, snapshotId = snapId, content = 0,
        filePath = f"data/inv-$i%03d.parquet", fileFormat = "PARQUET",
        partition = Map("warehouse_id" -> (i % 2).toString),
        recordCount = 40L + i, fileSizeInBytes = 9000L + i * 512L,
        columnSizes = Map(1 -> 2048L, 2 -> 4096L),
        valueCounts = Map(1 -> (40L + i), 2 -> (40L + i)),
        nullValueCounts = Map(1 -> 0L, 2 -> 1L),
        lowerBounds = Map(1 -> IcebergDecode.encode("long", i * 100L)),
        upperBounds = Map(1 -> IcebergDecode.encode("long", i * 100L + 99L)))
    }
    val manifestPath = s"metadata/manifest-$snapId.avro"
    AvroManifests.writeManifest(dir.resolve(manifestPath).toString, entries)
    val manifests = Seq(ManifestFile(
      manifestPath, Files.size(dir.resolve(manifestPath)), 0, 0, snapId,
      entries.size, 0, 0, entries.map(_.recordCount).sum, 0, 0))
    val listPath = s"metadata/snap-$snapId.avro"
    AvroManifests.writeManifestList(dir.resolve(listPath).toString, manifests)

    val uuid = java.util.UUID.nameUUIDFromBytes(tableDir.getBytes).toString
    val json =
      s"""{
         |  "format-version": 1,
         |  "table-uuid": "$uuid",
         |  "location": "$tableDir",
         |  "last-updated-ms": ${BaseTs + 7200000L},
         |  "schema": {
         |    "type": "struct",
         |    "fields": [
         |      {"id": 1, "name": "item_id", "required": true, "type": "long"},
         |      {"id": 2, "name": "warehouse_id", "required": true, "type": "int"},
         |      {"id": 3, "name": "attrs", "required": false, "type": {
         |        "type": "struct",
         |        "fields": [
         |          {"id": 4, "name": "color", "required": false, "type": "string"},
         |          {"id": 5, "name": "weight_kg", "required": false, "type": "double"}
         |        ]}},
         |      {"id": 6, "name": "tags", "required": false, "type": {
         |        "type": "list", "element-id": 7, "element": "string",
         |        "element-required": false}}
         |    ]},
         |  "partition-spec": [
         |    {"name": "warehouse_id", "transform": "identity", "source-id": 2, "field-id": 1000}
         |  ],
         |  "default-spec-id": 0,
         |  "properties": {"owner": "legacy-team"},
         |  "current-snapshot-id": $snapId,
         |  "snapshots": [
         |    {"snapshot-id": $snapId, "timestamp-ms": ${BaseTs + 7200000L},
         |     "summary": {"operation": "append",
         |       "total-data-files": "${entries.size}",
         |       "total-records": "${entries.map(_.recordCount).sum}",
         |       "total-files-size": "${entries.map(_.fileSizeInBytes).sum}"},
         |     "manifest-list": "$listPath"}
         |  ]
         |}""".stripMargin
    Files.writeString(dir.resolve("metadata/v1.metadata.json"), json)
  }

  /** A MANY-MANIFEST metadata-only fixture for pricing the manifest-level
    * pruning tier (round 18): `nManifests` data manifests, each holding
    * `entriesPer` entries over a CONTIGUOUS range of the identity
    * partition `k` (manifest i covers k in [i*kPer, i*kPer + kPer-1]),
    * with partition field summaries STAMPED on the manifest list — the
    * post-rewrite_manifests steady state at streaming-table scale. Data
    * paths are synthetic (planning never opens them); only scan-PLANNING
    * may touch this table. */
  def writeManyManifests(tableDir: String,
      nManifests: Int = 200, entriesPer: Int = 100): Unit = {
    val dir = Paths.get(tableDir)
    Files.createDirectories(dir.resolve("metadata"))
    val snapId = 6000L
    val kPer = 5
    val manifests = (0 until nManifests).map { i =>
      val entries = (0 until entriesPer).map { j =>
        val k = i * kPer + (j % kPer)
        DataFileEntry(
          status = 1, snapshotId = snapId, content = 0,
          filePath = f"data/mp-$i%03d-$j%03d.parquet", fileFormat = "PARQUET",
          partition = Map("k" -> k.toString),
          recordCount = 50L, fileSizeInBytes = 8192L,
          columnSizes = Map(1 -> 2048L), valueCounts = Map(1 -> 50L),
          nullValueCounts = Map(1 -> 0L),
          lowerBounds = Map(1 -> IcebergDecode.encode("long", j * 100L)),
          upperBounds = Map(1 -> IcebergDecode.encode("long", j * 100L + 99L)))
      }
      val mPath = f"metadata/manifest-$snapId-$i%03d.avro"
      AvroManifests.writeManifest(dir.resolve(mPath).toString, entries)
      ManifestFile(
        mPath, Files.size(dir.resolve(mPath)), 0, 0, snapId,
        entries.size, 0, 0, entries.map(_.recordCount).sum, 0, 0,
        partitions = Seq(PartitionFieldSummary("k", containsNull = false,
          Some((i * kPer).toString), Some((i * kPer + kPer - 1).toString))))
    }
    val listPath = s"metadata/snap-$snapId.avro"
    AvroManifests.writeManifestList(dir.resolve(listPath).toString, manifests)
    val uuid = java.util.UUID.nameUUIDFromBytes(tableDir.getBytes).toString
    val nFiles = nManifests.toLong * entriesPer
    val json =
      s"""{
         |  "format-version": 1,
         |  "table-uuid": "$uuid",
         |  "location": "$tableDir",
         |  "last-updated-ms": ${BaseTs + 7200000L},
         |  "schema": {
         |    "type": "struct",
         |    "fields": [
         |      {"id": 1, "name": "id", "required": true, "type": "long"},
         |      {"id": 2, "name": "k", "required": true, "type": "int"}
         |    ]},
         |  "partition-spec": [
         |    {"name": "k", "transform": "identity", "source-id": 2, "field-id": 1000}
         |  ],
         |  "default-spec-id": 0,
         |  "properties": {},
         |  "current-snapshot-id": $snapId,
         |  "snapshots": [
         |    {"snapshot-id": $snapId, "timestamp-ms": ${BaseTs + 7200000L},
         |     "summary": {"operation": "append",
         |       "total-data-files": "$nFiles",
         |       "total-records": "${nFiles * 50L}",
         |       "total-files-size": "${nFiles * 8192L}"},
         |     "manifest-list": "$listPath"}
         |  ]
         |}""".stripMargin
    Files.writeString(dir.resolve("metadata/v1.metadata.json"), json)
  }

  /** A v2 table carrying a live DELETE manifest (position deletes):
    * commit 1 appends 3 REAL parquet data files, commit 2 adds a delete
    * manifest (content=1) whose entries are REAL position-delete parquet
    * files (`file_path` string, `pos` long — the Iceberg v2 delete
    * schema) marking rows of two data files. Exercises the manifest
    * census's delete branch (`compaction_recommended`, ref
    * `formatters.py:452-462`), the `files()` vs `deleteFiles()` split,
    * and merge-on-read delete application
    * ([[graft.ops.ScanPlanner.readTable]]). */
  def writeDeletesTable(spark: SparkSession, tableDir: String): Unit = {
    val dir = Paths.get(tableDir)
    Files.createDirectories(dir.resolve("data"))
    Files.createDirectories(dir.resolve("metadata"))
    val dataSnap = 4000L
    val delSnap = 4001L

    def writeOneParquet(rows: Seq[Row], schema: StructType, relPath: String): Long = {
      val tmp = Files.createTempDirectory("graft-del-fixture")
      spark.createDataFrame(rows.asJava, schema)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val target = dir.resolve(relPath)
      Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
      Files.list(tmp).iterator().asScala.foreach(Files.deleteIfExists)
      Files.deleteIfExists(tmp)
      Files.size(target)
    }

    val rowSchema = StructType(Seq(
      StructField("row_id", LongType, nullable = false),
      StructField("payload", StringType, nullable = true),
      StructField("shard", IntegerType, nullable = true)))
    val dataEntries = (0 until 3).map { i =>
      val rows = (0 until 100 + i).map(r =>
        Row((i * 1000L) + r, s"payload-$i-$r", i % 2))
      val relPath = f"data/cdc-$i%03d.parquet"
      val size = writeOneParquet(rows, rowSchema, relPath)
      DataFileEntry(
        status = 1, snapshotId = dataSnap, content = 0,
        filePath = relPath, fileFormat = "PARQUET",
        partition = Map("shard" -> (i % 2).toString),
        recordCount = rows.size.toLong, fileSizeInBytes = size,
        columnSizes = Map(1 -> 4096L, 2 -> 8192L),
        valueCounts = Map(1 -> rows.size.toLong, 2 -> rows.size.toLong),
        nullValueCounts = Map(1 -> 0L, 2 -> 0L),
        lowerBounds = Map(1 -> IcebergDecode.encode("long", i * 1000L)),
        upperBounds = Map(1 -> IcebergDecode.encode("long", i * 1000L + 99L + i)),
        sequenceNumber = 1L)
    }
    val dataManifestPath = s"metadata/manifest-$dataSnap.avro"
    AvroManifests.writeManifest(dir.resolve(dataManifestPath).toString, dataEntries)
    val dataManifest = ManifestFile(
      dataManifestPath, Files.size(dir.resolve(dataManifestPath)), 0,
      content = 0, dataSnap, dataEntries.size, 0, 0,
      dataEntries.map(_.recordCount).sum, 0, 0)

    // position-delete files (Iceberg v2 delete schema): delete the first
    // 10+i even positions of data files 0 and 1; file_path is the same
    // table-relative path the data manifest records
    val delSchema = StructType(Seq(
      StructField("file_path", StringType, nullable = false),
      StructField("pos", LongType, nullable = false)))
    val deleteEntries = (0 until 2).map { i =>
      val positions = (0 until 10 + i).map(p => 2L * p) // even rows
      val rows = positions.map(p => Row(f"data/cdc-$i%03d.parquet", p))
      val relPath = f"data/cdc-delete-$i%03d.parquet"
      val size = writeOneParquet(rows, delSchema, relPath)
      DataFileEntry(
        status = 1, snapshotId = delSnap, content = 1,
        filePath = relPath, fileFormat = "PARQUET",
        partition = Map("shard" -> i.toString),
        recordCount = positions.size.toLong, fileSizeInBytes = size,
        columnSizes = Map.empty, valueCounts = Map.empty,
        nullValueCounts = Map.empty, lowerBounds = Map.empty,
        upperBounds = Map.empty, sequenceNumber = 2L)
    }
    // an EQUALITY delete file (content=2): deletes rows of ANY data file
    // whose row_id matches — here two rows of data file 2
    val eqSchema = StructType(Seq(StructField("row_id", LongType, nullable = false)))
    val eqEntries = {
      val rows = Seq(2001L, 2003L).map(Row(_))
      val relPath = "data/cdc-eqdelete-000.parquet"
      val size = writeOneParquet(rows, eqSchema, relPath)
      Seq(DataFileEntry(
        status = 1, snapshotId = delSnap, content = 2,
        filePath = relPath, fileFormat = "PARQUET",
        partition = Map.empty,
        recordCount = rows.size.toLong, fileSizeInBytes = size,
        columnSizes = Map.empty, valueCounts = Map.empty,
        nullValueCounts = Map.empty, lowerBounds = Map.empty,
        upperBounds = Map.empty, equalityIds = Seq(1),
        sequenceNumber = 2L))
    }
    val allDeleteEntries = deleteEntries ++ eqEntries
    val delManifestPath = s"metadata/manifest-$delSnap-deletes.avro"
    AvroManifests.writeManifest(dir.resolve(delManifestPath).toString, allDeleteEntries)
    val delManifest = ManifestFile(
      delManifestPath, Files.size(dir.resolve(delManifestPath)), 0,
      content = 1, delSnap, allDeleteEntries.size, 0, 0,
      allDeleteEntries.map(_.recordCount).sum, 0, 0)

    val list1 = s"metadata/snap-$dataSnap.avro"
    AvroManifests.writeManifestList(dir.resolve(list1).toString, Seq(dataManifest))
    val list2 = s"metadata/snap-$delSnap.avro"
    AvroManifests.writeManifestList(dir.resolve(list2).toString,
      Seq(dataManifest, delManifest))

    val schema = Seq(
      ColSpec(1, "row_id", "long", required = true),
      ColSpec(2, "payload", "string", required = false),
      ColSpec(3, "shard", "int", required = false))
    val snapshots = Seq(
      Snapshot(dataSnap, None, BaseTs, "append",
        Map("operation" -> "append",
          "total-data-files" -> dataEntries.size.toString,
          "total-records" -> dataEntries.map(_.recordCount).sum.toString,
          "total-files-size" -> dataEntries.map(_.fileSizeInBytes).sum.toString),
        list1, sequenceNumber = 1L),
      Snapshot(delSnap, Some(dataSnap), BaseTs + 3600000L, "delete",
        Map("operation" -> "delete",
          "total-data-files" -> dataEntries.size.toString,
          "total-records" -> dataEntries.map(_.recordCount).sum.toString,
          "total-files-size" -> dataEntries.map(_.fileSizeInBytes).sum.toString,
          "total-delete-files" -> allDeleteEntries.size.toString,
          "total-position-deletes" -> deleteEntries.map(_.recordCount).sum.toString,
          "total-equality-deletes" -> eqEntries.map(_.recordCount).sum.toString),
        list2, sequenceNumber = 2L))
    val md = TableMetadata(2,
      java.util.UUID.nameUUIDFromBytes(tableDir.getBytes).toString,
      tableDir, BaseTs + 3600000L, 0,
      Seq(IceSchema(0, schema.map(c => SchemaField(c.id, c.name, c.required, c.iceType, c.name)))),
      0, Seq(PartitionSpec(0, Seq(SpecField("shard", "identity", 3, 1000)))),
      Map("owner" -> "cdc-team"),
      Some(delSnap), snapshots)
    Files.writeString(dir.resolve("metadata/v1.metadata.json"), IcebergMeta.render(md))
  }

  // --------------------------------------------------------- monster table

  /** Pure-metadata stress table: `nCommits` commits × `filesPerCommit`
    * entries with deliberately overlapping id ranges (ref
    * `generate_monster_table.py:76-77`). Data files are not materialized —
    * the engine reads only metadata. */
  def writeMonster(
      tableDir: String,
      nCommits: Int = 5,
      filesPerCommit: Int = 1000,
      rowsPerFile: Long = 10L): Unit = {
    val dir = Paths.get(tableDir)
    Files.createDirectories(dir.resolve("metadata"))
    val schema = Seq(
      ColSpec(1, "id", "long", required = true),
      ColSpec(2, "data", "string", required = false),
      ColSpec(3, "category", "string", required = false),
      ColSpec(4, "ts", "timestamp", required = false))

    var allManifests = Vector.empty[ManifestFile]
    var snapshots = Vector.empty[Snapshot]
    var prev: Option[Long] = None
    var totalFiles = 0L
    var totalRows = 0L
    var totalSize = 0L

    (0 until nCommits).foreach { ci =>
      val snapId = 2000L + ci
      val entries = (0 until filesPerCommit).map { fi =>
        val bucket = fi % filesPerCommit
        // overlapping id ranges across commits and neighbor buckets
        val lo = (bucket * 37L + ci * 91L) % 50000L
        val hi = lo + 400L + (fi % 13) * 100L
        val size = 4096L + (fi * 977L + ci * 131L) % 60000L
        DataFileEntry(
          status = 1, snapshotId = snapId, content = 0,
          filePath = f"data/m-$ci%02d-$fi%05d.parquet", fileFormat = "PARQUET",
          partition = Map("bucket" -> (bucket % 1000).toString),
          recordCount = rowsPerFile, fileSizeInBytes = size,
          columnSizes = schema.map(c => c.id -> (size / 4)).toMap,
          valueCounts = schema.map(c => c.id -> rowsPerFile).toMap,
          nullValueCounts = schema.map(c => c.id -> (if (c.id == 2) fi % 3L else 0L)).toMap,
          lowerBounds = Map(1 -> IcebergDecode.encode("long", lo)),
          upperBounds = Map(1 -> IcebergDecode.encode("long", hi)),
          sequenceNumber = ci + 1L)
      }
      val manifestPath = s"metadata/manifest-$snapId.avro"
      AvroManifests.writeManifest(dir.resolve(manifestPath).toString, entries)
      allManifests = allManifests :+ ManifestFile(
        manifestPath, Files.size(dir.resolve(manifestPath)), 0, 0, snapId,
        entries.size, 0, 0, entries.map(_.recordCount).sum, 0, 0)
      val listPath = s"metadata/snap-$snapId.avro"
      AvroManifests.writeManifestList(dir.resolve(listPath).toString, allManifests)
      totalFiles += entries.size
      totalRows += entries.map(_.recordCount).sum
      totalSize += entries.map(_.fileSizeInBytes).sum
      snapshots = snapshots :+ Snapshot(snapId, prev, BaseTs + ci * 60000L, "append",
        Map("operation" -> "append",
          "total-data-files" -> totalFiles.toString,
          "total-records" -> totalRows.toString,
          "total-files-size" -> totalSize.toString),
        listPath, sequenceNumber = ci + 1L)
      prev = Some(snapId)
    }

    val md = TableMetadata(2,
      java.util.UUID.nameUUIDFromBytes(tableDir.getBytes).toString,
      tableDir, BaseTs + nCommits * 60000L, 0,
      Seq(IceSchema(0, schema.map(c => SchemaField(c.id, c.name, c.required, c.iceType, c.name)))),
      0, Seq(PartitionSpec(0, Seq(SpecField("bucket", "bucket[1000]", 1, 1000)))),
      Map("owner" -> "bench"),
      snapshots.lastOption.map(_.snapshotId), snapshots)
    Files.writeString(dir.resolve("metadata/v1.metadata.json"), IcebergMeta.render(md))
  }
}
