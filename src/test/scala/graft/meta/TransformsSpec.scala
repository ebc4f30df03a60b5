package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.api.Engine
import graft.expr.IcebergTransformOps
import graft.fixtures.FixtureWriter
import graft.ops.ScanPlanner

/** Iceberg partition transforms: the murmur3 bucket kernel against the
  * spec's published test vectors (Iceberg spec Appendix B), transform
  * parsing/naming, and the write→prune round trip — a bucket[N] append
  * lays files out by bucket number, and an equality predicate on the
  * SOURCE column prunes to exactly the one bucket's files while returning
  * the same rows as the unpruned filtered read. */
class TransformsSpec extends SparkSpec {

  import spark.implicits._

  test("bucket hash matches the Iceberg spec Appendix B vectors") {
    assert(IcebergTransformOps.hashLong(34L) == 2017239379)
    assert(IcebergTransformOps.hashBytes(
      "iceberg".getBytes("UTF-8")) == 1210000089)
    // date 2017-11-16 = 17486 days, hashed as the promoted long
    assert(IcebergTransformOps.hashLong(17486L) == -653330422)
    // timestamp 2017-11-16T22:31:08 = 1510871468000000 micros
    assert(IcebergTransformOps.hashLong(1510871468000000L) == -2047944441)
    // bucket = (hash & Int.MaxValue) % N
    assert(IcebergTransformOps.bucketLong(34L, 16) == (2017239379 & Int.MaxValue) % 16)
  }

  test("declaration parsing and partition-field naming") {
    assert(Transforms.parseDecl("region") == ("region" -> "identity"))
    assert(Transforms.parseDecl("bucket[16](order_id)") == ("order_id" -> "bucket[16]"))
    assert(Transforms.parseDecl("truncate[4](customer_name)") ==
      ("customer_name" -> "truncate[4]"))
    intercept[IllegalArgumentException](Transforms.parseDecl("year(ts)"))
    assert(Transforms.fieldName("order_id", "bucket[16]") == "order_id_bucket")
    assert(Transforms.fieldName("customer_name", "truncate[4]") == "customer_name_trunc")
    assert(Transforms.fieldName("region", "identity") == "region")
  }

  test("truncate literal semantics: floor-to-width incl. negatives; string prefix") {
    assert(IcebergTransformOps.truncateLong(17L, 5L) == 15L)
    assert(IcebergTransformOps.truncateLong(-1L, 5L) == -5L)
    assert(IcebergTransformOps.truncateLong(-5L, 5L) == -5L)
    assert(Transforms.literal("truncate[3]", "abcdef", "string").contains("abc"))
    assert(Transforms.literal("bucket[8]", "34", "long")
      .contains(IcebergTransformOps.bucketLong(34L, 8).toString))
  }

  test("bucket[N] spec: append lays out by bucket, equality prunes to one bucket") {
    val wh = Files.createTempDirectory("graft-transform-wh").toString
    FixtureWriter.writeDemo(spark, wh)
    val tableDir = s"$wh/sales/orders"
    SchemaEvolution.setPartitionSpec(tableDir, Seq("bucket[4](order_id)"))

    val rows = (200L until 240L).map(i =>
      (i, s"Cust $i", s"r${i % 3}", i * 1.5, java.sql.Date.valueOf("2024-04-01"),
        java.sql.Timestamp.valueOf("2024-04-01 10:00:00")))
    val df = rows.toDF(
      "order_id", "customer_name", "region", "amount", "order_date", "created_at")
    val res = TableWriter.append(spark, tableDir, df)

    val t = IcebergTable.load(tableDir)
    val newFiles = t.files().filter(_.snapshotId == res.snapshotId)
    // one file per non-empty bucket, keyed by the spec field name
    assert(newFiles.nonEmpty && newFiles.size <= 4)
    newFiles.foreach { e =>
      assert(e.partition.keySet == Set("order_id_bucket"))
    }
    val expected = rows.map(r =>
      IcebergTransformOps.bucketLong(r._1, 4).toString).toSet
    assert(newFiles.flatMap(_.partition.get("order_id_bucket")).toSet == expected)

    // pruned read for order_id = 210: only files that may hold bucket(210)
    // — the old identity-spec files (no such key) plus exactly one bucket
    val target = 210L
    val bucket = IcebergTransformOps.bucketLong(target, 4).toString
    val files = graft.rel.MetaRelations.files(spark, t, None)
    val pruned = ScanPlanner.pruneFiles(spark, t, files, "order_id",
      Some(target.toDouble), Some(target.toDouble),
      partitionEquals = Map("order_id" -> target.toString))
      .select("file_path").collect().map(_.getString(0)).toSet
    val newKept = newFiles.filter(e => pruned.contains(e.filePath))
    assert(newKept.map(_.partition("order_id_bucket")).toSet == Set(bucket))

    // parity: pruned+residual read == unpruned read + filter
    val viaPlanner = ScanPlanner.readTableWhere(spark, t, "order_id",
      Some(target.toDouble), Some(target.toDouble),
      partitionEquals = Map("order_id" -> target.toString))
    val full = ScanPlanner.readTable(spark, t).filter(col("order_id") === target)
    assert(viaPlanner.count() == 1L)
    assert(viaPlanner.select("order_id", "customer_name").as[(Long, String)].collect().toSet ==
      full.select("order_id", "customer_name").as[(Long, String)].collect().toSet)
  }

  test("readTableWhereIn: an IN-set probe opens only colliding bucket files, row parity") {
    val wh = Files.createTempDirectory("graft-in-wh").toString
    FixtureWriter.writeDemo(spark, wh)
    val tableDir = s"$wh/sales/orders"
    SchemaEvolution.setPartitionSpec(tableDir, Seq("bucket[8](order_id)"))
    val rows = (400L until 480L).map(i =>
      (i, s"Cust $i", s"r${i % 3}", i * 1.5, java.sql.Date.valueOf("2024-05-01"),
        java.sql.Timestamp.valueOf("2024-05-01 10:00:00")))
    val res = TableWriter.append(spark, tableDir, rows.toDF(
      "order_id", "customer_name", "region", "amount", "order_date", "created_at"))

    val t = IcebergTable.load(tableDir)
    val newFiles = t.files().filter(_.snapshotId == res.snapshotId)
    assert(newFiles.size >= 4) // 80 ids across 8 buckets

    // probe three ids: files from the bucketed snapshot outside those
    // ids' buckets must not be opened; identity-era files survive
    // conservatively, and the residual IN keeps the result exact
    val probe = Seq(410L, 411L, 455L)
    val buckets = probe.map(IcebergTransformOps.bucketLong(_, 8).toString).toSet
    val in = ScanPlanner.readTableWhereIn(
      spark, t, "order_id", probe.map(_.toString))
    val full = ScanPlanner.readTable(spark, t)
      .filter(col("order_id").isin(probe: _*))
    assert(in.select("order_id").as[Long].collect().sorted.toSeq ==
      full.select("order_id").as[Long].collect().sorted.toSeq)
    assert(in.count() == probe.size.toLong)

    // plan-level check: the scanned file set excludes non-colliding
    // bucketed files (strictly fewer than the snapshot holds)
    val scanned = in.queryExecution.executedPlan.toString
    val excluded = newFiles.filterNot(e =>
      e.partition.get("order_id_bucket").forall(buckets.contains))
    assert(excluded.nonEmpty)
    excluded.foreach { e =>
      assert(!scanned.contains(e.filePath.split('/').last),
        s"non-colliding bucket file ${e.filePath} was opened")
    }
  }

  test("readTableWhereIn: an unmappable value disables pruning for the field (conservative)") {
    val wh = Files.createTempDirectory("graft-in-wh2").toString
    FixtureWriter.writeDemo(spark, wh)
    val tableDir = s"$wh/sales/orders"
    SchemaEvolution.setPartitionSpec(tableDir, Seq("bucket[8](created_at)"))
    val rows = (500L until 540L).map(i =>
      (i, s"Cust $i", s"r${i % 3}", i * 1.5, java.sql.Date.valueOf("2024-06-01"),
        java.sql.Timestamp.valueOf(s"2024-06-01 10:00:${i % 40}")))
    TableWriter.append(spark, tableDir, rows.toDF(
      "order_id", "customer_name", "region", "amount", "order_date", "created_at"))
    val t = IcebergTable.load(tableDir)
    // the ISO 'T' form: Transforms.literal (Timestamp.valueOf) cannot
    // parse it -> the bucket field must emit NO prune condition — while
    // Spark's residual cast CAN parse it, so matching rows exist. The
    // pre-fix behavior pruned every value-carrying file (empty isin)
    // and silently returned zero rows.
    val in = ScanPlanner.readTableWhereIn(
      spark, t, "created_at", Seq("2024-06-01T10:00:07"))
    assert(in.count() == 1L)
    // 527 % 40 == 7 -> the one row whose created_at second is :07
    assert(in.select("order_id").collect().map(_.getLong(0)).toSeq == Seq(527L))
  }

  test("truncate[W] string spec: files keyed by prefix, prune + row parity") {
    val wh = Files.createTempDirectory("graft-trunc-wh").toString
    FixtureWriter.writeDemo(spark, wh)
    val tableDir = s"$wh/sales/orders"
    SchemaEvolution.setPartitionSpec(tableDir, Seq("truncate[2](customer_name)"))

    val rows = Seq(
      (300L, "Alpha One", "r0", 1.0), (301L, "Alpha Two", "r1", 2.0),
      (302L, "Beta Red", "r0", 3.0), (303L, "Gamma X", "r2", 4.0))
    val df = rows.map { case (id, n, r, a) =>
      (id, n, r, a, java.sql.Date.valueOf("2024-04-02"),
        java.sql.Timestamp.valueOf("2024-04-02 09:00:00")) }
      .toDF("order_id", "customer_name", "region", "amount", "order_date", "created_at")
    val res = TableWriter.append(spark, tableDir, df)

    val t = IcebergTable.load(tableDir)
    val newFiles = t.files().filter(_.snapshotId == res.snapshotId)
    assert(newFiles.map(_.partition("customer_name_trunc")).toSet == Set("Al", "Be", "Ga"))

    // equality predicate on the source string prunes to the one prefix
    val files = graft.rel.MetaRelations.files(spark, t, None)
    val pruned = ScanPlanner.pruneFiles(spark, t, files, "order_id", None, None,
      partitionEquals = Map("customer_name" -> "Beta Red"))
      .select("file_path").collect().map(_.getString(0)).toSet
    val newKept = newFiles.filter(e => pruned.contains(e.filePath))
    assert(newKept.map(_.partition("customer_name_trunc")).toSet == Set("Be"))
  }

  test("identity literals canonicalize; literalForms keeps the raw " +
      "spelling beside the canonical (foreign manifests); invalid " +
      "calendar dates and junk decimals refuse; IEEE specials parse") {
    // canonicalization: the engine's cast-to-string renderings
    assert(Transforms.literal("identity", "0123", "int") == Some("123"))
    assert(Transforms.literal("identity", "2024-1-5", "date") == Some("2024-01-05"))
    assert(Transforms.literal("identity",
      "2024-01-05T10:20:30.0", "timestamp") == Some("2024-01-05 10:20:30"))
    assert(Transforms.literal("identity", "1.50", "double") == Some("1.5"))
    // raw form rides beside the canonical for foreign-stored manifests
    assert(Transforms.literalForms("identity", "0123", "int") ==
      Some(Seq("123", "0123")))
    assert(Transforms.literalForms("identity", "x", "string") == Some(Seq("x")))
    // a type outside the canonicalizable set keeps the raw comparison
    assert(Transforms.literal("identity", "abc", "uuid") == Some("abc"))
    // unparseable probe values disable pruning (conservative)
    assert(Transforms.literal("identity", "abc", "int").isEmpty)
    assert(Transforms.literal("identity", "2024-02-30", "date").isEmpty,
      "an invalid calendar date must not silently normalize")
    // the engine's own IEEE specials round-trip
    assert(Transforms.literal("identity", "NaN", "double") == Some("NaN"))
    assert(Transforms.literal("identity", "-Infinity", "float") == Some("-Infinity"))
    // path-value gates: junk decimal spellings refuse loudly
    intercept[IllegalArgumentException](
      TableWriter.typedPartitionValue("float", "1.5f"))
    intercept[Exception](TableWriter.typedPartitionValue("date", "2024-02-30"))
    // sub-microsecond timestamps truncate to what the read path serves
    assert(TableWriter.canonicalPartitionValue(
      "timestamp", "2024-01-05 00:00:00.123456789") == "2024-01-05 00:00:00.123456")
  }
}
