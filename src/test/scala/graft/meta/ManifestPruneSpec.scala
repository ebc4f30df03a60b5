package graft.meta

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import graft.SparkSpec

/** Manifest-LEVEL pruning (round 18): manifest-list entries carry
  * Iceberg-spec partition field summaries, and scan planning skips a
  * manifest — never opening its Avro — when the summary range excludes
  * every probed value. The decisive assertions DELETE the excluded
  * manifests from disk and prove the probe still answers: the only way
  * that works is if no tier opened them. */
class ManifestPruneSpec extends SparkSpec {

  import spark.implicits._

  private def intTable(): String = {
    val dir = Files.createTempDirectory("graft-mprune").toString + "/t"
    TableCreator.create(dir, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.IntegerType))),
      partitionDecls = Seq("k"))
    dir
  }

  private def entry(vals: Map[String, String]) = DataFileEntry(
    status = 1, snapshotId = 1L, content = 0, filePath = "data/x.parquet",
    fileFormat = "PARQUET", partition = vals, recordCount = 1L,
    fileSizeInBytes = 1L, columnSizes = Map.empty, valueCounts = Map.empty,
    nullValueCounts = Map.empty, lowerBounds = Map.empty,
    upperBounds = Map.empty)

  test("append commits stamp TYPED partition summaries on the manifest list") {
    val dir = intTable()
    TableWriter.append(spark, dir, Seq((1L, 2), (2L, 10)).toDF("id", "k"))
    val t = IcebergTable.load(dir)
    val ms = t.manifests().filter(_.content == 0)
    assert(ms.size == 1)
    val Seq(s) = ms.head.partitions
    assert(s.name == "k" && !s.containsNull)
    // typed ordering: a string min/max would have said lower = "10"
    assert(s.lower.contains("2") && s.upper.contains("10"))
  }

  test("ManifestSummaries.of: raw spellings canonicalize, nulls flag, " +
      "missing keys and unparseable forms drop the field") {
    val md = IcebergTable.load(intTable()).metadata
    val specId = md.currentSpec.specId
    // a foreign "0123" parses as 123 and the bound stores canonically
    assert(ManifestSummaries.of(md, specId,
      Seq(entry(Map("k" -> "0123")), entry(Map("k" -> "7")))) ==
      Seq(PartitionFieldSummary("k", containsNull = false,
        Some("7"), Some("123"))))
    // all-null: containsNull with NO bounds (a non-null probe prunes)
    assert(ManifestSummaries.of(md, specId,
      Seq(entry(Map("k" -> Transforms.NullPartitionValue)))) ==
      Seq(PartitionFieldSummary("k", containsNull = true, None, None)))
    // an entry MISSING the key (older-spec file) drops the field
    assert(ManifestSummaries.of(md, specId,
      Seq(entry(Map.empty), entry(Map("k" -> "1")))).isEmpty)
    // an unparseable foreign spelling drops the field
    assert(ManifestSummaries.of(md, specId,
      Seq(entry(Map("k" -> "1,5")))).isEmpty)
  }

  test("mayMatch: in-range and raw-spelled probes keep, out-of-range prunes, " +
      "summary-less manifests always keep") {
    val md = IcebergTable.load(intTable()).metadata
    def mf(parts: Seq[PartitionFieldSummary]) = ManifestFile(
      "m.avro", 1L, md.currentSpec.specId, 0, 1L, 1, 0, 0, 1L, 0L, 0L, parts)
    val summarized = mf(Seq(
      PartitionFieldSummary("k", containsNull = false, Some("5"), Some("40"))))
    def probe(forms: String*) =
      ManifestSummaries.mayMatch(md, summarized, Seq("k" -> Some(forms.toSet)))
    assert(probe("5") && probe("40") && probe("17"))
    assert(probe("0017")) // raw spelling parses to an in-range value
    assert(!probe("4") && !probe("41") && !probe("100"))
    assert(!probe(Transforms.NullPartitionValue)) // no nulls inside
    assert(probe("41", "17")) // IN-set: one in-range value keeps
    assert(probe("not-an-int")) // unparseable probe: conservative keep
    // un-prunable group (None) and legacy manifests keep
    assert(ManifestSummaries.mayMatch(md, summarized, Seq("k" -> None)))
    assert(ManifestSummaries.mayMatch(md, mf(Seq.empty),
      Seq("k" -> Some(Set("100")))))
    // all-null summary: only the null probe matches
    val allNull = mf(Seq(
      PartitionFieldSummary("k", containsNull = true, None, None)))
    assert(!ManifestSummaries.mayMatch(md, allNull, Seq("k" -> Some(Set("3")))))
    assert(ManifestSummaries.mayMatch(md, allNull,
      Seq("k" -> Some(Set(Transforms.NullPartitionValue)))))
  }

  test("NaN partition values are never summarized, and NaN-bearing " +
      "foreign summaries keep instead of pruning") {
    val dir = Files.createTempDirectory("graft-mprune-nan").toString + "/t"
    TableCreator.create(dir, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("d",
        org.apache.spark.sql.types.DoubleType))),
      partitionDecls = Seq("d"))
    val md = IcebergTable.load(dir).metadata
    val specId = md.currentSpec.specId
    // a NaN value makes the field unsummarizable (unordered: every range
    // comparison answers false, which would PRUNE files holding matches)
    assert(ManifestSummaries.of(md, specId,
      Seq(entry(Map("d" -> "NaN")), entry(Map("d" -> "10.0")))).isEmpty)
    // a FOREIGN summary carrying NaN bounds keeps conservatively
    val m = ManifestFile("m.avro", 1L, specId, 0, 1L, 1, 0, 0, 1L, 0L, 0L,
      Seq(PartitionFieldSummary("d", containsNull = false,
        Some("1.0"), Some("NaN"))))
    val src = md.currentSchema.fields.find(_.name == "d").get
    assert(ManifestSummaries.mayIntersect(md, m, src.id, Some(5.0), None))
    assert(ManifestSummaries.mayMatch(md, m, Seq("d" -> Some(Set("7.0")))))
  }

  test("one-sided summaries (foreign writers) keep conservatively — " +
      "only the both-absent all-null shape prunes non-null probes") {
    val md = IcebergTable.load(intTable()).metadata
    def mf(lower: Option[String], upper: Option[String]) = ManifestFile(
      "m.avro", 1L, md.currentSpec.specId, 0, 1L, 1, 0, 0, 1L, 0L, 0L,
      Seq(PartitionFieldSummary("k", containsNull = true, lower, upper)))
    val src = md.currentSchema.fields.find(_.name == "k").get
    // one-sided: not a shape our writer emits — may-match
    assert(ManifestSummaries.mayMatch(md, mf(Some("5"), None),
      Seq("k" -> Some(Set("999")))))
    assert(ManifestSummaries.mayMatch(md, mf(None, Some("5")),
      Seq("k" -> Some(Set("999")))))
    assert(ManifestSummaries.mayIntersect(md, mf(Some("5"), None),
      src.id, Some(999.0), None))
    // both absent: all-null, a non-null probe prunes
    assert(!ManifestSummaries.mayMatch(md, mf(None, None),
      Seq("k" -> Some(Set("999")))))
  }

  test("summaries round-trip through Avro; PRE-SUMMARY lists read as empty") {
    val tmp = Files.createTempDirectory("graft-mlrt")
    val mf = ManifestFile("m.avro", 10L, 0, 0, 1L, 1, 0, 0, 5L, 0L, 0L,
      partitions = Seq(
        PartitionFieldSummary("k", containsNull = true, Some("2"), Some("10")),
        PartitionFieldSummary("d", containsNull = false, None, None)))
    val p = tmp.resolve("list.avro").toString
    AvroManifests.writeManifestList(p, Seq(mf))
    assert(AvroManifests.readManifestList(p) == Seq(mf))

    // a manifest list written by a PRE-round-18 writer (no `partitions`
    // field in its schema) must resolve through the reader default
    val legacy = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string"},
        |{"name":"manifest_length","type":"long"},
        |{"name":"partition_spec_id","type":"int"},
        |{"name":"content","type":"int"},
        |{"name":"added_snapshot_id","type":"long"},
        |{"name":"added_files_count","type":"int"},
        |{"name":"existing_files_count","type":"int"},
        |{"name":"deleted_files_count","type":"int"},
        |{"name":"added_rows_count","type":"long"},
        |{"name":"existing_rows_count","type":"long"},
        |{"name":"deleted_rows_count","type":"long"}]}""".stripMargin)
    val lp = tmp.resolve("legacy.avro").toString
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](legacy))
    w.create(legacy, new File(lp))
    val r = new GenericData.Record(legacy)
    r.put("manifest_path", "old.avro"); r.put("manifest_length", 1L)
    r.put("partition_spec_id", 0); r.put("content", 0)
    r.put("added_snapshot_id", 7L); r.put("added_files_count", 1)
    r.put("existing_files_count", 0); r.put("deleted_files_count", 0)
    r.put("added_rows_count", 3L); r.put("existing_rows_count", 0L)
    r.put("deleted_rows_count", 0L)
    w.append(r); w.close()
    val back = AvroManifests.readManifestList(lp)
    assert(back.size == 1 && back.head.manifestPath == "old.avro")
    assert(back.head.partitions.isEmpty) // legacy: prune nothing
  }

  test("a probe never OPENS an excluded manifest: pruned reads survive " +
      "deleting the other manifests' Avro from disk") {
    val dir = intTable()
    TableWriter.append(spark, dir, Seq((1L, 1), (2L, 1)).toDF("id", "k"))
    TableWriter.append(spark, dir, Seq((3L, 2)).toDF("id", "k"))
    TableWriter.append(spark, dir, Seq((4L, 30), (5L, 31)).toDF("id", "k"))
    val t = IcebergTable.load(dir)
    val dataM = t.manifests().filter(_.content == 0)
    assert(dataM.size == 3) // appends carry prior manifests forward
    val kept = dataM.filter(m => ManifestSummaries.mayMatch(t.metadata, m,
      Seq("k" -> Some(Set("2")))))
    assert(kept.size == 1)
    // delete the excluded manifests: any tier trying to open them throws
    dataM.filterNot(kept.contains).foreach(m =>
      Files.delete(Paths.get(t.resolvePath(m.manifestPath))))

    // equality probe (readTableWhereIn)
    val inProbe = graft.ops.ScanPlanner.readTableWhereIn(
      spark, IcebergTable.load(dir), "k", Seq("2"))
    assert(inProbe.select("id", "k").as[(Long, Int)].collect().toSet ==
      Set((3L, 2)))
    // partition-equals probe (readTableWhere)
    val eqProbe = graft.ops.ScanPlanner.readTableWhere(
      spark, IcebergTable.load(dir), "k", None, None,
      partitionEquals = Map("k" -> "2"))
    assert(eqProbe.select("id").as[Long].collect().toSet == Set(3L))
    // RANGE probe through identity summaries (readTableWhere lo/hi)
    val rangeProbe = graft.ops.ScanPlanner.readTableWhere(
      spark, IcebergTable.load(dir), "k", Some(2.0), Some(9.0))
    assert(rangeProbe.select("id").as[Long].collect().toSet == Set(3L))
  }

  test("DELETE-carrying probes classify through the manifest hint: " +
      "pruned MoR reads survive deleting the excluded manifests too") {
    val dir = intTable()
    TableWriter.append(spark, dir, Seq((1L, 1), (2L, 1)).toDF("id", "k"))
    TableWriter.append(spark, dir, Seq((3L, 2), (4L, 2)).toDF("id", "k"))
    TableWriter.append(spark, dir, Seq((5L, 30)).toDF("id", "k"))
    // a position delete puts the table on the MoR path (delete manifest
    // present → readSplit must classify hit vs clean files)
    TableWriter.deleteWhere(spark, dir,
      org.apache.spark.sql.functions.col("id") === 3L)
    val t = IcebergTable.load(dir)
    val dataM = t.manifests().filter(_.content == 0)
    assert(t.manifests().exists(_.content == 1)) // really on the MoR path
    val kept = dataM.filter(m => ManifestSummaries.mayMatch(t.metadata, m,
      Seq("k" -> Some(Set("2")))))
    assert(kept.size == 1)
    dataM.filterNot(kept.contains).foreach(m =>
      Files.delete(Paths.get(t.resolvePath(m.manifestPath))))
    // classification parses ONLY the kept data manifests (the hint) plus
    // the delete manifests — the probe answers with the delete applied
    val probed = graft.ops.ScanPlanner.readTableWhereIn(
      spark, IcebergTable.load(dir), "k", Seq("2"))
    assert(probed.select("id", "k").as[(Long, Int)].collect().toSet ==
      Set((4L, 2)))
  }

  test("DSv2 SQL scans skip excluded manifests through the pushed filters") {
    val wh = Files.createTempDirectory("graft-mprune-sql").toString
    spark.conf.set("spark.sql.catalog.gmp", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmp.lake")
    spark.sql(
      """CREATE TABLE gmp.lake.mp (id BIGINT, k INT) PARTITIONED BY (k)""")
    spark.sql("INSERT INTO gmp.lake.mp VALUES (1, 1), (2, 1)")
    spark.sql("INSERT INTO gmp.lake.mp VALUES (3, 2)")
    spark.sql("INSERT INTO gmp.lake.mp VALUES (4, 30), (5, 31)")
    val t = IcebergTable.load(s"$wh/lake/mp")
    val dataM = t.manifests().filter(_.content == 0)
    assert(dataM.size == 3)
    val kept = dataM.filter(m => ManifestSummaries.mayMatch(t.metadata, m,
      Seq("k" -> Some(Set("2")))))
    assert(kept.size == 1)
    dataM.filterNot(kept.contains).foreach(m =>
      Files.delete(Paths.get(t.resolvePath(m.manifestPath))))
    assert(spark.sql("SELECT id FROM gmp.lake.mp WHERE k = 2")
      .as[Long].collect().toSet == Set(3L))
    assert(spark.sql("SELECT id FROM gmp.lake.mp WHERE k >= 2 AND k < 10")
      .as[Long].collect().toSet == Set(3L))
    assert(spark.sql("SELECT id FROM gmp.lake.mp WHERE k IN (2, 7)")
      .as[Long].collect().toSet == Set(3L))
  }

  test("FilePrune.keepManifest: null/non-null and range shapes") {
    val t = IcebergTable.load(intTable())
    val md = t.metadata
    def mf(parts: Seq[PartitionFieldSummary]) = ManifestFile(
      "m.avro", 1L, md.currentSpec.specId, 0, 1L, 1, 0, 0, 1L, 0L, 0L, parts)
    val noNulls = mf(Seq(
      PartitionFieldSummary("k", containsNull = false, Some("5"), Some("40"))))
    val allNull = mf(Seq(
      PartitionFieldSummary("k", containsNull = true, None, None)))
    import org.apache.spark.sql.sources._
    assert(!graft.sql.FilePrune.keepManifest(t, noNulls, IsNull("k")))
    assert(graft.sql.FilePrune.keepManifest(t, noNulls, IsNotNull("k")))
    assert(graft.sql.FilePrune.keepManifest(t, allNull, IsNull("k")))
    assert(!graft.sql.FilePrune.keepManifest(t, allNull, IsNotNull("k")))
    // range checks are INCLUSIVE like the file tier's rangeKeep
    // (strict > at the boundary keeps conservatively)
    assert(graft.sql.FilePrune.keepManifest(t, noNulls, GreaterThan("k", 40)))
    assert(!graft.sql.FilePrune.keepManifest(t, noNulls, GreaterThan("k", 41)))
    assert(graft.sql.FilePrune.keepManifest(t, noNulls,
      GreaterThanOrEqual("k", 40)))
    assert(!graft.sql.FilePrune.keepManifest(t, noNulls, LessThan("k", 4)))
    assert(graft.sql.FilePrune.keepManifest(t, noNulls, EqualTo("k", 17)))
    assert(!graft.sql.FilePrune.keepManifest(t, noNulls, EqualTo("k", 99)))
    assert(graft.sql.FilePrune.keepManifest(t, noNulls,
      Or(EqualTo("k", 99), EqualTo("k", 6))))
    assert(!graft.sql.FilePrune.keepManifest(t, noNulls,
      And(EqualTo("k", 99), EqualTo("k", 6))))
    // filters on a non-partition column never prune at this tier
    assert(graft.sql.FilePrune.keepManifest(t, noNulls, EqualTo("id", 1L)))
  }

  test("many-manifest fixture: the planning tier opens ~1 of 200 " +
      "manifests and agrees exactly with the naive full listing") {
    val dir = Files.createTempDirectory("graft-mprune-many").toString + "/t"
    graft.fixtures.FixtureWriter.writeManyManifests(dir, 50, 40)
    val t = IcebergTable.load(dir)
    import org.apache.spark.sql.sources.EqualTo
    val kept = t.manifests().filter(m =>
      graft.sql.FilePrune.keepManifest(t, m, EqualTo("k", 42)))
    assert(kept.size == 1) // k=42 lives in exactly one summary range
    val pruned = graft.sql.FilePrune.liveEntries(t, None, Seq(EqualTo("k", 42)))
    val naive = t.files().filter(e => e.partition.get("k").contains("42"))
    assert(pruned.map(_.filePath).toSet == naive.map(_.filePath).toSet)
    assert(pruned.nonEmpty)
  }

  test("advise flags summary-less manifests; rewrite_manifests stamps " +
      "summaries even when already packed tight, clearing the flag") {
    val wh = Files.createTempDirectory("graft-mprune-adv").toString
    graft.fixtures.FixtureWriter.writeDemo(spark, wh) // legacy: no summaries
    val e = new graft.api.Engine(spark, wh)
    def rewriteRow(): (String, String) = {
      val r = e.advise("sales.orders")
        .filter(org.apache.spark.sql.functions.col("action") === "rewrite-manifests")
        .collect()
      (r.head.getString(1), r.head.getString(2))
    }
    val (st0, why0) = rewriteRow()
    assert(st0 == "RECOMMENDED" && why0.contains("partition field summaries"))
    // acts even though the table is already packed tight — the rewrite's
    // purpose here is stamping the summaries
    assert(e.rewriteManifests("sales.orders").nonEmpty)
    val t = IcebergTable.load(s"$wh/sales/orders")
    assert(t.manifests().filter(_.content == 0).forall(_.partitions.nonEmpty))
    assert(rewriteRow()._1 == "OK") // converged: no advisory/no-op loop
    assert(e.rewriteManifests("sales.orders").isEmpty) // second call no-ops
    // the SQL metadata relation exposes the stamped summaries
    val sums = graft.rel.MetaRelations.manifests(spark, t)
      .filter(org.apache.spark.sql.functions.col("content") === 0)
      .selectExpr("explode(partition_summaries) AS s")
      .selectExpr("s.name", "s.lower_bound", "s.upper_bound").collect()
    assert(sums.nonEmpty && sums.forall(_.getString(0) == "region"))
  }

  test("rewrite_manifests packs numeric partitions in VALUE order with " +
      "tight disjoint summaries") {
    val dir = intTable()
    // interleaved appends so arrival order is scrambled across values
    Seq(10, 2, 30, 1, 20, 3, 9, 25).zipWithIndex.foreach { case (k, i) =>
      TableWriter.append(spark, dir, Seq((i.toLong, k)).toDF("id", "k"))
    }
    val res = graft.ops.Maintenance.rewriteManifests(dir, targetEntries = 4)
    assert(res.nonEmpty)
    val t = IcebergTable.load(dir)
    val packed = t.manifests().filter(_.content == 0)
    assert(packed.size == 2)
    val ranges = packed.map { m =>
      val Seq(s) = m.partitions
      (s.lower.get.toInt, s.upper.get.toInt)
    }.sortBy(_._1)
    // typed sort: 1,2,3,9 | 10,20,25,30 — a string sort would have split
    // as 1,10,2,20 | 25,3,30,9 with overlapping ranges
    assert(ranges == Seq((1, 9), (10, 30)))
    // and the packed summaries prune: a k=20 probe keeps one manifest
    val kept = packed.filter(m => ManifestSummaries.mayMatch(t.metadata, m,
      Seq("k" -> Some(Set("20")))))
    assert(kept.size == 1 && kept.head.partitions.head.lower.contains("10"))
  }
}
