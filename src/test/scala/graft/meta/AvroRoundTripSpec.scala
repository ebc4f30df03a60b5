package graft.meta

import java.nio.file.Files

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.expr.IcebergDecode

/** Property-style round-trip of the Avro manifest reader/writer (SURVEY §5
  * plan item: keep reader/writer round-trip tested) with seeded random
  * entries, including binary bounds. */
class AvroRoundTripSpec extends AnyFunSuite {

  private val rng = new Random(42)

  private def randomEntry(i: Int): DataFileEntry = {
    val nCols = 1 + rng.nextInt(5)
    def i64Map = (1 to nCols).map(c => c -> rng.nextLong().abs).toMap
    DataFileEntry(
      status = rng.nextInt(3),
      snapshotId = 1000L + rng.nextInt(10),
      content = rng.nextInt(2),
      filePath = s"data/f$i-${rng.nextInt(1000)}.parquet",
      fileFormat = "PARQUET",
      partition = Map("bucket" -> rng.nextInt(100).toString),
      recordCount = rng.nextInt(100000).toLong,
      fileSizeInBytes = rng.nextInt(1 << 24).toLong,
      columnSizes = i64Map,
      valueCounts = i64Map,
      nullValueCounts = (1 to nCols).map(c => c -> rng.nextInt(100).toLong).toMap,
      lowerBounds = (1 to nCols).map(c =>
        c -> IcebergDecode.encode("long", rng.nextLong())).toMap,
      upperBounds = (1 to nCols).map(c =>
        c -> IcebergDecode.encode("double", rng.nextDouble() * 1e6)).toMap,
      equalityIds = if (i % 3 == 0) Seq(1 + rng.nextInt(5)) else Seq.empty)
  }

  test("manifest entries round-trip bit-exactly (100 random entries)") {
    val entries = (0 until 100).map(randomEntry)
    val path = Files.createTempDirectory("avro-rt").resolve("m.avro").toString
    AvroManifests.writeManifest(path, entries)
    val back = AvroManifests.readManifest(path)
    assert(back.size == entries.size)
    entries.zip(back).foreach { case (a, b) =>
      assert(a.copy(lowerBounds = Map.empty, upperBounds = Map.empty) ==
        b.copy(lowerBounds = Map.empty, upperBounds = Map.empty))
      assert(a.lowerBounds.keySet == b.lowerBounds.keySet)
      a.lowerBounds.foreach { case (k, v) => assert(v.sameElements(b.lowerBounds(k))) }
      a.upperBounds.foreach { case (k, v) => assert(v.sameElements(b.upperBounds(k))) }
    }
  }

  test("manifest list round-trips") {
    val manifests = (0 until 20).map { i =>
      ManifestFile(s"metadata/m$i.avro", rng.nextInt(100000).toLong, 0,
        rng.nextInt(2), 1000L + i, rng.nextInt(100), rng.nextInt(100),
        rng.nextInt(100), rng.nextLong().abs % 100000,
        rng.nextLong().abs % 100000, rng.nextLong().abs % 100000)
    }
    val path = Files.createTempDirectory("avro-rt").resolve("list.avro").toString
    AvroManifests.writeManifestList(path, manifests)
    assert(AvroManifests.readManifestList(path) == manifests)
  }

  test("metadata JSON renders and re-parses identically") {
    val md = TableMetadata(2, "uuid-1", "/wh/ns/t", 1704067200000L, 1,
      Seq(
        IceSchema(0, Seq(SchemaField(1, "id", required = true, "long", "id"))),
        IceSchema(1, Seq(
          SchemaField(1, "id", required = true, "long", "id"),
          SchemaField(2, "name", required = false, "string", "name")))),
      0, Seq(PartitionSpec(0, Seq(SpecField("id", "identity", 1, 1000)))),
      Map("owner" -> "x", "fmt" -> "parquet"),
      Some(1001L),
      Seq(
        Snapshot(1000L, None, 1L, "append",
          Map("operation" -> "append", "total-records" -> "5"), "metadata/s0.avro"),
        Snapshot(1001L, Some(1000L), 2L, "overwrite",
          Map("operation" -> "overwrite"), "metadata/s1.avro")))
    assert(IcebergMeta.parse(IcebergMeta.render(md)) == md)
  }
}
