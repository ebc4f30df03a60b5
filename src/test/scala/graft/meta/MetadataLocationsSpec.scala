package graft.meta

import org.scalatest.funsuite.AnyFunSuite

/** `MetadataLocations.localPath` — every URI shape foreign Iceberg
  * writers actually store in `metadata_location` must either resolve to
  * the right local path or raise the typed unsupported-location error,
  * never fall through to an opaque `Paths.get` failure. */
class MetadataLocationsSpec extends AnyFunSuite {

  private def p(loc: String) =
    MetadataLocations.localPath(loc, "test").toString

  test("plain absolute and relative paths pass through") {
    assert(p("/wh/ns/t/metadata/v1.metadata.json") ==
      "/wh/ns/t/metadata/v1.metadata.json")
    assert(p("wh/ns/t/metadata/v1.metadata.json") ==
      "wh/ns/t/metadata/v1.metadata.json")
  }

  test("file URIs resolve in all slash forms foreign writers emit") {
    // Hadoop Path / java.io.File.toURI single-slash form
    assert(p("file:/tmp/wh/m.json") == "/tmp/wh/m.json")
    // RFC empty-authority form
    assert(p("file:///tmp/wh/m.json") == "/tmp/wh/m.json")
    // explicit localhost authority is this machine
    assert(p("file://localhost/tmp/wh/m.json") == "/tmp/wh/m.json")
    // scheme is case-insensitive (RFC 3986)
    assert(p("File:/tmp/wh/m.json") == "/tmp/wh/m.json")
    assert(p("FILE:///tmp/wh/m.json") == "/tmp/wh/m.json")
  }

  test("remote schemes and remote file authorities raise the typed error") {
    for (loc <- Seq(
        "s3://bucket/wh/m.json",
        "hdfs://nn:8020/wh/m.json",
        "gs://bucket/wh/m.json",
        "S3://bucket/wh/m.json",
        "file://nfs-host/wh/m.json")) {
      val e = intercept[IllegalStateException](p(loc))
      assert(e.getMessage.contains("unsupported"), s"$loc -> ${e.getMessage}")
      assert(e.getMessage.contains(loc), s"message should cite the location")
    }
  }
}
