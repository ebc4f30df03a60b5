package graft.meta

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkSpec

/** Optimistic concurrency: publishing a metadata version is a
  * compare-and-swap ([[IcebergMeta.publish]] — hard-link, not rename) —
  * the loser of a race gets [[CommitConflictException]], the winner's
  * document is untouched, and no staging files leak. Every commit path
  * (TableWriter, SchemaEvolution, Maintenance) routes through it. */
class CommitConflictSpec extends SparkSpec {

  import spark.implicits._

  test("publish is first-writer-wins: the loser conflicts, the winner survives") {
    val dir = Files.createTempDirectory("graft-cas")
    val target = dir.resolve("v3.metadata.json")
    IcebergMeta.publish(target, """{"winner": true}""")

    val e = intercept[CommitConflictException](
      IcebergMeta.publish(target, """{"loser": true}"""))
    assert(e.getMessage.contains("v3.metadata.json"))
    assert(Files.readString(target) == """{"winner": true}""")
    // no staging junk left behind by either attempt
    assert(!scala.util.Using.resource(Files.list(dir))(
      _.iterator().asScala.exists(_.getFileName.toString.endsWith(".tmp"))))
  }

  test("a normal append publishes through the CAS path and stays readable") {
    val dir = Files.createTempDirectory("graft-cas2").toString + "/t"
    TableCreator.create(dir, StructType(Seq(StructField("id", LongType))))
    TableWriter.append(spark, dir, Seq(1L, 2L).toDF("id"))
    TableWriter.append(spark, dir, Seq(3L).toDF("id"))
    val md = IcebergMeta.load(dir)
    assert(md.snapshots.size == 2)
    assert(Files.exists(Paths.get(dir, "metadata", "v3.metadata.json")))
    assert(graft.ops.ScanPlanner.readTable(
      spark, IcebergTable.load(dir)).count() == 3L)
  }
}
