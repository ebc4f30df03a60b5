package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** NULL values in partition columns: the manifest stores partition values
  * as non-nullable strings, so both write paths (staged `partitionBy` and
  * the DSv2 fanout writer) must render null as the Hive default-partition
  * sentinel — and readers must stay correct around it. */
class NullPartitionSpec extends SparkSpec {

  import spark.implicits._

  test("staged append with a null partition value commits and reads back") {
    val dir = Files.createTempDirectory("graft-nullpart").toString + "/t"
    TableCreator.create(dir, StructType(Seq(
      StructField("id", LongType), StructField("region", StringType))),
      partitionDecls = Seq("region"))
    TableWriter.append(spark, dir,
      Seq((1L, "emea"), (2L, null.asInstanceOf[String])).toDF("id", "region"))
    val t = IcebergTable.load(dir)

    // manifest: the null-region file carries the sentinel, never null
    val partVals = t.files().map(_.partition("region"))
    assert(partVals.contains("emea"))
    assert(partVals.contains(Transforms.NullPartitionValue))
    assert(!partVals.contains(null))

    // data reads are driven by the data file's own column, not the
    // sentinel: the null row comes back as a real SQL NULL
    val back = graft.ops.ScanPlanner.readTable(spark, t)
      .select("id", "region").as[(Long, Option[String])].collect().toSet
    assert(back == Set((1L, Some("emea")), (2L, None)))

    // equality pruning is sound: region='emea' excludes the null file
    // (sentinel never equals a transformed literal)...
    val pruned = graft.ops.ScanPlanner.pruneFiles(spark, t,
      graft.rel.MetaRelations.files(spark, t), "region",
      None, None, Map("region" -> "emea"))
    assert(pruned.select("partition").collect()
      .map(_.getAs[Map[String, String]]("partition")("region")).toSeq == Seq("emea"))
    // ...and a predicate read returns only the matching row
    assert(graft.ops.ScanPlanner.readTable(spark, t)
      .filter(col("region") === "emea").count() == 1L)
  }

  test("SQL UPDATE setting a partition column to NULL commits via the fanout writer") {
    val wh = Files.createTempDirectory("graft-nullpart-wh").toString
    spark.conf.set("spark.sql.catalog.graftnp", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftnp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftnp.lake")
    spark.sql(
      """CREATE TABLE graftnp.lake.nulldemo (id BIGINT, region STRING)
        |PARTITIONED BY (region)""".stripMargin)
    spark.sql(
      "INSERT INTO graftnp.lake.nulldemo VALUES (1, 'emea'), (2, 'apac')")

    // UPDATE routes through the CoW fanout writer; the new partition
    // value of row 2 is NULL — commit must not fail or corrupt manifests
    spark.sql("UPDATE graftnp.lake.nulldemo SET region = NULL WHERE id = 2")

    val rows = spark.sql(
      "SELECT id, region FROM graftnp.lake.nulldemo ORDER BY id")
      .as[(Long, Option[String])].collect().toSeq
    assert(rows == Seq((1L, Some("emea")), (2L, None)))

    val t = IcebergTable.load(s"$wh/lake/nulldemo")
    val partVals = t.files().map(_.partition("region"))
    assert(partVals.contains(Transforms.NullPartitionValue))
    assert(!partVals.contains(null))

    // IS NULL / IS NOT NULL still answer correctly through SQL
    assert(spark.sql(
      "SELECT count(*) FROM graftnp.lake.nulldemo WHERE region IS NULL")
      .as[Long].head() == 1L)
    assert(spark.sql(
      "SELECT id FROM graftnp.lake.nulldemo WHERE region = 'emea'")
      .as[Long].collect().toSeq == Seq(1L))
  }
}
