package graft.sql

import java.nio.file.Files

import graft.SparkSpec

/** Storage-partitioned joins: two graft tables on the same identity
  * partitioning join with NO shuffle on either side
  * ([[GraftFileScan.outputPartitioning]] + per-key input partitions). */
class SpjSpec extends SparkSpec {

  import spark.implicits._

  test("co-partitioned join plans without a shuffle and stays correct") {
    val wh = Files.createTempDirectory("graft-spj-wh").toString
    spark.conf.set("spark.sql.catalog.graftj", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftj.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftj.lake")
    spark.sql(
      """CREATE TABLE graftj.lake.facts (id BIGINT, grp STRING, v DOUBLE)
        |PARTITIONED BY (grp)""".stripMargin)
    spark.sql(
      """CREATE TABLE graftj.lake.dims (grp STRING, label STRING)
        |PARTITIONED BY (grp)""".stripMargin)
    spark.sql(
      """INSERT INTO graftj.lake.facts VALUES
        |  (1,'a',1.0),(2,'a',2.0),(3,'b',3.0),(4,'b',4.0),(5,'c',5.0)""".stripMargin)
    spark.sql(
      "INSERT INTO graftj.lake.dims VALUES ('a','alpha'),('b','beta'),('c','gamma')")

    val prior = Map(
      "spark.sql.sources.v2.bucketing.enabled" ->
        spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.enabled" ->
        spark.conf.getOption("spark.sql.adaptive.enabled"))
    try {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")

      val q = spark.sql(
        """SELECT f.grp, d.label, sum(f.v) AS total
          |FROM graftj.lake.facts f JOIN graftj.lake.dims d ON f.grp = d.grp
          |GROUP BY f.grp, d.label ORDER BY f.grp""".stripMargin)
      val plan = q.queryExecution.executedPlan.toString
      // neither join side reshuffles: the only exchange allowed is the
      // final ORDER BY range exchange above the aggregate
      val joinSection = plan.split("SortMergeJoin|ShuffledHashJoin").drop(1)
      assert(joinSection.nonEmpty, s"expected a non-broadcast join in:\n$plan")
      assert(!joinSection.mkString.contains("Exchange hashpartitioning"),
        s"join inputs were shuffled:\n$plan")

      assert(q.as[(String, String, Double)].collect().toSeq ==
        Seq(("a", "alpha", 3.0), ("b", "beta", 7.0), ("c", "gamma", 5.0)))

      // ---- bucketed SPJ: same-bucket-layout tables join shuffle-free
      // through the catalog's V2 bucket function
      spark.sql(
        """CREATE TABLE graftj.lake.bf (id BIGINT, v DOUBLE)
          |PARTITIONED BY (bucket(4, id))""".stripMargin)
      spark.sql(
        """CREATE TABLE graftj.lake.bd (id BIGINT, tag STRING)
          |PARTITIONED BY (bucket(4, id))""".stripMargin)
      spark.sql(
        "INSERT INTO graftj.lake.bf SELECT id, CAST(id AS DOUBLE) FROM range(0, 64)")
      spark.sql(
        "INSERT INTO graftj.lake.bd SELECT id, concat('t', id) FROM range(0, 64, 2)")
      val bq = spark.sql(
        """SELECT count(*) AS n, sum(f.v) AS s
          |FROM graftj.lake.bf f JOIN graftj.lake.bd d ON f.id = d.id""".stripMargin)
      val bplan = bq.queryExecution.executedPlan.toString
      val bJoin = bplan.split("SortMergeJoin|ShuffledHashJoin").drop(1)
      assert(bJoin.nonEmpty, s"expected a non-broadcast join in:\n$bplan")
      assert(!bJoin.mkString.contains("Exchange hashpartitioning"),
        s"bucketed join inputs were shuffled:\n$bplan")
      assert(bq.as[(Long, Double)].head() == ((32L, (0 until 64 by 2).sum.toDouble)))

      // the V2 function is directly callable and matches the write path
      assert(spark.sql("SELECT graftj.system.bucket(4, CAST(7 AS BIGINT))")
        .as[Int].head() ==
        graft.expr.IcebergTransformOps.bucketLong(7L, 4))
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
