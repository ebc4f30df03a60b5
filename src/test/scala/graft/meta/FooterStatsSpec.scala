package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.api.Engine

/** Footer-derived commit stats (`spark.graft.commitStats.source=footer`,
  * the default) must produce MANIFEST ENTRIES BYTE-IDENTICAL to the
  * legacy full distributed aggregation (`agg`) on every statable type —
  * including the shapes that force the per-column fallback (NaN
  * float/double stats are dropped by parquet-mr; >4 KB string edges drop
  * the whole chunk's stats) — while never re-reading committed data. */
class FooterStatsSpec extends SparkSpec {
  import spark.implicits._

  private def wh(): String = Files.createTempDirectory("graft-fstats-wh").toString

  /** Entries stripped to comparable form (paths carry random commit
    * tokens; bound bytes compare as seqs). */
  private def comparable(t: IcebergTable) =
    t.files().sortBy(_.filePath).map(e => (
      e.recordCount, e.fileSizeInBytes, e.partition,
      e.columnSizes.toSeq.sortBy(_._1),
      e.valueCounts.toSeq.sortBy(_._1),
      e.nullValueCounts.toSeq.sortBy(_._1),
      e.lowerBounds.toSeq.sortBy(_._1).map { case (k, v) => k -> v.toSeq },
      e.upperBounds.toSeq.sortBy(_._1).map { case (k, v) => k -> v.toSeq }))

  private def withSource[A](v: String)(body: => A): A = {
    spark.conf.set(graft.meta.TableWriter.StatsSourceKey, v)
    try body finally spark.conf.unset(graft.meta.TableWriter.StatsSourceKey)
  }

  /** The type zoo: every statable type, NaN/-0.0 floats, unicode and
    * >16-code-point strings, a >4 KB string edge, pre-epoch dates,
    * micro-precision timestamps, lists with null elements / empty / null
    * arrays, a binary column, an all-null column. */
  private def zoo = {
    val huge = "zz" + ("x" * 5000)
    val uni = "é中😀-" + ("λ" * 20)
    Seq(
      (1, 10L, 1.5f, -0.0d, "alpha", huge, true,
        java.sql.Date.valueOf("2024-01-05"),
        java.sql.Timestamp.valueOf("2024-01-05 01:02:03.123456"),
        Seq[java.lang.Long](1L, 2L, null), Seq("a", "b"),
        Array[Byte](1, 2), Option.empty[String], 0.5d),
      (2, -3L, Float.NaN, 4.25d, uni, "mid", false,
        java.sql.Date.valueOf("1969-12-31"),
        java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999999"),
        Seq.empty[java.lang.Long], null,
        Array[Byte](3), Option.empty[String], Double.NaN),
      (3, 7L, -0.0f, 0.0d, "z" * 40, "aa", true,
        null, null, null, Seq("c"),
        null, Option.empty[String], -1.25d))
      .toDF("i", "l", "f", "d", "s", "s2", "b", "dt", "ts", "al", "as2",
        "bin", "s3", "d2")
      .unionByName(
        Seq(Tuple1(4)).toDF("i")
          .withColumn("l", lit(5L))
          .withColumn("f", lit(null).cast("float"))
          .withColumn("d", lit(null).cast("double"))
          .withColumn("s", lit(null).cast("string"))
          .withColumn("s2", lit(null).cast("string"))
          .withColumn("b", lit(null).cast("boolean"))
          .withColumn("dt", lit(null).cast("date"))
          .withColumn("ts", lit(null).cast("timestamp"))
          .withColumn("al", lit(null).cast("array<long>"))
          .withColumn("as2", lit(null).cast("array<string>"))
          .withColumn("bin", lit(null).cast("binary"))
          .withColumn("s3", lit(null).cast("string"))
          .withColumn("d2", lit(1.0d)))
  }

  test("staged commits: footer-derived entries equal the agg's verbatim " +
      "across the type zoo (NaN and >4KB-string columns ride the fallback)") {
    val df = zoo
    val eF = new Engine(spark, wh()); val eA = new Engine(spark, wh())
    withSource("footer") { eF.createTable("z.t", df.schema); eF.append("z.t", df); () }
    withSource("agg") { eA.createTable("z.t", df.schema); eA.append("z.t", df); () }
    val (got, want) = (comparable(eF.load("z.t")), comparable(eA.load("z.t")))
    assert(got.nonEmpty && got == want)
  }

  test("adoption: footer-derived entries equal the agg's verbatim, and " +
      "the footer path spends strictly fewer Spark jobs (no stats read)") {
    val src = Files.createTempDirectory("graft-fstats-src").toString
    zoo.coalesce(2).write.mode("overwrite").parquet(src)
    val jobCounts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    def counted[A](label: String)(body: => A): A = {
      spark.sparkContext.addSparkListener(listener)
      val before = { Thread.sleep(200); jobs.get() }
      val r = body
      // the listener bus is async — settle before reading
      var last = -1; var cur = jobs.get()
      while (last != cur) { Thread.sleep(200); last = cur; cur = jobs.get() }
      spark.sparkContext.removeSparkListener(listener)
      jobCounts.put(label, cur - before); r
    }
    val eF = new Engine(spark, wh()); val eA = new Engine(spark, wh())
    withSource("footer") { counted("footer") { eF.registerParquet("z.a", src) } }
    withSource("agg") { counted("agg") { eA.registerParquet("z.a", src) } }
    val (got, want) = (comparable(eF.load("z.a")), comparable(eA.load("z.a")))
    assert(got.size == 2 && got == want)
    // footer mode still pays the per-column fallback for the NaN float,
    // NaN double and >4KB string columns, but not the full-width agg —
    // and a CLEAN drop (next assert) pays no stats job at all
    assert(jobCounts.get("footer") <= jobCounts.get("agg"),
      s"footer-mode adoption ran ${jobCounts.get("footer")} jobs vs " +
        s"agg's ${jobCounts.get("agg")}")

    val cleanSrc = Files.createTempDirectory("graft-fstats-clean").toString
    (1L to 100L).map(i => (i, s"v$i", i * 2.0)).toDF("id", "name", "score")
      .coalesce(2).write.mode("overwrite").parquet(cleanSrc)
    val eC = new Engine(spark, wh())
    counted("clean-footer") { eC.registerParquet("z.c", cleanSrc) }
    val eCA = new Engine(spark, wh())
    withSource("agg") { counted("clean-agg") { eCA.registerParquet("z.c", cleanSrc) } }
    assert(comparable(eC.load("z.c")) == comparable(eCA.load("z.c")))
    assert(jobCounts.get("clean-footer") < jobCounts.get("clean-agg"),
      s"a clean drop must skip the stats read entirely " +
        s"(footer=${jobCounts.get("clean-footer")}, agg=${jobCounts.get("clean-agg")})")
  }

  test("clean unpartitioned staged commits skip the stats job entirely " +
      "and still stamp agg-identical entries") {
    val df = (1L to 200L).map(i => (i, s"name-$i", i * 0.5, Seq(i, i + 1)))
      .toDF("id", "name", "score", "tags")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    def counted[A](body: => A): Int = {
      spark.sparkContext.addSparkListener(listener)
      val before = { Thread.sleep(200); jobs.get() }
      body
      var last = -1; var cur = jobs.get()
      while (last != cur) { Thread.sleep(200); last = cur; cur = jobs.get() }
      spark.sparkContext.removeSparkListener(listener)
      cur - before
    }
    val eF = new Engine(spark, wh()); val eA = new Engine(spark, wh())
    val jF = counted {
      withSource("footer") { eF.createTable("z.u", df.schema); eF.append("z.u", df) } }
    val jA = counted {
      withSource("agg") { eA.createTable("z.u", df.schema); eA.append("z.u", df) } }
    assert(comparable(eF.load("z.u")) == comparable(eA.load("z.u")))
    // footer mode: the staging write is the ONLY job; agg mode adds the
    // stats aggregation
    assert(jF < jA, s"footer-mode append ran $jF jobs vs agg's $jA")
  }

  test("pre-widen adoption (int32 under long, float under double): footer " +
      "bounds widen to the declared type and equal the agg's") {
    val src = Files.createTempDirectory("graft-fstats-widen").toString
    Seq((1, 1.5f), (2, -2.5f), (3, 0.25f)).toDF("id", "score")
      .coalesce(1).write.mode("overwrite").parquet(src)
    def adopt(e: Engine): Unit = {
      // plain (id-less) vendor files: the table must not demand footer ids
      e.createTable("z.w", StructType(Seq(
        StructField("id", LongType), StructField("score", DoubleType))),
        properties = Map(graft.meta.FieldIds.PropKey -> "false"))
      e.adoptFiles("z.w", src); ()
    }
    val eF = new Engine(spark, wh()); val eA = new Engine(spark, wh())
    withSource("footer") { adopt(eF) }
    withSource("agg") { adopt(eA) }
    val (got, want) = (comparable(eF.load("z.w")), comparable(eA.load("z.w")))
    assert(got.nonEmpty && got == want)
    // and the widened bounds are 8-byte (declared width), not 4
    val e = eF.load("z.w").files().head
    assert(e.lowerBounds.values.forall(_.length == 8))
  }

  test("the stats-source conf refuses unknown values naming the key") {
    val e = new Engine(spark, wh())
    e.createTable("z.bad", StructType(Seq(StructField("x", LongType))))
    val ex = intercept[IllegalArgumentException] {
      withSource("footers") { e.append("z.bad", Seq(1L).toDF("x")) }
    }
    assert(ex.getMessage.contains(graft.meta.TableWriter.StatsSourceKey))
  }
}
