package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.api.Engine
import graft.fixtures.FixtureWriter

/** Metadata-pruned data reads: the pruned scan must open fewer files than
  * the full scan while returning exactly the filtered result. */
class ScanPlannerSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val dir = Files.createTempDirectory("graft-scan-wh").toString
    FixtureWriter.writeDemo(spark, dir)
    dir
  }
  private lazy val engine = new Engine(spark, warehouse)

  import spark.implicits._

  test("readTable returns the live data of the current snapshot") {
    val df = engine.readTable("sales.orders")
    // current snapshot is the overwrite: order_id 1..15
    assert(df.count() == 15L)
    assert(df.agg(min("order_id"), max("order_id")).as[(Long, Long)].head() == (1L, 15L))
    // time travel: the 3rd append snapshot had 60 rows live
    val snaps = engine.load("sales.orders").metadata.snapshots.map(_.snapshotId)
    assert(engine.readTable("sales.orders", Some(snaps(2))).count() == 60L)
  }

  test("bound pruning opens fewer files, same result as full filtered read") {
    val snaps = engine.load("sales.orders").metadata.snapshots.map(_.snapshotId)
    val pin = Some(snaps(2)) // 60 rows across 3 appends × regions
    val full = engine.readTable("sales.orders", pin)
      .filter(col("order_id") >= 46 && col("order_id") <= 60)
    val pruned = engine.readTableWhere("sales.orders", "order_id",
      Some(46.0), Some(60.0), pin)
    // identical result…
    assert(pruned.count() == full.count())
    assert(pruned.agg(sum("order_id")).as[Double].head() ==
      full.agg(sum("order_id")).as[Double].head())
    // …from strictly fewer parquet files (ids 46-60 live only in the 3rd
    // append's files; each append wrote per-region files)
    assert(pruned.inputFiles.length < engine.readTable("sales.orders", pin).inputFiles.length)
  }

  test("partition pruning composes with bound pruning") {
    val snaps = engine.load("sales.orders").metadata.snapshots.map(_.snapshotId)
    val pin = Some(snaps(2))
    val pruned = engine.readTableWhere("sales.orders", "order_id",
      None, None, pin, partitionEquals = Map("region" -> "eu-west"))
    val full = engine.readTable("sales.orders", pin).filter(col("region") === "eu-west")
    assert(pruned.filter(col("region") === "eu-west").count() == full.count())
    assert(pruned.inputFiles.length < engine.readTable("sales.orders", pin).inputFiles.length)
  }

  test("createAllViews makes the warehouse queryable with spark.sql") {
    val names = engine.createAllViews()
    // legacy.inventory is metadata-only (no materialized data) — skipped
    assert(names.toSet.contains("sales_orders") && names.size == 4)
    // plain SQL over the registered views, joins included
    val r = spark.sql(
      """SELECT region, count(*) AS n, round(sum(amount), 2) AS amt
        |FROM sales_orders GROUP BY region ORDER BY region""".stripMargin).collect()
    assert(r.map(_.getAs[Long]("n")).sum == 15L) // current snapshot = overwrite
    assert(spark.sql(
      "SELECT count(*) FROM sales_orders o JOIN sales_customers c " +
        "ON o.order_id = c.customer_id").collect().head.getLong(0) > 0)
  }

  test("a range outside all bounds returns empty without scanning") {
    val df = engine.readTableWhere("sales.orders", "order_id",
      Some(100000.0), Some(200000.0))
    assert(df.count() == 0L)
    assert(df.columns.contains("order_id")) // schema preserved
  }

  test("file-scoped MoR: mixed equality-delete sequences split files exactly; legacy entries stay hit") {
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val s2 = spark
    import s2.implicits._
    val wh = Files.createTempDirectory("graft-morseq-wh").toString
    val e = new Engine(spark, wh)
    e.createTable("ns.t", new org.apache.spark.sql.types.StructType()
      .add("k", org.apache.spark.sql.types.LongType)
      .add("v", org.apache.spark.sql.types.StringType))
    e.upsert("ns.t", Seq((1L, "a")).toDF("k", "v"), Seq("k"))  // F1 + eqD @1
    e.append("ns.t", Seq((2L, "two")).toDF("k", "v"))          // F2 @2
    e.upsert("ns.t", Seq((1L, "b")).toDF("k", "v"), Seq("k"))  // F3 + eqD @3
    e.append("ns.t", Seq((3L, "three")).toDF("k", "v"))        // F4 @4

    def collect(): Seq[(Long, String)] = e.readTable("ns.t")
      .select("k", "v").as[(Long, String)].collect().sorted.toSeq
    assert(collect() == Seq((1L, "b"), (2L, "two"), (3L, "three")))

    def scannedUnderAnti(): (Set[String], Set[String]) = {
      val plan = e.readTable("ns.t").queryExecution.optimizedPlan
      def files(p: LogicalPlan): Set[String] = p.collect {
        case l: LogicalRelation => l.relation match {
          case h: HadoopFsRelation =>
            h.location.inputFiles.filter(_.contains("/data/data-")).toSet
          case _ => Set.empty[String]
        }
      }.flatten.map(_.replaceFirst("^file:/+", "/")).toSet
      val under = plan.collect { case j @ Join(_, _, LeftAnti, _, _) => files(j) }
        .flatten.toSet
      (files(plan), under)
    }
    val t = e.load("ns.t")
    def pathsAtSeq(wanted: Long*): Set[String] = {
      val seqBy = t.metadata.snapshots.map(s => s.snapshotId -> s.sequenceNumber).toMap
      t.files().filter(f => wanted.contains(f.resolvedSeq(seqBy, 0L)))
        .map(f => t.resolvePath(f.filePath)).toSet
    }
    val (all, under) = scannedUnderAnti()
    // the newest equality delete applies at sequence 3: files at seq 1-2
    // carry the debt, files at seq >= 3 escape structurally
    assert(pathsAtSeq(1L, 2L).subsetOf(under), s"$under")
    assert(pathsAtSeq(3L, 4L).forall(p => !under.contains(p)), s"$under")
    assert(pathsAtSeq(3L, 4L).subsetOf(all))

    // strip the seq-4 file's stamped sequence: a legacy (-1) entry still
    // resolves through the snapshot log here, but whatever it resolves
    // to must never move a file OUT of the anti-join branch wrongly —
    // rows stay identical either way
    val a4 = t.metadata.currentSnapshotId.get
    t.manifests(Some(a4)).foreach { m =>
      val p = t.resolvePath(m.manifestPath)
      val entries = graft.meta.AvroManifests.readManifest(p)
        .map(en => if (en.content == 0) en.copy(sequenceNumber = -1L) else en)
      graft.meta.AvroManifests.writeManifest(p, entries)
    }
    assert(collect() == Seq((1L, "b"), (2L, "two"), (3L, "three")))
  }

  test("equality-delete sequence map: broadcast-join form above the file threshold, same rows as the literal") {
    val s2 = spark
    import s2.implicits._
    val wh = Files.createTempDirectory("graft-moreqbc-wh").toString
    val e = new Engine(spark, wh)
    e.createTable("ns.bc", new org.apache.spark.sql.types.StructType()
      .add("k", org.apache.spark.sql.types.LongType)
      .add("v", org.apache.spark.sql.types.StringType))
    e.upsert("ns.bc", Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    e.append("ns.bc", Seq((2L, "two")).toDF("k", "v"))
    e.upsert("ns.bc", Seq((1L, "b")).toDF("k", "v"), Seq("k"))
    e.append("ns.bc", Seq((3L, "three")).toDF("k", "v"))

    def rows(): Seq[(Long, String)] = e.readTable("ns.bc")
      .select("k", "v").as[(Long, String)].collect().sorted.toSeq
    // metadata-small default: the sequence map is a plan literal
    val litPlan = e.readTable("ns.bc").queryExecution.executedPlan.toString
    assert(!litPlan.contains("__seq_path"), litPlan.take(2000))
    val expected = rows()
    assert(expected == Seq((1L, "b"), (2L, "two"), (3L, "three")))

    // force the at-scale form: the map ships as a BROADCAST JOIN against
    // the files relation — same rows, no plan-text literal
    spark.conf.set("spark.graft.eqDeleteSeqLiteralMaxFiles", "0")
    try {
      val df = e.readTable("ns.bc")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("__seq_path"), plan.take(3000))
      assert("BroadcastHashJoin.*__seq_path".r.findFirstIn(plan).nonEmpty ||
        plan.contains("BroadcastHashJoin"), plan.take(3000))
      assert(df.select("k", "v").as[(Long, String)].collect().sorted.toSeq
        == expected)
    } finally spark.conf.unset("spark.graft.eqDeleteSeqLiteralMaxFiles")
  }

  test("point-set pruning opens only the files holding the points; the " +
      "span prune drags in the gap between them") {
    val s2 = spark
    import s2.implicits._
    val wh = Files.createTempDirectory("graft-ptset-wh").toString
    val e = new Engine(spark, wh)
    e.createTable("ns.pts", new org.apache.spark.sql.types.StructType()
      .add("id", org.apache.spark.sql.types.LongType)
      .add("v", org.apache.spark.sql.types.LongType))
    // four appends with tight, disjoint id ranges — each file's bounds
    // cover only its own range
    Seq(0L until 10L, 100L until 110L, 200L until 210L, 300L until 310L)
      .foreach(r => e.append("ns.pts", r.map(i => (i, i * 2L)).toDF("id", "v")))
    val t = e.load("ns.pts")

    // two far-apart points: the SPAN [5, 305] overlaps every range (the
    // scattered-retire degradation), the point SET hits only two
    val span = ScanPlanner.readTableWhere(spark, t, "id", Some(5.0), Some(305.0))
    val pts = ScanPlanner.readTableWhereInSet(spark, t, "id", Seq(305L, 5L))
    assert(pts.as[(Long, Long)].collect().toSet == Set((5L, 10L), (305L, 610L)))
    assert(span.inputFiles.length > pts.inputFiles.length,
      s"span ${span.inputFiles.length} vs points ${pts.inputFiles.length}")
    // the point scan reads no file from the 100s/200s ranges at all
    val mid = ScanPlanner.readTableWhere(spark, t, "id", Some(100.0), Some(210.0))
    assert(pts.inputFiles.toSet.intersect(mid.inputFiles.toSet).isEmpty)

    // every point outside all bounds: empty result, schema intact
    val none = ScanPlanner.readTableWhereInSet(spark, t, "id", Seq(99999L))
    assert(none.count() == 0L && none.columns.sameElements(Array("id", "v")))
  }

  test("pruned reads of a snapshot with NO data files return empty with " +
      "the declared schema instead of aborting") {
    val s2 = spark
    import s2.implicits._
    val wh = Files.createTempDirectory("graft-empty-wh").toString
    val e = new Engine(spark, wh)
    e.createTable("ns.fresh", new org.apache.spark.sql.types.StructType()
      .add("id", org.apache.spark.sql.types.LongType)
      .add("v", org.apache.spark.sql.types.StringType))
    val t = e.load("ns.fresh")
    // all three pruned-read shapes on a never-appended table: empty
    // frame, declared schema — a retire/forget routed through them
    // (NearDupIndex/AnnIndex.pairsAmong residual reads) must yield an
    // empty pair set, not an IllegalStateException
    val inSet = ScanPlanner.readTableWhereInSet(spark, t, "id", Seq(1L, 7L))
    assert(inSet.count() == 0L
      && inSet.columns.sameElements(Array("id", "v")))
    val where = ScanPlanner.readTableWhere(spark, t, "id",
      Some(0.0), Some(10.0))
    assert(where.count() == 0L
      && where.columns.sameElements(Array("id", "v")))
    val whereIn = ScanPlanner.readTableWhereIn(spark, t, "id", Seq("1"))
    assert(whereIn.count() == 0L
      && whereIn.columns.sameElements(Array("id", "v")))

    // the widened exposure end to end: a retire against a FRESH gate's
    // residual provider (ForgetSpec covers the full verb)
    val gate = new NearDupIndex(e, "ns.fresh_gate", nBuckets = 4)
    gate.create()
    assert(gate.pairsAmong(Seq(1L, 2L).toDF("doc_id")).count() == 0L)
  }

  test("MoR delete-apply broadcasts are ceilinged on metadata-known " +
      "delete-file bytes: hint present under the ceiling, dropped above " +
      "it, rows identical either way") {
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join}
    val s2 = spark
    import s2.implicits._
    val wh = Files.createTempDirectory("graft-delbc-wh").toString
    val e = new Engine(spark, wh)
    e.createTable("ns.dc", new org.apache.spark.sql.types.StructType()
      .add("k", org.apache.spark.sql.types.LongType)
      .add("v", org.apache.spark.sql.types.StringType))
    e.append("ns.dc", (1L to 20L).map(i => (i, s"v$i")).toDF("k", "v"))
    e.upsert("ns.dc", Seq((1L, "one'")).toDF("k", "v"), Seq("k")) // eq-delete
    e.deleteWhere("ns.dc", col("k") === 2L)                       // pos-delete
    val expected = ((3L to 20L).map(i => (i, s"v$i")) :+ (1L, "one'")).sorted

    def rows(): Seq[(Long, String)] = e.readTable("ns.dc")
      .select("k", "v").as[(Long, String)].collect().sorted.toSeq
    def broadcastHintedJoins(): Int =
      e.readTable("ns.dc").queryExecution.optimizedPlan.collect {
        case j: Join if j.hint.rightHint.exists(_.strategy.contains(BROADCAST)) ||
            j.hint.leftHint.exists(_.strategy.contains(BROADCAST)) => j
      }.size

    // default 64 MB ceiling: both delete frames are metadata-tiny —
    // the explicit hints stay (pos-delete anti + eq-delete anti)
    assert(rows() == expected)
    assert(broadcastHintedJoins() >= 2, "expected hinted delete-apply joins")

    // ceiling below any real file's size: every hint drops; the `<=>`
    // anti-join keys still extract as equi keys, so AQE picks a keyed
    // join and the rows come out identical (the nation-scale-forget
    // path: a 100M-key eq-delete set must never be FORCED through the
    // driver)
    spark.conf.set(ScanPlanner.DeleteBroadcastMaxBytesConf, "1")
    try {
      assert(broadcastHintedJoins() == 0,
        "a broadcast hint survived above the ceiling")
      assert(rows() == expected)
    } finally spark.conf.unset(ScanPlanner.DeleteBroadcastMaxBytesConf)

    // 0 = hint tier off entirely (the parity switch)
    spark.conf.set(ScanPlanner.DeleteBroadcastMaxBytesConf, "0")
    try {
      assert(broadcastHintedJoins() == 0)
      assert(rows() == expected)
    } finally spark.conf.unset(ScanPlanner.DeleteBroadcastMaxBytesConf)

    // the change feed's per-commit delete slices ride the same ceiling:
    // same feed rows with the hints forced off
    def feedRows(): Seq[(Long, String, String)] = {
      val snaps = e.load("ns.dc").metadata.snapshots.map(_.snapshotId)
      e.rowChanges("ns.dc", snaps.head, snaps.last)
        .select(col("k"), col("v"), col("_change_type"))
        .as[(Long, String, String)].collect().sorted.toSeq
    }
    val feedDefault = feedRows()
    spark.conf.set(ScanPlanner.DeleteBroadcastMaxBytesConf, "0")
    try assert(feedRows() == feedDefault)
    finally spark.conf.unset(ScanPlanner.DeleteBroadcastMaxBytesConf)
  }

  test("file-path keys resolve through Hadoop URI qualification and fail " +
      "loudly for files outside the table directory") {
    // bare local paths qualify to the reader's file: rendering; explicit
    // schemes pass through unchanged (an object-store or HDFS table dir
    // must key the same way the reader stamps _metadata.file_path)
    assert(ScanPlanner.fileUriPrefix("/wh/ns/t") == "file:/wh/ns/t/")
    assert(ScanPlanner.fileUriPrefix("file:/wh/ns/t") == "file:/wh/ns/t/")
    assert(ScanPlanner.fileUriPrefix("hdfs://nn:8020/wh/ns/t") ==
      "hdfs://nn:8020/wh/ns/t/")
    assert(ScanPlanner.fileUriPrefix("/wh/ns/t/") == "file:/wh/ns/t/")

    // in-table files key to their table-relative path…
    val t = engine.load("sales.orders")
    val dataPath = t.resolvePath(t.files().head.filePath)
    val rel = spark.read.parquet(dataPath)
      .select(ScanPlanner.relPathFromMetadata(t)).distinct().collect()
    assert(rel.map(_.getString(0)).toSeq == Seq(t.files().head.filePath))

    // …and a file OUTSIDE the table dir raises a descriptive error
    // instead of silently mis-keying the MoR joins / partition fill
    val foreign = Files.createTempDirectory("graft-foreign").toString
    Seq((1L, "x")).toDF("a", "b").write.mode("overwrite").parquet(foreign)
    val err = intercept[Exception] {
      spark.read.parquet(foreign)
        .select(ScanPlanner.relPathFromMetadata(t)).collect()
    }
    def messages(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(err).exists(_.contains("outside the table directory")),
      messages(err).mkString(" | "))
  }

  test("a malformed deleteBroadcastMaxBytes conf fails naming the key " +
      "and the expected format, not as a bare NumberFormatException") {
    spark.conf.set(ScanPlanner.DeleteBroadcastMaxBytesConf, "64MB")
    try {
      val ex = intercept[IllegalArgumentException](
        ScanPlanner.deleteBroadcastMaxBytes(spark))
      assert(ex.getMessage.contains(ScanPlanner.DeleteBroadcastMaxBytesConf) &&
        ex.getMessage.contains("byte count") && ex.getMessage.contains("64MB"),
        ex.getMessage)
    } finally spark.conf.unset(ScanPlanner.DeleteBroadcastMaxBytesConf)
    // a padded but valid value parses
    spark.conf.set(ScanPlanner.DeleteBroadcastMaxBytesConf, " 1024 ")
    try assert(ScanPlanner.deleteBroadcastMaxBytes(spark) == 1024L)
    finally spark.conf.unset(ScanPlanner.DeleteBroadcastMaxBytesConf)
  }
}
