package graft.ops

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.api.Engine

/** HIVE-LAYOUT partitioned adoption (`register`/`add-files` on a
  * `key=value/` directory — the canonical `add_files` source): the path
  * keys become typed identity-partition columns, each adopted entry
  * carries its path's partition values (so partition pruning works from
  * day one), and scans fill the in-file-absent columns from the
  * manifests' per-file constants. */
class RegisterHiveSpec extends SparkSpec {
  import spark.implicits._

  private def freshDirs(): (String, String) = (
    Files.createTempDirectory("graft-hive-src").toString,
    Files.createTempDirectory("graft-hive-wh").toString)

  private def rows(lo: Long, hi: Long) =
    (lo to hi).map(i => (i, s"v$i", if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c",
      (i % 4).toInt))
      .toDF("id", "name", "p", "q")

  test("register a hive directory: typed partition columns, exact " +
      "read-back, hard-linked files, partition values in the entries") {
    val (srcDir, wh) = freshDirs()
    val df = rows(1L, 300L)
    df.repartition(2).write.mode("overwrite")
      .partitionBy("p", "q").parquet(srcDir)
    val e = new Engine(spark, wh)
    val res = e.registerParquet("ns.hive", srcDir)
    assert(res.addedRecords == 300L)

    // declared schema: file columns first, then the typed path columns
    val md = e.load("ns.hive").metadata
    assert(md.currentSpec.fields.map(f => (f.name, f.transform)) ==
      Seq(("p", "identity"), ("q", "identity")))
    assert(md.currentSchema.fields.find(_.name == "q").get.fieldType == "int",
      "partition discovery must type the path values")

    // row-for-row equal to Spark's own partition-discovery read —
    // INCLUDING the path columns, which the engine fills from metadata
    val got = e.readTable("ns.hive").select("id", "name", "p", "q")
      .as[(Long, String, String, Int)].collect().sorted.toSeq
    val want = spark.read.parquet(srcDir).select("id", "name", "p", "q")
      .as[(Long, String, String, Int)].collect().sorted.toSeq
    assert(got == want)

    // adoption moved no data bytes
    val t = e.load("ns.hive")
    t.files().foreach { f =>
      val p = Paths.get(t.resolvePath(f.filePath))
      val nlink = Files.getAttribute(p, "unix:nlink").asInstanceOf[Number].intValue()
      assert(nlink >= 2, s"$p should be a hard link into the source dir")
    }
    // every entry carries its path's partition values
    assert(t.files().forall(f =>
      Set("a", "b", "c").contains(f.partition("p")) &&
        Set("0", "1", "2", "3").contains(f.partition("q"))))
  }

  test("partition-equals probe PRUNES (strictly fewer files) and equals " +
      "the filtered full read; IN-probe too; bounds synthesized") {
    val (srcDir, wh) = freshDirs()
    rows(1L, 400L).repartition(2).write.mode("overwrite")
      .partitionBy("p").parquet(srcDir)
    val e = new Engine(spark, wh)
    e.registerParquet("ns.prune", srcDir)

    val full = e.readTable("ns.prune")
    val probe = e.readTableWhere("ns.prune", "id", None, None,
      partitionEquals = Map("p" -> "a"))
    assert(probe.inputFiles.length < full.inputFiles.length,
      s"partition probe must open strictly fewer files " +
      s"(${probe.inputFiles.length} vs ${full.inputFiles.length})")
    val got = probe.select("id").as[Long].collect().sorted.toSeq
    val want = full.filter(col("p") === "a").select("id")
      .as[Long].collect().sorted.toSeq
    assert(got == want && got.nonEmpty)

    val inProbe = e.readTableWhereIn("ns.prune", "p", Seq("b", "c"))
    assert(inProbe.inputFiles.length < full.inputFiles.length)
    assert(inProbe.count() == full.filter(col("p").isin("b", "c")).count())

    // the synthesized lo=hi bounds let BOUNDS pruning work on the path
    // column too (readTableWhere on a numeric path key)
    val (src2, _) = freshDirs()
    rows(1L, 200L).write.mode("overwrite").partitionBy("q").parquet(src2)
    e.registerParquet("ns.prune2", src2)
    val full2 = e.readTable("ns.prune2")
    val bprobe = e.readTableWhere("ns.prune2", "q", Some(2.0), Some(2.0))
    assert(bprobe.inputFiles.length < full2.inputFiles.length,
      "synthesized per-file bounds must prune on the path column")
    assert(bprobe.count() == full2.filter(col("q") === 2).count())
  }

  test("adoptFiles lands a second hive drop; flat-into-partitioned and " +
      "hive-into-unpartitioned are refused; key mismatch refused") {
    val (dirA, wh) = freshDirs()
    rows(1L, 100L).write.mode("overwrite").partitionBy("p", "q").parquet(dirA)
    val e = new Engine(spark, wh)
    e.registerParquet("ns.drops", dirA)

    val dirB = Files.createTempDirectory("graft-hive-src").toString
    rows(101L, 160L).write.mode("overwrite").partitionBy("p", "q").parquet(dirB)
    val r = e.adoptFiles("ns.drops", dirB)
    assert(r.addedRecords == 60L)
    val got = e.readTable("ns.drops").select("id", "p")
      .as[(Long, String)].collect().sorted.toSeq
    assert(got == (1L to 160L).map(i =>
      (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c")))

    // partition pruning spans BOTH drops
    val probe = e.readTableWhere("ns.drops", "id", None, None,
      partitionEquals = Map("p" -> "b"))
    assert(probe.count() == (1L to 160L).count(_ % 3 == 1))

    // a FLAT drop into the partitioned table is refused
    val flat = Files.createTempDirectory("graft-hive-src").toString
    rows(200L, 210L).select("id", "name").write.mode("overwrite").parquet(flat)
    val ex1 = intercept[IllegalArgumentException](e.adoptFiles("ns.drops", flat))
    assert(ex1.getMessage.contains("flat drop"))

    // a hive drop whose keys mismatch the spec is refused
    val wrongKeys = Files.createTempDirectory("graft-hive-src").toString
    rows(200L, 210L).write.mode("overwrite").partitionBy("p").parquet(wrongKeys)
    val ex2 = intercept[IllegalArgumentException](e.adoptFiles("ns.drops", wrongKeys))
    assert(ex2.getMessage.contains("must match"))

    // a hive drop into an UNPARTITIONED table is refused (values would
    // silently vanish)
    val flatTable = Files.createTempDirectory("graft-hive-src").toString
    rows(1L, 10L).select("id", "name").write.mode("overwrite").parquet(flatTable)
    e.registerParquet("ns.flat", flatTable)
    val hiveDrop = Files.createTempDirectory("graft-hive-src").toString
    rows(11L, 20L).select("id", "name", "p").write.mode("overwrite")
      .partitionBy("p").parquet(hiveDrop)
    val ex3 = intercept[IllegalArgumentException](e.adoptFiles("ns.flat", hiveDrop))
    assert(ex3.getMessage.contains("identity partition spec") ||
      ex3.getMessage.contains("must match"))
  }

  test("null partition values (__HIVE_DEFAULT_PARTITION__) round-trip " +
      "as null; hive %-escapes decode") {
    val (srcDir, wh) = freshDirs()
    Seq((1L, Some("x")), (2L, None), (3L, Some("a b/c")))
      .toDF("id", "p")
      .write.mode("overwrite").partitionBy("p").parquet(srcDir)
    val e = new Engine(spark, wh)
    e.registerParquet("ns.nulls", srcDir)
    val got = e.readTable("ns.nulls").select("id", "p")
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, Some("x")), (2L, None), (3L, Some("a b/c"))),
      s"null sentinel must read back null and escapes must decode, got $got")
  }

  test("merge-on-read DELETE and upsert work on a hive-adopted table " +
      "(fill + lineage + eq-delete interplay), including a predicate " +
      "on the path column itself") {
    val (srcDir, wh) = freshDirs()
    rows(1L, 90L).write.mode("overwrite").partitionBy("p").parquet(srcDir)
    val e = new Engine(spark, wh)
    e.registerParquet("ns.mor", srcDir)

    // position delete keyed on the FILLED path column
    e.deleteWhere("ns.mor", col("p") === "a")
    assert(e.readTable("ns.mor").count() == (1L to 90L).count(_ % 3 != 0))
    assert(e.readTable("ns.mor").filter(col("p") === "a").count() == 0L)

    // upsert (equality delete + append) over the mixed table: engine
    // files carry p in-file, adopted files fill from metadata — one read
    val updates = rows(1L, 90L).filter(col("id") % 3 === 1)
      .withColumn("name", lit("upd"))
    e.upsert("ns.mor", updates, Seq("id"))
    val got = e.readTable("ns.mor").select("id", "name", "p")
      .as[(Long, String, String)].collect().sorted.toSeq
    val want = (1L to 90L).filter(_ % 3 != 0).map(i =>
      (i, if (i % 3 == 1) "upd" else s"v$i", if (i % 3 == 1) "b" else "c")).sorted
    assert(got == want)
  }

  test("copy-on-write UPDATE and DELETE on a hive-adopted table rewrite " +
      "with REAL partition values (fill feeds the rewrite), and the " +
      "rewritten files keep their partition keys") {
    val (srcDir, wh) = freshDirs()
    val e = new Engine(spark, wh)
    rows(1L, 60L).write.mode("overwrite").partitionBy("p").parquet(srcDir)
    e.registerParquet("ns.cow", srcDir)

    // COW UPDATE touches files across partitions; the rewrite must
    // carry the metadata-filled p, not null it
    val r1 = graft.ops.Delete.updateWhere(spark, e.tableDir("ns.cow"),
      col("id") % 5 === 0, Map("name" -> lit("upd")))
    assert(r1.nonEmpty)
    // COW DELETE drops a slice
    val r2 = graft.ops.Delete.copyOnWrite(spark, e.tableDir("ns.cow"),
      col("id") % 7 === 0)
    assert(r2.nonEmpty)

    val got = e.readTable("ns.cow").select("id", "name", "p")
      .as[(Long, String, String)].collect().sorted.toSeq
    val want = (1L to 60L).filter(_ % 7 != 0).map(i =>
      (i, if (i % 5 == 0) "upd" else s"v$i",
        if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c")).sorted
    assert(got == want)
    // every rewritten entry kept its partition value; none went null
    val t = e.load("ns.cow")
    assert(t.files().forall(f => Set("a", "b", "c").contains(f.partition("p"))),
      s"rewritten entries must keep partition values: ${t.files().map(_.partition)}")
    assert(e.readTable("ns.cow").filter(col("p").isNull).count() == 0L)
  }

  test("compaction of a hive-adopted table MATERIALIZES the path columns " +
      "into rewritten files (never nulls), keys the rewrite per partition " +
      "value, and hands the SQL surface back its vectorized scan") {
    val (srcDir, wh) = freshDirs()
    val e = new Engine(spark, wh)
    // many tiny files per partition → compaction candidates everywhere
    rows(1L, 120L).repartition(6).write.mode("overwrite")
      .partitionBy("p").parquet(srcDir)
    e.registerParquet("ns.compact", srcDir)
    val before = e.readTable("ns.compact").select("id", "name", "p")
      .as[(Long, String, String)].collect().sorted.toSeq

    val r = e.rewriteSmallFiles("ns.compact", smallBytes = 1L << 30)
    assert(r.nonEmpty, "tiny adopted files must be compaction candidates")
    val t = e.load("ns.compact")
    // the rewrite regrouped per partition value: one file per p, with
    // REAL partition values in the entries, not sentinels
    assert(t.files().map(_.partition("p")).sorted.toSeq == Seq("a", "b", "c"))
    // the path column is now IN the files — a raw (fill-less) read
    // proves no nulls were materialized (the silent-loss hazard)
    val bare = spark.read.parquet(
      t.files().map(f => t.resolvePath(f.filePath)): _*)
    assert(bare.filter(col("p").isNull).count() == 0L,
      "compaction must write real partition values, not nulls")
    assert(e.readTable("ns.compact").select("id", "name", "p")
      .as[(Long, String, String)].collect().sorted.toSeq == before)
    // no adopted-prefix files remain → the fill is structurally off
    assert(!graft.meta.Transforms.needsPathFill(t.metadata, t.files()),
      "a fully-rewritten table must not need the metadata fill")
  }

  test("the fill's JOIN tier (forced via the literal-map conf) returns " +
      "the same rows, with deletes applied through it") {
    val (srcDir, wh) = freshDirs()
    rows(1L, 120L).repartition(3).write.mode("overwrite")
      .partitionBy("p").parquet(srcDir)
    val e = new Engine(spark, wh)
    e.registerParquet("ns.jointier", srcDir)
    e.deleteWhere("ns.jointier", col("id") % 10 === 0)
    val literal = e.readTable("ns.jointier").select("id", "p")
      .as[(Long, String)].collect().sorted.toSeq
    val old = spark.conf.getOption("spark.graft.eqDeleteSeqLiteralMaxFiles")
    try {
      spark.conf.set("spark.graft.eqDeleteSeqLiteralMaxFiles", "0")
      val joined = e.readTable("ns.jointier").select("id", "p")
        .as[(Long, String)].collect().sorted.toSeq
      assert(joined == literal,
        "join-tier fill must equal the literal-map tier")
    } finally old match {
      case Some(v) => spark.conf.set("spark.graft.eqDeleteSeqLiteralMaxFiles", v)
      case None => spark.conf.unset("spark.graft.eqDeleteSeqLiteralMaxFiles")
    }
  }

  test("migrate-field-ids on a hive-adopted table materializes the path " +
      "columns into rewritten files; rename stays read-safe; advise " +
      "loop closes (migrate + analyze recommended → run both → clean)") {
    val (srcDir, wh) = freshDirs()
    rows(1L, 60L).write.mode("overwrite").partitionBy("p").parquet(srcDir)
    val e = new Engine(spark, wh)
    e.registerParquet("ns.migrate", srcDir)

    def status(action: String): String = e.advise("ns.migrate")
      .filter(col("action") === action).select("status").as[String].head()
    assert(status("migrate-field-ids") == "RECOMMENDED")
    assert(status("analyze") == "RECOMMENDED")

    assert(e.migrateToFieldIds("ns.migrate").nonEmpty)
    // the rewrite wrote the path column INTO the files (identity sources
    // stay in-file on the engine's write path) — verify via a bare read
    val t = e.load("ns.migrate")
    val bare = spark.read.parquet(
      t.files().map(f => t.resolvePath(f.filePath)): _*)
    assert(bare.columns.contains("p"),
      "post-migration files must carry the materialized path column")
    e.renameColumn("ns.migrate", "p", "part")
    val got = e.readTable("ns.migrate").select("id", "part")
      .as[(Long, String)].collect().sorted.toSeq
    assert(got == (1L to 60L).map(i =>
      (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c")))

    graft.ops.Stats.analyzeTable(spark, e.tableDir("ns.migrate"))
    assert(status("migrate-field-ids") == "OK")
    assert(status("analyze") == "OK")
  }

  test("date-typed hive keys: discovery types them, non-canonical " +
      "spellings canonicalize, probes prune, and the partition " +
      "analytics see adopted partitions like native ones") {
    val (srcDir, wh) = freshDirs()
    val e = new Engine(spark, wh)
    // canonical spellings: Spark's partition discovery types these DATE
    // (a non-canonical spelling like 2024-1-6 demotes the whole column
    // to string — then values key as raw strings, consistently)
    Seq((1L, "a")).toDF("id", "name").coalesce(1)
      .write.mode("overwrite").parquet(s"$srcDir/day=2024-01-05")
    Seq((2L, "b")).toDF("id", "name").coalesce(1)
      .write.mode("overwrite").parquet(s"$srcDir/day=2024-01-06")
    e.registerParquet("ns.dates", srcDir)
    val md = e.load("ns.dates").metadata
    assert(md.currentSchema.fields.find(_.name == "day").get.fieldType == "date",
      "partition discovery must type date spellings as DATE")
    assert(e.load("ns.dates").files().map(_.partition("day")).sorted.toSeq ==
      Seq("2024-01-05", "2024-01-06"), "dates must store canonically")

    // typed read-back through the fill + a pruned probe
    val got = e.readTable("ns.dates").select("id", "day")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString)).sorted.toSeq
    assert(got == Seq((1L, "2024-01-05"), (2L, "2024-01-06")))
    val probe = e.readTableWhere("ns.dates", "id", None, None,
      partitionEquals = Map("day" -> "2024-1-5")) // non-canonical probe
    assert(probe.count() == 1L)
    assert(probe.inputFiles.length == 1)

    // CLI register rides the same path for hive layouts
    val (src2, wh2) = freshDirs()
    Seq((1L, "x"), (2L, "y")).toDF("id", "v")
      .write.mode("overwrite").partitionBy("v").parquet(src2)
    assert(graft.tools.Cli.run(Array(wh2, "register", "cli.hive", src2)) == 0)
    val e2 = new Engine(spark, wh2)
    assert(e2.readTable("cli.hive").filter(col("v") === "x").count() == 1L)

    // partition analytics: the partitions relation shows the adopted
    // values with per-partition file/row counts (the reference's
    // partition panel presumes these exist — formatters.py:307-320)
    val parts = e.partitions("ns.dates")
      .select("partition", "file_count", "record_count").collect()
      .map(r => (r.getString(0), r.getAs[Long]("file_count"),
        r.getAs[Long]("record_count"))).sortBy(_._1).toSeq
    assert(parts.size == 2 && parts.forall { case (_, f, n) => f == 1L && n == 1L } &&
      parts.head._1.contains("2024-01-05") && parts(1)._1.contains("2024-01-06"),
      s"partition analytics must see adopted partitions: $parts")
  }

  test("non-canonical path values store CANONICALLY: a q=0123 drop keys " +
      "the same partition as engine-written q=123 rows, probes in either " +
      "spelling match, and a suffixed float spelling is refused") {
    val (srcDir, wh) = freshDirs()
    val e = new Engine(spark, wh)
    // hand-build a hive layout with a non-canonical int spelling
    Seq((1L, "a")).toDF("id", "name").coalesce(1)
      .write.mode("overwrite").parquet(s"$srcDir/q=0123")
    e.registerParquet("ns.canon", srcDir)
    val t = e.load("ns.canon")
    assert(t.files().forall(_.partition("q") == "123"),
      s"stored value must be canonical: ${t.files().map(_.partition)}")

    // engine-written rows of the SAME logical partition key identically
    e.append("ns.canon", Seq((2L, "b", 123)).toDF("id", "name", "q"))
    val parts = e.load("ns.canon").files().map(_.partition("q")).distinct
    assert(parts == Seq("123"),
      s"adopted and engine-written files must share one partition key: $parts")

    // probes match in BOTH spellings (identity literals canonicalize)
    Seq("123", "0123").foreach { probe =>
      val got = e.readTableWhere("ns.canon", "id", None, None,
        partitionEquals = Map("q" -> probe))
      assert(got.count() == 2L, s"probe '$probe' must match both rows")
    }

    // a float spelling SQL cast cannot reproduce is refused up front
    val (src2, _) = freshDirs()
    Seq((1L, "x")).toDF("id", "name").coalesce(1)
      .write.mode("overwrite").parquet(s"$src2/price=1.5f")
    val df = Seq((1L, "x", 1.5f)).toDF("id", "name", "price")
    e.createTable("ns.badfloat", df.schema, partitionDecls = Seq("price"))
    e.setProperties("ns.badfloat", Map.empty,
      unset = Set(graft.meta.FieldIds.PropKey))
    val ex = intercept[IllegalArgumentException](
      e.adoptFiles("ns.badfloat", src2))
    assert(ex.getMessage.contains("does not parse as float"), ex.getMessage)
  }

  test("the parallel link pass handles a 10k-file drop in seconds " +
      "(the serial-driver-loop fix), names collision-free") {
    val src = Files.createTempDirectory("graft-link-10k")
    // linkInto never parses the files — tiny stand-ins keep the test
    // about the LINK pass, not parquet writing
    val paths = (0 until 10000).map { i =>
      val p = src.resolve(f"f$i%05d.parquet")
      Files.write(p, Array[Byte](0x50, 0x41, 0x52, 0x31))
      p
    }
    val tableDir = Files.createTempDirectory("graft-link-10k-tbl")
    val t0 = System.nanoTime()
    val rels = Engine.linkInto(tableDir, paths)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"linked 10000 files in $secs%.2f s")
    assert(rels.size == 10000)
    assert(rels.map(_._1).distinct.size == 10000, "collision-free names")
    assert(secs < 30.0, s"10k links took $secs s — the pass must stay parallel")
    val s = Files.list(tableDir.resolve("data"))
    try assert(s.iterator().asScala.size == 10000)
    finally s.close()
  }

  test("a FOREIGN-NAMED identity spec takes hive drops: entry keys " +
      "resolve through sourceId, probes prune, bounds synthesize") {
    val (srcDir, wh) = freshDirs()
    val e = new Engine(spark, wh)
    val df = rows(1L, 60L)
    df.write.mode("overwrite").partitionBy("q").parquet(srcDir)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("name", "string").add("p", "string")
      .add("q", "int")
    e.createTable("ns.foreign", schema, partitionDecls = Seq("q"))
    e.setProperties("ns.foreign", Map.empty,
      unset = Set(graft.meta.FieldIds.PropKey))
    // rename the spec FIELD away from its source column (legal per the
    // Iceberg spec; foreign writers do this) by editing the metadata the
    // way a foreign catalog would publish it
    val dir = e.tableDir("ns.foreign")
    val mdPath = graft.meta.IcebergMeta.latestMetadataPath(dir)
    val v = mdPath.getFileName.toString.stripPrefix("v")
      .stripSuffix(".metadata.json").toInt
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(Files.readString(mdPath))
    root.get("partition-specs").forEach { sp =>
      sp.get("fields").forEach { f =>
        if (f.get("name").asText() == "q")
          f.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
            .put("name", "q_part")
        ()
      }
    }
    Files.writeString(Paths.get(dir, s"metadata/v${v + 1}.metadata.json"),
      mapper.writeValueAsString(root))

    e.adoptFiles("ns.foreign", srcDir)
    // entries key their partition values under the SPEC FIELD name
    val t = e.load("ns.foreign")
    assert(t.files().nonEmpty &&
      t.files().forall(f => f.partition.contains("q_part") &&
        !f.partition.contains("q")),
      s"entry maps must key by spec-field name: ${t.files().map(_.partition)}")

    // read-back fills q from the metadata; partition-equals probe on the
    // SOURCE column prunes; synthesized bounds prune too
    val got = e.readTable("ns.foreign").select("id", "q")
      .as[(Long, Int)].collect().sorted.toSeq
    val want = spark.read.parquet(srcDir).select("id", "q")
      .as[(Long, Int)].collect().sorted.toSeq
    assert(got == want)
    val full = e.readTable("ns.foreign")
    val probe = e.readTableWhere("ns.foreign", "id", None, None,
      partitionEquals = Map("q" -> "2"))
    assert(probe.inputFiles.length < full.inputFiles.length)
    assert(probe.count() == full.filter(col("q") === 2).count())
    val bprobe = e.readTableWhere("ns.foreign", "q", Some(3.0), Some(3.0))
    assert(bprobe.inputFiles.length < full.inputFiles.length,
      "synthesized bounds must land under the renamed spec field")
    assert(bprobe.count() == full.filter(col("q") === 3).count())
  }

  test("a NON-CONFLICT commit failure after the link pass unlinks the " +
      "adopted files — the residue-free contract covers commit errors, " +
      "not just gate refusals") {
    val (tblSrc, wh) = freshDirs()
    (1L to 50L).map(i => (i, s"v$i")).toDF("id", "name").coalesce(1)
      .write.mode("overwrite").parquet(tblSrc)
    val e = new Engine(spark, wh)
    e.registerParquet("ns.residue", tblSrc)
    // a vendor file whose FOOTER is healthy (passes every admission
    // gate) but whose data pages are corrupt: the distributed stats
    // pass inside commitFiles throws AFTER the files are linked
    val drop = Files.createTempDirectory("graft-corrupt-drop")
    (51L to 2050L).map(i => (i, s"v$i")).toDF("id", "name").coalesce(1)
      .write.mode("overwrite").parquet(drop.toString)
    val f = Files.list(drop).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val bytes = Files.readAllBytes(f)
    assert(bytes.length > 4000, "fixture file must have real data pages")
    java.util.Arrays.fill(bytes, 8, 1000, 0xFF.toByte)
    Files.write(f, bytes)

    val dataDir = Paths.get(e.tableDir("ns.residue"), "data")
    def listing(): Set[String] = {
      val s = Files.list(dataDir)
      try s.iterator().asScala.map(_.getFileName.toString).toSet
      finally s.close()
    }
    val before = listing()
    // the legacy agg stats source reads the drop's data pages inside
    // commitFiles — the corruption then throws AFTER the link pass,
    // which is exactly the failure window this test pins
    spark.conf.set(graft.meta.TableWriter.StatsSourceKey, "agg")
    val ex =
      try intercept[Exception](e.adoptFiles("ns.residue", drop.toString))
      finally spark.conf.unset(graft.meta.TableWriter.StatsSourceKey)
    assert(!ex.isInstanceOf[graft.meta.CommitConflictException],
      s"the corruption must surface as a non-conflict error: $ex")
    assert(listing() == before,
      "a failed commit must leave no linked residue in data/")
    // the table still reads exactly its pre-drop rows
    assert(e.readTable("ns.residue").count() == 50L)

    // the DEFAULT footer stats source never reads data pages (the
    // Iceberg add_files discipline): the same page-corrupt drop adopts
    // on footer facts alone, and the corruption surfaces at the first
    // COLUMN-MATERIALIZING scan of the adopted file instead of at
    // adoption time (a bare count() is footer-served and stays green)
    e.adoptFiles("ns.residue", drop.toString)
    intercept[Exception](
      // sum over `id`, whose pages sit inside the corrupted byte range
      e.readTable("ns.residue").agg(sum(col("id"))).collect())
  }

  test("timestamp hive keys: synthesized bounds carry full MICROS in the " +
      "SESSION zone — sub-ms values and a shifted JVM default zone never " +
      "let bounds pruning drop the matching file") {
    // deliberately skew the JVM default zone away from the session zone
    // (UTC): the synthesized bound must follow the SESSION zone, because
    // that is the zone the scan fill's cast reconstructs rows with
    val prevTz = java.util.TimeZone.getDefault
    java.util.TimeZone.setDefault(
      java.util.TimeZone.getTimeZone("America/New_York"))
    try {
      val (srcDir, wh) = freshDirs()
      val e = new Engine(spark, wh)
      val tsA = "2024-03-01T12:34:56.123456" // sub-millisecond micros
      Seq((1L, "a")).toDF("id", "name").coalesce(1)
        .write.mode("overwrite").parquet(s"$srcDir/ts=$tsA")
      Seq((2L, "b")).toDF("id", "name").coalesce(1)
        .write.mode("overwrite").parquet(s"$srcDir/ts=2024-03-01T18:00:00")
      val schema = new org.apache.spark.sql.types.StructType()
        .add("id", "long").add("name", "string").add("ts", "timestamp")
      e.createTable("ns.tskeys", schema, partitionDecls = Seq("ts"))
      e.setProperties("ns.tskeys", Map.empty,
        unset = Set(graft.meta.FieldIds.PropKey))
      e.adoptFiles("ns.tskeys", srcDir)

      val instA = java.time.LocalDateTime.parse(tsA)
        .atZone(java.time.ZoneOffset.UTC).toInstant
      val microsA = instA.getEpochSecond * 1000000L + instA.getNano / 1000L

      // bounds probe at the exact UTC micros: exactly the tsA file
      // survives — a JVM-zone or millis-floored bound would prune it
      val probe = e.readTableWhere("ns.tskeys", "ts",
        Some(microsA.toDouble), Some(microsA.toDouble))
      assert(probe.inputFiles.length == 1,
        s"bounds probe must keep exactly the matching file " +
        s"(kept ${probe.inputFiles.length})")

      // the filled column reads as the session-zone instant with full
      // micros — and a partition-equals probe in the raw path spelling
      // prunes to the same single file
      val got = e.readTable("ns.tskeys")
        .filter(col("id") === 1L).select("ts").collect()
      assert(got.length == 1)
      val ts = got.head.getTimestamp(0)
      assert(ts.getTime * 1000L + (ts.getNanos / 1000) % 1000 == microsA,
        s"filled value must be the session-zone instant at micro precision: $ts")
      val pprobe = e.readTableWhere("ns.tskeys", "id", None, None,
        partitionEquals = Map("ts" -> tsA))
      assert(pprobe.inputFiles.length == 1 && pprobe.count() == 1L)
    } finally java.util.TimeZone.setDefault(prevTz)
  }

  test("ragged key layouts and untyped values are refused; a mid-link " +
      "failure leaves no residue") {
    val (srcDir, wh) = freshDirs()
    val e = new Engine(spark, wh)
    // ragged: one file under p=a, one at the root
    Seq((1L, "x")).toDF("id", "name").coalesce(1)
      .write.mode("overwrite").parquet(s"$srcDir/p=a")
    Seq((2L, "y")).toDF("id", "name").coalesce(1)
      .write.mode("overwrite").parquet(s"$srcDir/nokv")
    // collapse the second into the root to make layouts ragged
    val f = Files.list(Paths.get(s"$srcDir/nokv")).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(f, Paths.get(s"$srcDir/root.parquet"))
    val ex = intercept[IllegalArgumentException](
      e.registerParquet("ns.ragged", srcDir))
    assert(ex.getMessage.contains("partition-path layouts"))

    // untyped value against a declared int column (add-files path)
    val (tblSrc, _) = freshDirs()
    rows(1L, 10L).write.mode("overwrite").partitionBy("q").parquet(tblSrc)
    e.registerParquet("ns.typed", tblSrc)
    val badDrop = Files.createTempDirectory("graft-hive-src").toString
    rows(11L, 15L).select("id", "name", "p").write.mode("overwrite")
      .parquet(s"$badDrop/q=notanint")
    val ex2 = intercept[IllegalArgumentException](
      e.adoptFiles("ns.typed", badDrop))
    assert(ex2.getMessage.contains("does not parse as int"))

    // mid-link failure: one source path vanishes between walk and link —
    // linkInto unlinks everything it created
    val dataDir = Paths.get(e.tableDir("ns.typed"), "data")
    def dataListing(): Set[String] = {
      val s = Files.list(dataDir)
      try s.iterator().asScala.map(_.getFileName.toString).toSet
      finally s.close()
    }
    val before = dataListing()
    val real = Files.list(Paths.get(tblSrc, "q=1")).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    intercept[Exception](Engine.linkInto(Paths.get(e.tableDir("ns.typed")),
      Seq(real, Paths.get("/nonexistent/gone.parquet"))))
    assert(dataListing() == before,
      "a mid-link failure must unlink every link already created")
  }
}
