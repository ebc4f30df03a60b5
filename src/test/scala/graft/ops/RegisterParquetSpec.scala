package graft.ops

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.api.Engine
import graft.tools.Cli

/** `Engine.registerParquet` — adopt an existing plain-parquet directory
  * as an engine table WITHOUT rewriting its data (the `add_files` /
  * `register_table` onboarding analog): files hard-linked in place, one
  * read-only stats pass, one append-shaped commit; `migrateToFieldIds`
  * is the documented follow-up for rename-safe reads. */
class RegisterParquetSpec extends SparkSpec {
  import spark.implicits._

  private def freshDirs(): (String, String) = (
    Files.createTempDirectory("graft-reg-src").toString,
    Files.createTempDirectory("graft-reg-wh").toString)

  test("adopt → scan equals spark.read.parquet; files are LINKED, not " +
      "rewritten; bounds from the stats pass prune like a native table") {
    val (srcDir, wh) = freshDirs()
    val df = (1L to 400L).map(i => (i, s"v$i", i * 2.0)).toDF("id", "name", "score")
    // range layout → each adopted file carries tight disjoint id bounds
    df.repartitionByRange(4, col("id")).write.mode("overwrite").parquet(srcDir)
    val e = new Engine(spark, wh)
    val res = e.registerParquet("ns.adopted", srcDir)
    assert(res.addedFiles == 4 && res.addedRecords == 400L)

    // row-for-row equal to reading the source directly
    val got = e.readTable("ns.adopted").select("id", "name", "score")
      .as[(Long, String, Double)].collect().sorted.toSeq
    val want = spark.read.parquet(srcDir).select("id", "name", "score")
      .as[(Long, String, Double)].collect().sorted.toSeq
    assert(got == want)

    // adoption moved no data bytes: every registered file is a hard link
    // to (or byte-identical twin of) a source file — link count 2 on a
    // same-filesystem temp dir
    val t = e.load("ns.adopted")
    val linked = t.files().map(f => Paths.get(t.resolvePath(f.filePath)))
    assert(linked.size == 4)
    linked.foreach { p =>
      val nlink = Files.getAttribute(p, "unix:nlink").asInstanceOf[Number].intValue()
      assert(nlink >= 2, s"$p should be a hard link into the source dir")
    }

    // the one stats pass stamped real bounds: a tight range prunes files
    val pruned = e.readTableWhere("ns.adopted", "id", Some(10.0), Some(20.0))
    assert(pruned.count() == 11L)
    assert(pruned.inputFiles.length < e.readTable("ns.adopted").inputFiles.length,
      "adopted files must carry min/max bounds for pruning")

    // summary stamps provenance
    val snap = e.load("ns.adopted").metadata.currentSnapshot.get
    assert(snap.summary.get("adopted-from").contains(srcDir))

    // the commit reuses the gate pass's footer block metadata for
    // column_sizes (no second footer pass) — entries must carry the
    // exact per-column compressed bytes a direct footer read reports
    val fieldIds = t.metadata.currentSchema.fields
      .map(f => f.name -> f.id).toMap
    t.files().foreach { entry =>
      val abs = t.resolvePath(entry.filePath)
      val conf = new org.apache.hadoop.conf.Configuration()
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(abs), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in,
        org.apache.parquet.HadoopReadOptions.builder(conf, in.getPath).build())
      val want =
        try r.getFooter.getBlocks.asScala
          .flatMap(_.getColumns.asScala)
          .groupBy(_.getPath.toDotString)
          .map { case (c, chunks) => c -> chunks.map(_.getTotalSize).sum }
        finally r.close()
      assert(want.nonEmpty)
      want.foreach { case (colName, bytes) =>
        assert(entry.columnSizes.get(fieldIds(colName)).contains(bytes),
          s"column_sizes for $colName should come from the footer verbatim")
      }
    }
  }

  test("adopted table is first-class: MoR delete, field-id migration, " +
      "rename, compaction all land on the linked files") {
    val (srcDir, wh) = freshDirs()
    (1L to 100L).map(i => (i, s"n$i")).toDF("k", "v")
      .coalesce(2).write.mode("overwrite").parquet(srcDir)
    val e = new Engine(spark, wh)
    e.registerParquet("ns.first", srcDir)

    // foreign files carry no footer ids → advise flags the follow-up
    val adviseRow = e.advise("ns.first")
      .filter(col("action") === "migrate-field-ids")
      .select("status").as[String].head()
    assert(adviseRow == "RECOMMENDED")

    // a merge-on-read delete applies against the LINKED files (relative
    // paths keep the pos-delete lineage convention intact)
    e.deleteWhere("ns.first", col("k") <= 10L)
    assert(e.readTable("ns.first").count() == 90L)

    // the documented follow-up: migrate → rename is read-safe
    assert(e.migrateToFieldIds("ns.first").nonEmpty)
    e.renameColumn("ns.first", "v", "name")
    val got = e.readTable("ns.first").select("k", "name")
      .as[(Long, String)].collect().sorted.toSeq
    assert(got == (11L to 100L).map(i => (i, s"n$i")))
  }

  test("hive-layout partition directories adopt as a PARTITIONED table " +
      "(round 17 — the canonical add_files shape); empty dirs refused") {
    val (srcDir, wh) = freshDirs()
    Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "v", "p")
      .write.mode("overwrite").partitionBy("p").parquet(srcDir)
    val e = new Engine(spark, wh)
    val r = e.registerParquet("ns.hive", srcDir)
    assert(r.addedRecords == 2L)
    assert(e.load("ns.hive").metadata.currentSpec.fields
      .map(f => (f.name, f.transform)) == Seq(("p", "identity")))
    val got = e.readTable("ns.hive").select("id", "v", "p")
      .as[(Long, String, String)].collect().sorted.toSeq
    assert(got == Seq((1L, "a", "x"), (2L, "b", "y")))
    // empty / parquet-free directories are refused
    val empty = Files.createTempDirectory("graft-reg-empty").toString
    intercept[IllegalArgumentException](e.registerParquet("ns.empty", empty))
  }

  test("adoptFiles: a second drop of plain files lands on an existing " +
      "legacy table as one append; schema mismatches are refused") {
    val (srcA, wh) = freshDirs()
    (1L to 40L).map(i => (i, s"a$i")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(srcA)
    val e = new Engine(spark, wh)
    e.registerParquet("ns.drops", srcA)

    val srcB = Files.createTempDirectory("graft-reg-src").toString
    (41L to 60L).map(i => (i, s"b$i")).toDF("k", "v")
      .coalesce(2).write.mode("overwrite").parquet(srcB)
    val r = e.adoptFiles("ns.drops", srcB)
    assert(r.addedFiles == 2 && r.addedRecords == 20L)
    val got = e.readTable("ns.drops").select("k", "v")
      .as[(Long, String)].collect().sorted.toSeq
    assert(got == ((1L to 40L).map(i => (i, s"a$i")) ++
      (41L to 60L).map(i => (i, s"b$i"))))

    // a drop with a different schema is refused loudly
    val srcC = Files.createTempDirectory("graft-reg-src").toString
    Seq((1L, 2.5)).toDF("k", "score")
      .write.mode("overwrite").parquet(srcC)
    val ex = intercept[IllegalArgumentException](e.adoptFiles("ns.drops", srcC))
    assert(ex.getMessage.contains("does not match"))
  }

  test("adoptFiles: an id-stamped table refuses id-less files, accepts " +
      "footer-id-stamped ones, and serves them rename-safe") {
    val (srcPlain, wh) = freshDirs()
    val e = new Engine(spark, wh)
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    e.createTable("ns.idt", df.schema) // id-stamped from birth
    e.append("ns.idt", df)

    // plain files: no footer ids → refused with the migration hint
    df.write.mode("overwrite").parquet(srcPlain)
    val ex = intercept[IllegalArgumentException](e.adoptFiles("ns.idt", srcPlain))
    assert(ex.getMessage.contains("field id"))

    // files written with the table's exact (name -> id) footer mapping
    // are accepted — and read BY ID across a later rename
    val srcIds = Files.createTempDirectory("graft-reg-src").toString
    val fields = e.load("ns.idt").metadata.currentSchema.fields
    graft.meta.FieldIds.attributeColumns(
        Seq((3L, "z")).toDF("k", "v"), fields)
      .coalesce(1).write.mode("overwrite").parquet(srcIds)
    val r = e.adoptFiles("ns.idt", srcIds)
    assert(r.addedRecords == 1L)
    e.renameColumn("ns.idt", "v", "name")
    val got = e.readTable("ns.idt").select("k", "name")
      .as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((1L, "x"), (2L, "y"), (3L, "z")),
      s"adopted id-stamped file must serve its column by id, got $got")
  }

  test("adoptFiles into an id-stamped table WITH a list<primitive> " +
      "column: the flat surface includes embedding vectors") {
    val (srcDir, wh) = freshDirs()
    val e = new Engine(spark, wh)
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 4.0f)))
      .toDF("k", "emb")
    e.createTable("ns.vecs", df.schema) // id-stamped, list<float> column
    e.append("ns.vecs", df)
    // a drop attributed with the table's footer ids adopts cleanly —
    // the list element child (path "emb.element") must NOT trip the
    // nested-field refusal (it is part of the engine's flat surface)
    val fields = e.load("ns.vecs").metadata.currentSchema.fields
    graft.meta.FieldIds.attributeColumns(
        Seq((3L, Seq(5.0f, 6.0f))).toDF("k", "emb"), fields)
      .coalesce(1).write.mode("overwrite").parquet(srcDir)
    val r = e.adoptFiles("ns.vecs", srcDir)
    assert(r.addedRecords == 1L)
    assert(e.readTable("ns.vecs").count() == 3L)
  }

  test("a refused or conflict-exhausted drop leaves NO orphan files " +
      "in the table's data dir") {
    val (srcDir, wh) = freshDirs()
    (1L to 5L).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(srcDir)
    val e = new Engine(spark, wh)
    e.registerParquet("ns.clean", srcDir)
    e.migrateToFieldIds("ns.clean") // id-stamped: plain drops now refuse
    def dataListing(): Set[String] = {
      val s = Files.list(Paths.get(e.tableDir("ns.clean"), "data"))
      try s.iterator().asScala.map(_.getFileName.toString).toSet
      finally s.close()
    }
    val before = dataListing()
    val drop = Files.createTempDirectory("graft-reg-src").toString
    (6L to 9L).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(drop)
    intercept[IllegalArgumentException](e.adoptFiles("ns.clean", drop))
    assert(dataListing() == before,
      "a refused drop must unlink everything it staged")
  }

  test("adoptFiles refuses a table with a live partition spec") {
    val (src, wh) = freshDirs()
    Seq((1L, "a")).toDF("k", "v").write.mode("overwrite").parquet(src)
    val e = new Engine(spark, wh)
    val df = Seq((1L, "a")).toDF("k", "v")
    e.createTable("ns.parted", df.schema, partitionDecls = Seq("v"))
    val ex = intercept[IllegalArgumentException](e.adoptFiles("ns.parted", src))
    assert(ex.getMessage.contains("partition spec"))
  }

  test("a MIXED-SCHEMA drop is refused loudly, naming the divergent " +
      "file — and a corrupt file fails BEFORE the table exists") {
    val (srcDir, wh) = freshDirs()
    val e = new Engine(spark, wh)
    // two files with different column sets: single-footer inference
    // would pass and null the missing column later — refused up front
    Seq((1L, "a")).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$srcDir/one")
    Seq(2L).toDF("k").coalesce(1)
      .write.mode("overwrite").parquet(s"$srcDir/two")
    val flat = Files.createTempDirectory("graft-reg-mixed").toString
    // collapse into one flat dir (avoid any nesting questions)
    var i = 0
    Seq("one", "two").foreach { sub =>
      Files.list(Paths.get(s"$srcDir/$sub")).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .foreach { p => Files.copy(p, Paths.get(f"$flat/f$i%02d.parquet")); i += 1 }
    }
    val ex = intercept[IllegalArgumentException](
      e.registerParquet("ns.mixed", flat))
    assert(ex.getMessage.contains("differ from the drop's schema"))
    intercept[Exception](e.load("ns.mixed")) // no half-registered table

    // a corrupt file fails the footer probe BEFORE createTable commits
    val bad = Files.createTempDirectory("graft-reg-bad").toString
    Seq((1L, "ok")).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(bad)
    Files.write(Paths.get(s"$bad/junk.parquet"),
      Array.fill[Byte](64)(0x42))
    intercept[Exception](e.registerParquet("ns.corrupt", bad))
    intercept[Exception](e.load("ns.corrupt"))
  }

  test("type-promotion tolerance: a drop written at a pre-widen width " +
      "(int32 under long, float under double) adopts and reads exact; " +
      "a non-promotable mismatch still refuses loudly") {
    val (srcOld, wh) = freshDirs()
    val e = new Engine(spark, wh)
    // table born at the narrow widths, then widened — the natural
    // vendor-feed sequence: widen the table, vendor still ships int32
    val df0 = Seq((1, 1.5f, "a"), (2, 2.5f, "b")).toDF("k", "score", "v")
    e.createTable("ns.widen", df0.schema)
    e.append("ns.widen", df0)
    e.widenColumn("ns.widen", "k", "long")
    e.widenColumn("ns.widen", "score", "double")

    // the drop carries the OLD widths — footer-id-stamped so the id
    // gate passes (ids are about names, not widths)
    val fields = e.load("ns.widen").metadata.currentSchema.fields
    graft.meta.FieldIds.attributeColumns(
        Seq((3, 3.5f, "c")).toDF("k", "score", "v"), fields)
      .coalesce(1).write.mode("overwrite").parquet(srcOld)
    val r = e.adoptFiles("ns.widen", srcOld)
    assert(r.addedRecords == 1L)
    val got = e.readTable("ns.widen").select("k", "score", "v")
      .as[(Long, Double, String)].collect().sorted.toSeq
    assert(got == Seq((1L, 1.5, "a"), (2L, 2.5, "b"), (3L, 3.5, "c")),
      s"pre-widen drop must read up-cast under the declared schema, got $got")
    // the adopted file's stats aggregated at the DECLARED width: a
    // range probe over the widened column prunes/serves correctly
    assert(e.readTableWhere("ns.widen", "k", Some(3.0), Some(3.0))
      .count() == 1L)

    // a NON-promotable mismatch (string under the double column) still
    // refuses loudly, naming both sides
    val srcBad = Files.createTempDirectory("graft-reg-src").toString
    graft.meta.FieldIds.attributeColumns(
        Seq((5, "oops", "e")).toDF("k", "score", "v"), fields)
      .write.mode("overwrite").parquet(srcBad)
    val ex = intercept[IllegalArgumentException](e.adoptFiles("ns.widen", srcBad))
    assert(ex.getMessage.contains("safe promotions"), ex.getMessage)
    assert(e.readTable("ns.widen").count() == 3L, "refused drop must not land")
  }

  test("legacy 2-level list encoding and standard 3-level encoding " +
      "canonicalize to ONE schema (parquet-mr compat rule) — a drop " +
      "mixing both registers and reads back whole") {
    val (srcDir, wh) = freshDirs()
    val e = new Engine(spark, wh)
    val std = Seq((1L, Seq(1.0, 2.0))).toDF("k", "xs")
    val leg = Seq((2L, Seq(3.0))).toDF("k", "xs")
    std.coalesce(1).write.mode("overwrite").parquet(s"$srcDir/std")
    val old = spark.conf.get("spark.sql.parquet.writeLegacyFormat", "false")
    try {
      spark.conf.set("spark.sql.parquet.writeLegacyFormat", "true")
      leg.coalesce(1).write.mode("overwrite").parquet(s"$srcDir/leg")
    } finally spark.conf.set("spark.sql.parquet.writeLegacyFormat", old)
    // collapse into one flat dir
    val flat = Files.createTempDirectory("graft-reg-listenc").toString
    var i = 0
    Seq("std", "leg").foreach { sub =>
      val s = Files.list(Paths.get(s"$srcDir/$sub"))
      try s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .foreach { p => Files.copy(p, Paths.get(f"$flat/f$i%02d.parquet")); i += 1 }
      finally s.close()
    }
    val r = e.registerParquet("ns.listenc", flat)
    assert(r.addedRecords == 2L,
      "2-level vs 3-level list encodings must not read as schema drift")
    val got = e.readTable("ns.listenc").select("k", "xs")
      .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, Seq(1.0, 2.0)), (2L, Seq(3.0))))
  }

  test("a '=' in a FILE name is not a hive partition — adopted fine") {
    val (srcDir, wh) = freshDirs()
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    val part = Files.list(Paths.get(srcDir)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val renamed = part.getParent.resolve("metrics=v2.parquet")
    Files.move(part, renamed)
    val e = new Engine(spark, wh)
    val r = e.registerParquet("ns.eqname", srcDir)
    assert(r.addedRecords == 2L)
  }

  test("a migrate racing an adoption loses the interleaving: the " +
      "adopt's CAS-pinned commit conflicts, and the re-validated retry " +
      "refuses the now id-less files") {
    val (srcDir, wh) = freshDirs()
    (1L to 10L).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(srcDir)
    val e = new Engine(spark, wh)
    e.registerParquet("ns.race2", srcDir) // legacy table, 10 rows

    val drop = Files.createTempDirectory("graft-reg-src").toString
    (11L to 15L).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(drop)

    // an engine whose metadata load sneaks a full field-id migration in
    // between the adopt's gate validation and its commit
    val racing = new Engine(spark, wh) {
      var raced = false
      override def load(r: String): graft.meta.IcebergTable = {
        val t = super.load(r)
        if (!raced && r == "ns.race2") { raced = true
          e.migrateToFieldIds("ns.race2") }
        t
      }
    }
    // gates validated LEGACY state; the commit is pinned to it, so the
    // migration's rewrite surfaces as a conflict; the retry re-runs the
    // gates on the id-stamped state and REFUSES the id-less drop — the
    // files never land past the boundary
    val ex = intercept[IllegalArgumentException](
      racing.adoptFiles("ns.race2", drop))
    assert(ex.getMessage.contains("field id"))
    assert(e.readTable("ns.race2").count() == 10L)
  }

  test("a PROPERTY-ONLY migrate racing an adoption of an EMPTY table is " +
      "caught by the metadata-version pin (snapshot pins are blind to it)") {
    val (srcDir, wh) = freshDirs()
    (1L to 5L).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(srcDir)
    val e = new Engine(spark, wh)
    // an EMPTY legacy table: migrating it is a property-only stamp that
    // moves NO snapshot pointer — the exact racer a snapshot-id pin
    // cannot see; the id-less drop would land past the boundary and
    // make the table unreadable
    e.createTable("ns.emptyrace",
      (1L to 1L).map(i => (i, "x")).toDF("k", "v").schema)
    e.setProperties("ns.emptyrace", Map.empty,
      unset = Set(graft.meta.FieldIds.PropKey))

    val racing = new Engine(spark, wh) {
      var raced = false
      override def load(r: String): graft.meta.IcebergTable = {
        val t = super.load(r)
        if (!raced && r == "ns.emptyrace") { raced = true
          e.migrateToFieldIds("ns.emptyrace") }
        t
      }
    }
    val ex = intercept[IllegalArgumentException](
      racing.adoptFiles("ns.emptyrace", srcDir))
    assert(ex.getMessage.contains("field id"),
      s"the re-validated retry must refuse the id-less drop: $ex")
    // the table is intact and still holds no files — the id-less drop
    // never landed past the boundary
    assert(e.load("ns.emptyrace").files().isEmpty)
    assert(graft.meta.FieldIds.tableHasIds(e.load("ns.emptyrace").metadata))
  }

  test("a drop whose files diverge only in NESTED members is refused " +
      "(canonical footer-schema uniformity)") {
    val (srcDir, wh) = freshDirs()
    // same top-level column names; file2's struct lacks member y — a
    // top-level-only gate would admit it and silently null s.y
    val rowsA = Seq((1L, ("ax", 1L))).toDF("k", "s")
    val rowsB = Seq((2L, Tuple1("bx"))).toDF("k", "s")
    rowsA.coalesce(1).write.mode("overwrite").parquet(s"$srcDir/a")
    rowsB.coalesce(1).write.mode("overwrite").parquet(s"$srcDir/b")
    val flat = Files.createTempDirectory("graft-reg-nested").toString
    var i = 0
    Seq("a", "b").foreach { sub =>
      val s = Files.list(Paths.get(s"$srcDir/$sub"))
      try s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .foreach { p => Files.copy(p, Paths.get(f"$flat/f$i%02d.parquet")); i += 1 }
      finally s.close()
    }
    val e = new Engine(spark, wh)
    val ex = intercept[IllegalArgumentException](
      e.registerParquet("ns.nestdiv", flat))
    assert(ex.getMessage.contains("NESTED schema structure"), ex.getMessage)
  }

  test("CLI `register` verb adopts and reports") {
    val (srcDir, wh) = freshDirs()
    (1L to 50L).map(i => (i, i * 3L)).toDF("a", "b")
      .coalesce(1).write.mode("overwrite").parquet(srcDir)
    assert(Cli.run(Array(wh, "register", "cli.adopted", srcDir)) == 0)
    val e = new Engine(spark, wh)
    assert(e.readTable("cli.adopted").count() == 50L)

    // the second-drop verb rides the same plumbing
    val src2 = Files.createTempDirectory("graft-reg-src").toString
    (51L to 60L).map(i => (i, i * 3L)).toDF("a", "b")
      .coalesce(1).write.mode("overwrite").parquet(src2)
    assert(Cli.run(Array(wh, "add-files", "cli.adopted", src2)) == 0)
    assert(e.readTable("cli.adopted").count() == 60L)

    // refusals surface as NONZERO exits, not stack traces
    assert(Cli.run(Array(wh, "register", "cli.bad", "/nonexistent-dir")) != 0)
    val mismatched = Files.createTempDirectory("graft-reg-src").toString
    Seq((1L, 2.5)).toDF("a", "other")
      .write.mode("overwrite").parquet(mismatched)
    assert(Cli.run(Array(wh, "add-files", "cli.adopted", mismatched)) != 0)
    assert(e.readTable("cli.adopted").count() == 60L, "refused drop must not land")
  }
}
