package graft.ops

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.fixtures.FixtureWriter
import graft.tools.Cli

class SkewAndCliSpec extends SparkSpec {

  test("salted aggregation matches the plain aggregate on skewed data") {
    val s2 = spark
    import s2.implicits._
    // 90% of rows land on one hot key
    val rows = (1 to 20000).map { i =>
      (if (i % 10 == 0) s"key${i % 7}" else "hot", (i % 100) / 10.0)
    }
    val df = rows.toDF("k", "v").repartition(16)
    val plain = Skew.plainStats(df, Seq("k"), "v")
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val salted = Skew.saltedStats(df, Seq("k"), "v", buckets = 8)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("CLI verbs run end-to-end against the demo warehouse") {
    val wh = Files.createTempDirectory("graft-cli-wh").toString
    FixtureWriter.writeDemo(spark, wh)
    assert(Cli.run(Array(wh, "list-tables")) == 0)
    assert(Cli.run(Array(wh, "summary", "sales.orders")) == 0)
    assert(Cli.run(Array(wh, "recent", "analytics.events")) == 0)
    assert(Cli.run(Array(wh, "warehouse")) == 0)
    val out = Files.createTempDirectory("graft-cli-out").toString
    assert(Cli.run(Array(wh, "snapshots", "sales.orders", "--json", s"$out/snaps")) == 0)
    assert(Files.list(java.nio.file.Paths.get(s"$out/snaps")).count() > 0)
    // tree + test-connection (ref Engine.tree / catalog.py:222-232)
    assert(Cli.run(Array(wh, "tree", "analytics.events")) == 0)
    assert(Cli.run(Array(wh, "test-connection", "--csv", s"$out/conn")) == 0)
    val connCsv = Files.list(java.nio.file.Paths.get(s"$out/conn"))
      .iterator().asScala.find(_.toString.endsWith(".csv")).get
    val lines = Files.readAllLines(connCsv).asScala
    assert(lines.head == "namespace_count,table_count")
    assert(lines(1) == "4,5") // sales/analytics/staging/legacy, 5 tables
  }

  test("a trailing --config/--catalog with no value is a usage error") {
    assert(graft.tools.Cli.run(Array("/tmp/nowhere", "list-tables", "--catalog")) == 2)
    assert(graft.tools.Cli.run(Array("--config")) == 2)
  }

  test("a mid-args --config/--catalog followed by another flag is a usage error") {
    // the forgotten value must NOT silently swallow the next flag
    assert(graft.tools.Cli.run(
      Array("/tmp/nowhere", "list-tables", "--config", "--json")) == 2)
    assert(graft.tools.Cli.run(
      Array("--catalog", "--config", "x.json", "/tmp/nowhere", "list-tables")) == 2)
  }

  test("round-8 CLI verbs: bpe / winnow-removal / dedup-gate") {
    val s2 = spark
    import s2.implicits._
    val wh = Files.createTempDirectory("graft-cli-wh8").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$wh/lake"))
    val docsDir = s"$wh/_docs_parquet"
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different text with no shared span at all here"))
      .toDF("doc_id", "text").write.parquet(docsDir)
    assert(Cli.run(Array(wh, "bpe", docsDir, "3")) == 0)
    assert(Cli.run(Array(wh, "winnow-removal", docsDir)) == 0)
    // gate: create + bootstrap an index table, then probe a shard via CLI
    val e = new graft.api.Engine(spark, wh)
    val idx = new graft.ops.NearDupIndex(e, "lake.nd_idx")
    idx.create()
    idx.bootstrap(spark.read.parquet(docsDir))
    val shardDir = s"$wh/_shard_parquet"
    Seq((10L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text").write.parquet(shardDir)
    assert(Cli.run(Array(wh, "dedup-gate", "lake.nd_idx", shardDir)) == 0)
    assert(Cli.run(Array(wh, "dedup-gate", "lake.nd_idx", shardDir, "--admit")) == 0)
    // --intra routes through the batch-local keep-min pass
    val twinDir = s"$wh/_twin_parquet"
    Seq(
      (20L, "an intra batch twin sentence appearing twice in this shard"),
      (21L, "an intra batch twin sentence appearing twice in this shard"))
      .toDF("doc_id", "text").write.parquet(twinDir)
    assert(Cli.run(Array(
      wh, "dedup-gate", "lake.nd_idx", twinDir, "--admit", "--intra")) == 0)
    val e2 = new graft.api.Engine(spark, wh)
    val ids = e2.readTable("lake.nd_idx").select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(ids.contains(20L) && !ids.contains(21L), ids.toString)

    // comp-fold: bootstrap the persisted dup-cluster ledger from edges,
    // then fold a later batch incrementally — all through the CLI
    val edgesDir = s"$wh/_edges_parquet"
    Seq((1L, 2L)).toDF("a_id", "b_id").write.parquet(edgesDir)
    assert(Cli.run(Array(
      wh, "comp-fold", "lake.comps", edgesDir, "--bootstrap")) == 0)
    val moreDir = s"$wh/_edges2_parquet"
    Seq((2L, 10L)).toDF("a_id", "b_id").write.parquet(moreDir)
    assert(Cli.run(Array(wh, "comp-fold", "lake.comps", moreDir)) == 0)
    val comps = e2.readTable("lake.comps").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(2L -> 1L, 10L -> 1L), comps.toString)

    // comp-retire: drop doc 1 from the gate index AND the ledger; the
    // survivors (2, 10 — not near-dups of each other) re-cluster to
    // singletons off the gate's residual pairs
    assert(Cli.run(Array(
      wh, "comp-retire", "lake.comps", "lake.nd_idx", "1")) == 0)
    assert(e2.readTable("lake.nd_idx")
      .filter(org.apache.spark.sql.functions.col("doc_id") === 1L)
      .count() == 0L)
    assert(new graft.ops.ComponentIndex(e2, "lake.comps")
      .assignments.count() == 0L)
  }

  test("round-14 CLI verb: forget — one ordered retire across corpus, " +
      "gate, ledger, and ANN index") {
    val s2 = spark
    import s2.implicits._
    val wh = Files.createTempDirectory("graft-cli-wh14").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$wh/lake"))
    val e = new graft.api.Engine(spark, wh)
    val textA = "the quick brown fox jumps over the lazy dog"
    val textB = "pack my box with five dozen liquor jugs today"
    val docs = Seq((1L, textA), (2L, textA), (3L, textB))
      .toDF("doc_id", "text")
    e.createTable("lake.corpus", docs.schema)
    e.append("lake.corpus", docs)
    val gate = new graft.ops.NearDupIndex(e, "lake.f_gate")
    gate.create(); gate.bootstrap(docs)
    val comps = new graft.ops.ComponentIndex(e, "lake.f_comps")
    comps.create(); comps.bootstrap(gate.pairsAmong(docs.select("doc_id")))
    val ann = new graft.ops.AnnIndex(e, "lake.f_ann", kClusters = 2)
    ann.create()
    ann.bootstrap(Seq(
      AnnIndexSpec.Vec(1L, 0, Seq(1f, 0f)),
      AnnIndexSpec.Vec(2L, 0, Seq(0.9f, 0.1f)),
      AnnIndexSpec.Vec(3L, 1, Seq(0f, 1f))).toDF())

    assert(Cli.run(Array(wh, "forget", "lake.corpus", "2,3",
      "--gate", "lake.f_gate", "--ledger", "lake.f_comps",
      "--ann", "lake.f_ann")) == 0)
    assert(e.readTable("lake.corpus").select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(1L))
    assert(gate.check(Seq((99L, textB)).toDF("doc_id", "text")).count() == 0L)
    assert(comps.assignments.count() == 0L)
    assert(e.readTable("lake.f_ann").select("vec_id")
      .collect().map(_.getLong(0)).toSet == Set(1L))

    // a ledger with no gate and no --docs is a usage-level refusal
    assert(Cli.run(Array(wh, "forget", "-", "1",
      "--ledger", "lake.f_comps")) == 1)
    // STRICT flag parse: a value-less --docs must error, not silently
    // fall back to the gate provider (wrong residual pairs); --sim
    // without --ann must error, not silently use minhash pairs
    assert(Cli.run(Array(wh, "forget", "-", "1",
      "--gate", "lake.f_gate", "--ledger", "lake.f_comps", "--docs")) == 1)
    assert(Cli.run(Array(wh, "forget", "-", "1",
      "--gate", "lake.f_gate", "--ledger", "lake.f_comps",
      "--sim", "0.9")) == 1)
    // --docs and --sim together: refused (two different edge semantics)
    assert(Cli.run(Array(wh, "forget", "-", "1",
      "--ann", "lake.f_ann", "--ledger", "lake.f_comps",
      "--docs", "nope.parquet", "--sim", "0.9")) == 1)
    // --docs WITHOUT --gate: refused — the docs provider would silently
    // default numPerm/rowsPerBand and produce a different collision set
    // than the ledger was built with
    assert(Cli.run(Array(wh, "forget", "-", "1",
      "--ledger", "lake.f_comps", "--docs", "nope.parquet")) == 1)
    // comp-retire: a value-less --docs errors instead of silently
    // selecting the gate provider
    assert(Cli.run(Array(wh, "comp-retire", "lake.f_comps",
      "lake.f_gate", "1", "--docs")) == 1)

    // SEMANTIC ledger via the CLI: ann-gate --ledger folds the batch's
    // cosine collision pairs; forget --sim retires through the index-
    // served residual-pair provider
    val comps2 = new graft.ops.ComponentIndex(e, "lake.f_comps2")
    comps2.create()
    val bDir = s"$wh/_annbatch_parquet"
    Seq(AnnIndexSpec.Vec(20L, 0, Seq(0.99f, 0.01f))).toDF().write.parquet(bDir)
    // a value-less --ledger must error, not silently skip the fold
    assert(Cli.run(Array(wh, "ann-gate", "lake.f_ann", bDir, "0.9",
      "--ledger")) == 1)
    assert(Cli.run(Array(wh, "ann-gate", "lake.f_ann", bDir, "0.9",
      "--ledger", "lake.f_comps2")) == 0)
    assert(comps2.assignments.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(20L -> 1L))
    assert(Cli.run(Array(wh, "forget", "-", "1",
      "--ann", "lake.f_ann", "--ledger", "lake.f_comps2",
      "--sim", "0.9", "--advise")) == 0)
    assert(comps2.assignments.count() == 0L)
    assert(e.readTable("lake.f_ann").select("vec_id")
      .collect().map(_.getLong(0)).isEmpty)
  }

  test("tui verb drives the interactive UI and exits cleanly on stdin EOF") {
    val wh = Files.createTempDirectory("graft-cli-tui").toString
    FixtureWriter.writeDemo(spark, wh)
    // forked test JVMs get a closed stdin: the loop paints the first
    // frame (warehouse overview at the tree root) and exits on EOF
    assert(Cli.run(Array(wh, "tui")) == 0)
  }

  test("round-5 CLI verbs: read/changes/compact/rollback/orphans") {
    val wh = Files.createTempDirectory("graft-cli-wh5").toString
    FixtureWriter.writeDemo(spark, wh)
    val md = graft.meta.IcebergMeta.load(s"$wh/sales/orders")
    val snaps = md.snapshots.map(_.snapshotId)
    assert(Cli.run(Array(wh, "read", "sales.orders")) == 0)
    assert(Cli.run(Array(wh, "changes", "sales.orders",
      snaps.head.toString, snaps.last.toString)) == 0)
    assert(Cli.run(Array(wh, "compact", "sales.orders")) == 0)
    assert(Cli.run(Array(wh, "orphans", "sales.orders")) == 0)
    assert(Cli.run(Array(wh, "rollback", "sales.orders", snaps.head.toString)) == 0)
    assert(Cli.run(Array(wh, "rollback", "sales.orders", "42")) == 1) // friendly error
  }

  test("round-6 CLI verbs: create-table/zorder/update-where/delete-where") {
    val wh = Files.createTempDirectory("graft-cli-wh6").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$wh/lake"))
    assert(Cli.run(Array(wh, "create-table", "lake.pts",
      "x:bigint,y:bigint,tag:string")) == 0)
    val pq = Files.createTempDirectory("graft-cli-pts").toString
    spark.range(0, 1000)
      .selectExpr("id % 50 AS x", "CAST(id / 50 AS bigint) AS y",
        "concat('t', id % 3) AS tag")
      .write.mode("overwrite").parquet(pq)
    assert(Cli.run(Array(wh, "append-parquet", "lake.pts", pq)) == 0)
    assert(Cli.run(Array(wh, "zorder", "lake.pts", "x,y", "4")) == 0)
    assert(Cli.run(Array(wh, "update-where", "lake.pts", "x = 0", "tag='zero'")) == 0)
    assert(Cli.run(Array(wh, "delete-where", "lake.pts", "y > 15",
      "--copy-on-write")) == 0)
    val t = graft.meta.IcebergTable.load(s"$wh/lake/pts")
    val rows = ScanPlanner.readTable(spark, t)
    assert(rows.count() == 800L) // y in [16,19] deleted: 4*50 rows
    assert(rows.filter(org.apache.spark.sql.functions.col("tag") === "zero")
      .count() == 16L) // x=0 rows surviving the delete: y 0..15
  }

  test("round-7 CLI verbs: widen-column / set-property / unset-property") {
    val wh = Files.createTempDirectory("graft-cli-wh7").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$wh/lake"))
    assert(Cli.run(Array(wh, "create-table", "lake.w", "id:bigint,qty:int")) == 0)
    assert(Cli.run(Array(wh, "widen-column", "lake.w", "qty", "long")) == 0)
    assert(graft.meta.IcebergTable.load(s"$wh/lake/w").metadata
      .currentSchema.fields.find(_.name == "qty").get.fieldType == "long")
    assert(Cli.run(Array(wh, "set-property", "lake.w",
      "write.distribution-mode", "none")) == 0)
    assert(graft.meta.IcebergTable.load(s"$wh/lake/w").metadata
      .properties.get("write.distribution-mode").contains("none"))
    assert(Cli.run(Array(wh, "unset-property", "lake.w",
      "write.distribution-mode")) == 0)
    assert(!graft.meta.IcebergTable.load(s"$wh/lake/w").metadata
      .properties.contains("write.distribution-mode"))
    // narrowing via the CLI fails with a nonzero exit
    assert(Cli.run(Array(wh, "widen-column", "lake.w", "qty", "int")) == 1)
  }

  test("round-15 CLI verbs: add-column / rename-column / drop-column") {
    val wh = Files.createTempDirectory("graft-cli-wh15").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$wh/lake"))
    assert(Cli.run(Array(wh, "create-table", "lake.evo", "id:bigint,v:long")) == 0)
    assert(Cli.run(Array(wh, "add-column", "lake.evo", "note", "string")) == 0)
    assert(Cli.run(Array(wh, "rename-column", "lake.evo", "v", "value")) == 0)
    def fields = graft.meta.IcebergTable.load(s"$wh/lake/evo").metadata
      .currentSchema.fields.map(_.name)
    assert(fields == Seq("id", "value", "note"), fields.toString)
    assert(Cli.run(Array(wh, "drop-column", "lake.evo", "note")) == 0)
    assert(fields == Seq("id", "value"))
    // renaming a missing column fails with a nonzero exit, not a stack
    assert(Cli.run(Array(wh, "rename-column", "lake.evo", "nope", "x")) == 1)
  }

  test("round-7 CLI verbs: entries / all-files / all-manifests") {
    val wh = Files.createTempDirectory("graft-cli-wh7b").toString
    graft.fixtures.FixtureWriter.writeDemo(spark, wh)
    assert(Cli.run(Array(wh, "entries", "sales.orders")) == 0)
    assert(Cli.run(Array(wh, "all-files", "sales.orders")) == 0)
    assert(Cli.run(Array(wh, "all-manifests", "sales.orders")) == 0)
  }

  test("round-7 CLI verbs: table-info / snapshot-detail / doctor / demo") {
    val wh = Files.createTempDirectory("graft-cli-wh7c").toString
    assert(Cli.run(Array(wh, "demo")) == 0) // seeds the warehouse
    val e = new graft.api.Engine(spark, wh)
    val info = e.tableInfo("sales.orders").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(info.exists(r => r._1 == "overview" && r._2 == "format_version" && r._3 == "2"))
    assert(info.exists(r => r._1 == "schema" && r._2 == "order_id"))
    assert(info.count(_._1 == "partition_spec") > 0)
    val snapId = e.load("sales.orders").metadata.currentSnapshotId.get
    assert(Cli.run(Array(wh, "snapshot-detail", "sales.orders", snapId.toString)) == 0)
    intercept[IllegalArgumentException] { e.snapshotDetail("sales.orders", 424242L) }
    val doc = e.doctor().collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(doc("warehouse") == "OK")
    assert(doc("spark") == "OK")
    assert(Cli.run(Array(wh, "doctor")) == 0)
  }

  test("CLI stage-parquet + publish drive the WAP loop end-to-end") {
    val wh = Files.createTempDirectory("graft-cli-wap").toString
    FixtureWriter.writeDemo(spark, wh)
    val e = new graft.api.Engine(spark, wh)
    val before = e.readTable("sales.orders").count()
    val stage = Files.createTempDirectory("graft-cli-wap-in")
    e.readTable("sales.orders").limit(1)
      .withColumn("order_id", org.apache.spark.sql.functions.lit(7777L))
      .write.mode("overwrite").parquet(stage.toString)
    assert(Cli.run(Array(wh, "stage-parquet", "sales.orders",
      stage.toString, "cli-wap")) == 0)
    assert(e.readTable("sales.orders").count() == before) // still invisible
    assert(Cli.run(Array(wh, "publish", "sales.orders", "cli-wap")) == 0)
    assert(e.readTable("sales.orders").count() == before + 1)
    assert(Cli.run(Array(wh, "publish", "sales.orders", "nope")) == 1)
  }

  test("advise names the maintenance verbs the table actually needs") {
    val wh = Files.createTempDirectory("graft-cli-advise").toString
    FixtureWriter.writeDemo(spark, wh)
    val e = new graft.api.Engine(spark, wh)
    // the overwrite left one file per partition: append a second small
    // file into an existing partition to create the compaction condition
    val s2 = spark
    import s2.implicits._
    e.append("sales.orders", Seq(
      (800L, "Adv One", "us-east", 5.0, java.sql.Date.valueOf("2024-03-01"),
        java.sql.Timestamp.valueOf("2024-03-01 10:00:00")))
      .toDF("order_id", "customer_name", "region", "amount", "order_date", "created_at"))
    val before = e.advise("sales.orders").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // now us-east holds two tiny files, and no NDV stats are stored
    assert(before("compact") == "RECOMMENDED")
    assert(before("analyze") == "RECOMMENDED")
    assert(before("compact-incremental") == "OK")
    assert(before("orphans --remove") == "OK")

    // a MoR delete flips the incremental-compaction advice on
    e.deleteWhere("sales.orders",
      org.apache.spark.sql.functions.col("order_id") === 800L)
    val withDel = e.advise("sales.orders").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(withDel("compact-incremental") == "RECOMMENDED")

    // acting on the advice clears it: incremental compaction folds the
    // delete into rewritten files, pruning drops the dangling entry
    e.rewriteSmallFilesIncremental("sales.orders")
    e.pruneDanglingDeletes("sales.orders")
    graft.ops.Stats.analyzeTable(spark, e.tableDir("sales.orders"))
    val after = e.advise("sales.orders").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(after("compact") == "OK")
    assert(after("compact-incremental") == "OK")
    assert(after("analyze") == "OK")
    assert(Cli.run(Array(wh, "advise", "sales.orders")) == 0)
  }

  test("CLI maps missing table to a friendly nonzero exit") {
    val wh = Files.createTempDirectory("graft-cli-wh2").toString
    FixtureWriter.writeDemo(spark, wh)
    assert(Cli.run(Array(wh, "summary", "nope.missing")) == 1)
    assert(Cli.run(Array(wh)) == 2) // too few args
  }

  test("round-10 CLI verbs: ann-index / ann-gate / ann-search") {
    val s2 = spark
    import s2.implicits._
    val wh = Files.createTempDirectory("graft-cli-wh10").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$wh/ml"))
    val embDir = s"$wh/_emb_parquet"
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    Seq(
      (100L, 0, v(1, 0, 0, 0)), (101L, 0, v(0.9, 0.1, 0, 0)),
      (102L, 1, v(0, 0, 1, 0)), (103L, 1, v(0, 0, 0.9, 0.1)))
      .toDF("vec_id", "label", "embedding").write.parquet(embDir)
    assert(Cli.run(Array(wh, "ann-index", "ml.idx", embDir, "2")) == 0)
    assert(Cli.run(Array(wh, "ann-search", "ml.idx", "100", "2")) == 0)
    val batchDir = s"$wh/_batch_parquet"
    Seq((10L, 0, v(1, 0, 0, 0)), (11L, 1, v(0, 1, 0, 0)))
      .toDF("vec_id", "label", "embedding").write.parquet(batchDir)
    assert(Cli.run(Array(wh, "ann-gate", "ml.idx", batchDir, "0.95")) == 0)
    // the gate admitted only the novel vector
    val e = new graft.api.Engine(spark, wh)
    val idx = new graft.ops.AnnIndex(e, "ml.idx")
    assert(idx.signatures.count() == 5)

    // EXTERNAL-probe form: a parquet path of (vec_id, embedding) rows
    // drives the serving overload — no kmeans, index unmutated
    val probesDir = s"$wh/_probes_parquet"
    Seq((7L, v(0.95, 0.05, 0, 0)), (8L, v(0, 0.05, 0.95, 0)))
      .toDF("vec_id", "embedding").write.parquet(probesDir)
    val runs = graft.ops.Clustering.kmeansRuns.get()
    assert(Cli.run(Array(wh, "ann-search", "ml.idx", probesDir, "2", "1")) == 0)
    assert(graft.ops.Clustering.kmeansRuns.get() == runs,
      "CLI external-probe search re-clustered")
    assert(idx.signatures.count() == 5, "CLI external-probe search mutated the index")

    // index-served decontamination from the CLI: same probes file,
    // never admitted, no re-clustering
    assert(Cli.run(Array(wh, "ann-decontam", "ml.idx", probesDir, "0.9", "1")) == 0)
    assert(graft.ops.Clustering.kmeansRuns.get() == runs)
    assert(idx.signatures.count() == 5)

    // ann-retire: corpus deletion drops the vectors in one commit; no
    // re-clustering, the ghost stops gating an equivalent fresh vector
    assert(Cli.run(Array(wh, "ann-retire", "ml.idx", "11")) == 0)
    assert(idx.signatures.count() == 4)
    assert(graft.ops.Clustering.kmeansRuns.get() == runs)
    val freshDir = s"$wh/_fresh_parquet"
    Seq((12L, 1, v(0, 1, 0, 0)))
      .toDF("vec_id", "label", "embedding").write.parquet(freshDir)
    assert(Cli.run(Array(wh, "ann-gate", "ml.idx", freshDir, "0.95")) == 0)
    assert(idx.signatures.count() == 5, "retired ghost blocked re-admission")

    // IVF-PQ from the CLI: pqM/pqK ride the ann-index verb, the search
    // verb serves the PQ path off the persisted codebooks
    assert(Cli.run(Array(wh, "ann-index", "ml.pq", embDir, "2", "2", "2")) == 0)
    val pq = new graft.ops.AnnIndex(e, "ml.pq")
    assert(pq.codebooks.exists(_.length == 2))
    assert(Cli.run(Array(wh, "ann-search", "ml.pq", "100", "2")) == 0)

    // ann-rebuild from the CLI: retrains (kmeans runs), keeps every row
    // and the index's PQ-ness, lands exactly one overwrite commit, and
    // resets the drift baseline
    val rowsBefore = pq.signatures.count()
    val snapsBefore = e.load("ml.pq").metadata.snapshots.size
    val runsBefore2 = graft.ops.Clustering.kmeansRuns.get()
    assert(Cli.run(Array(wh, "ann-rebuild", "ml.pq")) == 0)
    assert(graft.ops.Clustering.kmeansRuns.get() > runsBefore2)
    assert(pq.signatures.count() == rowsBefore)
    assert(pq.codebooks.exists(_.length == 2))
    val t2 = e.load("ml.pq")
    assert(t2.metadata.snapshots.size == snapsBefore + 1)
    assert(t2.metadata.currentSnapshot.get.operation == "overwrite")
    assert(graft.ops.AnnIndex.drift(t2, Some(spark)).get.admitted == 0L)
  }
}
