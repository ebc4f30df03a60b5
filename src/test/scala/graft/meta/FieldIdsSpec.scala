package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.api.Engine

/** FIELD-ID column resolution (the Iceberg rename contract): id-stamped
  * tables read data/delete files by parquet footer field id, so rename
  * is metadata-only — pre-rename files keep serving their data under the
  * new name, and a dropped-then-readded name never resurrects the
  * retired field's values. Legacy tables (no property) keep name reads.
  */
class FieldIdsSpec extends SparkSpec {
  import spark.implicits._

  private def freshEngine(): Engine =
    new Engine(spark, Files.createTempDirectory("graft-fid-wh").toString)

  test("rename: pre-rename files serve data under the new name (by id)") {
    val e = freshEngine()
    val df = Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
    e.createTable("t.ren", df.schema)
    e.append("t.ren", df)                      // generation 1: column name `v`
    e.renameColumn("t.ren", "v", "value")
    e.append("t.ren", Seq((3L, 30L)).toDF("id", "value"))
    val got = e.readTable("t.ren").orderBy("id")
      .select("id", "value").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L), (2L, 20L), (3L, 30L)),
      s"old-generation rows must read by field id, got $got")
  }

  test("equality deletes written before a key rename still apply after it") {
    val e = freshEngine()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
    e.createTable("t.eqren", df.schema)
    e.append("t.eqren", df)
    // upsert keyed on `k` → eq-delete file carries column name `k`
    e.upsert("t.eqren", Seq((2L, "B")).toDF("k", "s"), Seq("k"))
    e.renameColumn("t.eqren", "k", "key")
    val got = e.readTable("t.eqren").orderBy("key")
      .select("key", "s").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "B"), (3L, "c")),
      s"pre-rename eq-delete must keep removing the old row, got $got")
  }

  test("compaction after a rename preserves the renamed column's data") {
    val e = freshEngine()
    val df1 = Seq((1L, 10L)).toDF("id", "v")
    e.createTable("t.cren", df1.schema)
    e.append("t.cren", df1)
    e.append("t.cren", Seq((2L, 20L)).toDF("id", "v"))
    e.renameColumn("t.cren", "v", "value")
    // both files are small → compaction rewrites them through the scan
    val res = e.rewriteSmallFiles("t.cren", targetBytes = 1L << 20)
    assert(res.nonEmpty, "compaction should have rewritten the small files")
    val got = e.readTable("t.cren").orderBy("id")
      .select("id", "value").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L), (2L, 20L)),
      s"compacted rows must keep the renamed column's values, got $got")
  }

  test("row change feed reads pre-rename generations by id") {
    val e = freshEngine()
    val df1 = Seq((1L, 10L)).toDF("id", "v")
    e.createTable("t.cdfren", df1.schema)
    val s1 = e.append("t.cdfren", df1).snapshotId
    e.renameColumn("t.cdfren", "v", "value")
    val s2 = e.append("t.cdfren", Seq((2L, 20L)).toDF("id", "value")).snapshotId
    val s3 = e.deleteWhere("t.cdfren", col("id") === 1L).get.snapshotId
    val feed = e.rowChanges("t.cdfren", s1, s3)
      .select("_change_type", "id", "value").as[(String, Long, Long)]
      .collect().toSet
    assert(feed == Set(("insert", 2L, 20L), ("delete", 1L, 10L)),
      s"the delete of the PRE-rename row must carry its value by id, got $feed")
    assert(s2 > s1)
  }

  test("change feed resolves pre-rename equality-delete keys by id") {
    val e = freshEngine()
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    e.createTable("t.cdfeq", df.schema)
    val s1 = e.append("t.cdfeq", df).snapshotId
    // upsert writes an eq-delete file carrying column name `k`
    val s2 = e.upsert("t.cdfeq", Seq((2L, "B")).toDF("k", "s"), Seq("k")).snapshotId
    e.renameColumn("t.cdfeq", "k", "key")
    val feed = e.rowChanges("t.cdfeq", s1, s2)
      .select("_change_type", "key", "s").as[(String, Long, String)]
      .collect().toSet
    assert(feed == Set(("insert", 2L, "B"), ("delete", 2L, "b")),
      s"the upsert's eq-delete of key 2 must resolve across the rename, got $feed")
  }

  test("drop + re-add of a name does NOT resurrect the old field's values") {
    val e = freshEngine()
    val df = Seq((1L, 111L)).toDF("id", "v")
    e.createTable("t.readd", df.schema)
    e.append("t.readd", df)
    e.dropColumn("t.readd", "v")
    e.addColumn("t.readd", "v", "long")        // same NAME, new field id
    e.append("t.readd", Seq((2L, 222L)).toDF("id", "v"))
    val got = e.readTable("t.readd").orderBy("id")
      .select(col("id"), col("v")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSeq
    assert(got == Seq((1L, None), (2L, Some(222L))),
      s"old generation must read NULL for the re-added id, got $got")
  }

  test("time travel reads under the SNAPSHOT's schema, not the current one") {
    val e = freshEngine()
    val df = Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
    e.createTable("t.ttschema", df.schema)
    val s1 = e.append("t.ttschema", df).snapshotId
    e.renameColumn("t.ttschema", "v", "value")
    e.addColumn("t.ttschema", "extra", "string")
    e.append("t.ttschema",
      Seq((3L, 30L, "x")).toDF("id", "value", "extra"))
    // pinned read: the names and columns AS OF the snapshot — `v`, no
    // `extra` — with the data intact
    val pinned = e.readTable("t.ttschema", Some(s1))
    assert(pinned.columns.toSeq == Seq("id", "v"),
      s"snapshot schema must surface pre-evolution names: ${pinned.columns.toSeq}")
    assert(pinned.orderBy("id").select("id", "v").as[(Long, Long)]
      .collect().toSeq == Seq((1L, 10L), (2L, 20L)))
    // current read: evolved names over both generations
    val cur = e.readTable("t.ttschema").orderBy("id")
    assert(cur.columns.toSeq == Seq("id", "value", "extra"))
    assert(cur.select("id", "value").as[(Long, Long)].collect().toSeq ==
      Seq((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("legacy snapshots without a schema-id stamp fall back to the current schema") {
    val e = freshEngine()
    val df = Seq((1L, 10L)).toDF("id", "v")
    e.createTable("t.ttlegacy", df.schema)
    val s1 = e.append("t.ttlegacy", df).snapshotId
    // simulate pre-stamp metadata: strip the snapshot's schema-id
    val dir = e.tableDir("t.ttlegacy")
    val (md, v) = IcebergMeta.loadVersioned(dir)
    val stripped = md.copy(snapshots = md.snapshots.map(_.copy(schemaId = None)))
    IcebergMeta.publish(
      java.nio.file.Paths.get(dir, "metadata", s"v${v + 1}.metadata.json"),
      IcebergMeta.render(stripped))
    e.renameColumn("t.ttlegacy", "v", "value")
    val pinned = e.readTable("t.ttlegacy", Some(s1))
    assert(pinned.columns.toSeq == Seq("id", "value"),
      "an unstamped snapshot must keep the historical current-schema read")
  }

  test("migrateToFieldIds: legacy table becomes rename-safe, history stays readable") {
    val wh = Files.createTempDirectory("graft-fid-mig").toString
    graft.fixtures.FixtureWriter.writeDemo(spark, wh)
    val e = new Engine(spark, wh)
    val ref = "sales.orders"
    // fixture tables are hand-written without footer ids → advise flags it
    def adviseRow() = e.advise(ref).filter(col("action") === "migrate-field-ids")
      .select("status").as[String].head()
    assert(adviseRow() == "RECOMMENDED")

    val preSnap = e.load(ref).metadata.currentSnapshotId.get
    val before = e.readTable(ref)
      .select("order_id", "customer_name").as[(Long, String)].collect().toMap

    val migSnap = e.migrateToFieldIds(ref)
    assert(migSnap.nonEmpty)
    assert(adviseRow() == "OK")
    intercept[IllegalArgumentException](e.migrateToFieldIds(ref))

    // rename is now read-safe: the rewritten generation serves the data
    // by field id under the new name
    e.renameColumn(ref, "customer_name", "cust_name")
    val after = e.readTable(ref)
      .select("order_id", "cust_name").as[(Long, String)].collect().toMap
    assert(after == before, "post-migration rename must keep serving the data")

    // pre-migration snapshots hold id-less files: the since-seq boundary
    // keeps them on the name-resolved read — still READABLE, no id error
    val pinned = e.readTable(ref, Some(preSnap))
    assert(pinned.count() > 0)
  }

  test("migrateToFieldIds: a write racing the rewrite loses LOUDLY via " +
      "CAS, and a quiesced retry succeeds with the racer's rows intact") {
    val wh = Files.createTempDirectory("graft-fid-race").toString
    val e = new Engine(spark, wh)
    val df = Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
    e.createTable("t.race", df.schema)
    e.setProperties("t.race", Map.empty, unset = Set(FieldIds.PropKey))
    e.append("t.race", df)

    // an engine whose table read sneaks a concurrent append in between
    // the migration's metadata pin and its rewrite commit — exactly the
    // race the doc used to wave at ("quiesce writers")
    val racing = new Engine(spark, wh) {
      override def readTable(ref: String,
          snapshotId: Option[Long]): org.apache.spark.sql.DataFrame = {
        e.append("t.race", Seq((99L, 990L)).toDF("id", "v"))
        super.readTable(ref, snapshotId)
      }
    }
    intercept[CommitConflictException](racing.migrateToFieldIds("t.race"))
    // loud AND harmless: no property stamped, the racer's row is live
    assert(!FieldIds.tableHasIds(e.load("t.race").metadata))
    assert(e.readTable("t.race").count() == 3L)

    // the retry (writers quiesced) lands; rename is then read-safe over
    // every row including the one the failed attempt raced against
    assert(e.migrateToFieldIds("t.race").nonEmpty)
    e.renameColumn("t.race", "v", "value")
    val got = e.readTable("t.race").select("id", "value")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 10L), (2L, 20L), (99L, 990L)))
  }

  test("migrateToFieldIds refuses live branches and staged WAP snapshots; " +
      "dropping / publishing them clears the refusal") {
    val wh = Files.createTempDirectory("graft-fid-guard").toString
    val e = new Engine(spark, wh)
    val df = Seq((1L, 10L)).toDF("id", "v")
    e.createTable("t.guard", df.schema)
    e.setProperties("t.guard", Map.empty, unset = Set(FieldIds.PropKey))
    e.append("t.guard", df)

    // a live branch: its post-migration appends would sit past the
    // since-seq boundary with id-less files — refused up front
    e.append("t.guard", Seq((5L, 50L)).toDF("id", "v"), branch = Some("dev"))
    val exB = intercept[IllegalArgumentException](e.migrateToFieldIds("t.guard"))
    assert(exB.getMessage.contains("dev"))
    e.dropRef("t.guard", "dev")

    // a staged-unpublished WAP snapshot: a post-migration cherry-pick
    // would re-sequence its id-less files past the boundary — refused
    e.appendStaged("t.guard", Seq((7L, 70L)).toDF("id", "v"), "wap1")
    val exW = intercept[IllegalArgumentException](e.migrateToFieldIds("t.guard"))
    assert(exW.getMessage.contains("WAP"))
    e.publishWap("t.guard", "wap1")

    // published → ancestor of main → the guard passes; tags stay fine
    e.createTag("t.guard", "pin")
    assert(e.migrateToFieldIds("t.guard").nonEmpty)
    e.renameColumn("t.guard", "v", "value")
    val got = e.readTable("t.guard").select("id", "value")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 10L), (7L, 70L)))
  }

  test("idsAtSnapshot: an unknown explicit snapshot id answers the " +
      "conservative name read, not the current snapshot's attribution") {
    val e = freshEngine()
    val df = Seq((1L, 10L)).toDF("id", "v")
    e.createTable("t.unk", df.schema)
    e.setProperties("t.unk", Map.empty, unset = Set(FieldIds.PropKey))
    e.append("t.unk", df)
    e.migrateToFieldIds("t.unk")
    val md = e.load("t.unk").metadata
    // the current state is past the boundary…
    assert(FieldIds.idsAtSnapshot(md, None))
    assert(FieldIds.idsAtSnapshot(md, md.currentSnapshotId))
    // …but an expired-but-referenced id must NOT inherit that verdict
    assert(!FieldIds.idsAtSnapshot(md, Some(123456789L)))
  }

  test("change feed into pre-migration history reads that era's " +
      "equality-delete keys by NAME (per-commit gating)") {
    val wh = Files.createTempDirectory("graft-fid-feed").toString
    val e = new Engine(spark, wh)
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
    e.createTable("t.feedmig", df.schema)
    e.setProperties("t.feedmig", Map.empty, unset = Set(FieldIds.PropKey))
    val s0 = e.append("t.feedmig", df).snapshotId
    e.upsert("t.feedmig", Seq((2L, "B")).toDF("k", "s"), Seq("k"))
    e.migrateToFieldIds("t.feedmig")

    // the feed range covers the PRE-boundary upsert: its id-less
    // eq-delete key file must keep the name-resolved read even though
    // the CURRENT snapshot sits past the boundary (an id-attributed
    // read has no name fallback and would error)
    val head = e.load("t.feedmig").metadata.currentSnapshotId.get
    val feed = e.rowChanges("t.feedmig", s0, head)
      .select(col("k"), col("s"), col("_change_type"))
      .as[(Long, String, String)].collect().toSeq
    assert(feed.contains((2L, "b", "delete")),
      s"the pre-boundary upsert's delete must surface, got $feed")
    assert(feed.contains((2L, "B", "insert")))
  }

  test("snapshot-less property stamps are CAS-guarded too: a first " +
      "write racing an empty-table migration loses loudly") {
    val e = freshEngine()
    val df = Seq((1L, 10L)).toDF("id", "v")
    e.createTable("t.nosnap", df.schema)
    e.setProperties("t.nosnap", Map.empty, unset = Set(FieldIds.PropKey))
    // the tri-state's third leg, directly: require-no-snapshot passes
    // while the table is empty…
    e.setProperties("t.nosnap", Map("a" -> "1"),
      expectNoCurrentSnapshot = true)
    // …and conflicts loudly once a first write landed
    e.append("t.nosnap", df)
    intercept[CommitConflictException](
      e.setProperties("t.nosnap", Map("b" -> "2"),
        expectNoCurrentSnapshot = true))

    // the path that needs it: migrating a NEVER-WRITTEN legacy table is
    // a property-only stamp, pinned on the table staying snapshot-less
    val e2 = freshEngine()
    e2.createTable("t.empty", df.schema)
    e2.setProperties("t.empty", Map.empty, unset = Set(FieldIds.PropKey))
    assert(e2.migrateToFieldIds("t.empty").isEmpty)
    assert(FieldIds.tableHasIds(e2.load("t.empty").metadata))
    // post-stamp writes are id-stamped from the boundary on
    e2.append("t.empty", df)
    e2.renameColumn("t.empty", "v", "value")
    assert(e2.readTable("t.empty").select("value").as[Long].collect()
      .toSeq == Seq(10L))
  }

  test("legacy tables (property unset) keep the name-resolved read") {
    val e = freshEngine()
    val df = Seq((1L, 10L)).toDF("id", "v")
    e.createTable("t.legacy", df.schema)
    e.setProperties("t.legacy", Map.empty, unset = Set(FieldIds.PropKey))
    e.append("t.legacy", df)
    e.renameColumn("t.legacy", "v", "value")
    val got = e.readTable("t.legacy").select("id", "value").collect()
    // documented legacy degradation: the renamed column reads null from
    // pre-rename files (no id guarantee → no id read); the scan must
    // still succeed
    assert(got.length == 1 && got(0).getLong(0) == 1L && got(0).isNullAt(1))
  }
}
