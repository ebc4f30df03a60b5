package graft.meta

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

import graft.SparkSpec
import graft.api.Engine

/** Randomized EVOLUTION FUZZ: a seeded sequence of appends, MERGE
  * upserts, merge-on-read deletes, and compactions interleaved with
  * add/rename/widen/drop column evolution, checked against an in-memory
  * model keyed by FIELD ID (the identity that survives renames). This is
  * the adversarial workout for the round-15 field-id read machinery:
  * every read crosses multiple file generations written under different
  * schemas, and any name-resolved read, resurrected dropped field, or
  * mis-scoped equality delete shows up as a model mismatch.
  *
  * Time travel is fuzzed too: the model is snapshotted at every commit,
  * and sampled historical snapshots must read back EXACTLY the model
  * state of that moment, under the SCHEMA of that moment.
  *
  * The second case starts LEGACY (id-less files), migrates to field ids
  * MID-SEQUENCE, and interleaves partition-SPEC evolution — pinned reads
  * into pre-boundary history must keep the name-resolved read while
  * post-boundary generations read by id, across a mixed-layout file set.
  */
class EvolutionFuzzSpec extends SparkSpec {

  /** One column's live state: field id never changes; name and width do. */
  private case class Col(fieldId: Int, var name: String, var isInt: Boolean)

  /** Drive `steps` random ops; `migrateAt = Some(n)` starts the table
    * LEGACY (no field-id property) and runs `migrateToFieldIds` before
    * step n — renames are held back until after the boundary (the
    * migration contract: rename first would null the column);
    * `specEvery = Some(k)` toggles the default partition spec every k
    * steps (bucket[4](id) ↔ unpartitioned) so file generations span
    * layouts. Returns nothing — every check asserts inline. */
  private def runFuzz(
      seed: Long,
      steps: Int,
      migrateAt: Option[Int],
      specEvery: Option[Int],
      withAdoption: Boolean = false,
      // toggle IDENTITY specs (first value column ↔ unpartitioned)
      // instead of bucket[4](id) — the layout hive adoption targets
      identitySpecs: Boolean = false,
      // drive the WHOLE op mix through a JDBC pointer catalog and
      // assert the pointer mirrors path-latest after every step — the
      // round-18 commit-mirror invariant under the fuzz's full churn
      jdbcPointer: Boolean = false): Unit = {
    val rnd = new scala.util.Random(seed)
    val wh = Files.createTempDirectory("graft-fuzz-wh").toString
    val e =
      if (!jdbcPointer) new Engine(spark, wh)
      else {
        val cat = new JdbcCatalog(
          s"jdbc:derby:memory:fuzz$seed;create=true", "fz", Some(wh))
        cat.init()
        new Engine(spark, "", cat)
      }
    val ref = "fz.t"
    def assertPointer(tag: String): Unit = e.catalog match {
      case pc: PointerCatalog =>
        val path = IcebergMeta.latestMetadataPath(e.tableDir(ref)).toString
        assert(pc.metadataPointer(ref).contains(path),
          s"[$tag] catalog pointer must mirror path-latest " +
          s"(${pc.metadataPointer(ref)} vs $path)")
      case _ => ()
    }

    // live schema state: id (key, field 1) + value columns
    val cols = mutable.ArrayBuffer(Col(2, "c1", isInt = false))
    var nextField = 3 // TableCreator allocated 1=id, 2=c1
    var nextColName = 2
    e.createTable(ref, StructType(Seq(
      StructField("id", LongType), StructField("c1", LongType))))
    if (migrateAt.nonEmpty) // legacy start: strip the id guarantee
      e.setProperties(ref, Map.empty, unset = Set(FieldIds.PropKey))

    // model: id -> fieldId -> value (None = null, i.e. pre-add rows)
    val model = mutable.LinkedHashMap.empty[Long, mutable.Map[Int, Option[Long]]]
    var nextId = 0L
    // history: (snapshotId, schema names in order, column states, model copy)
    val history = mutable.ArrayBuffer.empty[
      (Long, Seq[String], Seq[(Int, Boolean)], Map[Long, Map[Int, Option[Long]]])]
    var migrated = migrateAt.isEmpty
    var historyAtMigration = -1 // history size when the boundary landed
    var hiveAdoptions = 0 // identitySpecs runs must actually exercise it

    def deepCopy: Map[Long, Map[Int, Option[Long]]] =
      model.map { case (k, v) => k -> v.toMap }.toMap
    def schemaNames: Seq[String] = "id" +: cols.map(_.name).toSeq
    def record(snap: Long): Unit =
      history += ((snap, schemaNames, cols.map(c => (c.fieldId, c.isInt)).toSeq, deepCopy))

    def rowValue(id: Long, f: Int, salt: Long): Long = {
      val v = id * 31L + f * 7L + salt
      v & 0xffffL // stays inside Int range for int-typed columns
    }
    def batchDf(ids: Seq[Long], salt: Long) = {
      val st = StructType(StructField("id", LongType) +: cols.map(c =>
        StructField(c.name, if (c.isInt) IntegerType else LongType)).toSeq)
      val rows: Seq[Row] = ids.map { id =>
        Row.fromSeq(id +: cols.map { c =>
          val v = rowValue(id, c.fieldId, salt)
          // explicit boxing: a plain if/else unifies Int|Long to Long
          // (numeric widening) and the int column would carry Long cells
          (if (c.isInt) Int.box(v.toInt) else Long.box(v)): Any
        }.toSeq)
      }
      spark.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, st)
    }
    def putModel(ids: Seq[Long], salt: Long): Unit = ids.foreach { id =>
      model(id) = mutable.Map(cols.map(c =>
        c.fieldId -> Some(rowValue(id, c.fieldId, salt))).toSeq: _*)
    }

    def checkCurrent(tag: String): Unit = {
      val got = e.readTable(ref).collect().map { r =>
        val id = r.getLong(r.fieldIndex("id"))
        id -> cols.map { c =>
          val i = r.fieldIndex(c.name)
          c.fieldId -> (if (r.isNullAt(i)) None
            else Some(if (c.isInt) r.getInt(i).toLong else r.getLong(i)))
        }.toMap
      }.toMap
      val want = model.map { case (k, v) =>
        k -> cols.map(c => c.fieldId -> v.getOrElse(c.fieldId, None)).toMap
      }.toMap
      assert(got.size == want.size, s"[$tag] row count ${got.size} != ${want.size}")
      want.foreach { case (id, wv) =>
        assert(got.contains(id), s"[$tag] missing id $id")
        assert(got(id) == wv, s"[$tag] id $id: got ${got(id)} want $wv")
      }
      // round-18 summary SOUNDNESS under the full op mix: every data
      // manifest's partition summaries must admit every entry it holds —
      // the exact property manifest-level pruning relies on. (Tightness
      // is not asserted; soundness is what loses rows when violated.)
      val t = e.load(ref)
      t.manifests().filter(m => m.content == 0 && m.partitions.nonEmpty)
        .foreach { m =>
          val types = ManifestSummaries.fieldTypes(t.metadata, m.partitionSpecId)
          val entries = t.manifestEntries(t.resolvePath(m.manifestPath))
            .filter(_.status != 2)
          for {
            s <- m.partitions
            tp <- types.get(s.name)
            en <- entries
            form <- en.partition.get(s.name)
          } assert(ManifestSummaries.mayContain(s, tp, form),
            s"[$tag] manifest ${m.manifestPath}: summary $s for ${s.name} " +
            s"excludes held entry value '$form'")
        }
    }

    // bootstrap: one initial batch so every op has something to chew on
    val init = (0 until 20).map(_ => { val i = nextId; nextId += 1; i })
    val s0 = e.append(ref, batchDf(init, salt = 0)).snapshotId
    putModel(init, salt = 0)
    record(s0)

    for (step <- 1 to steps) {
      if (migrateAt.contains(step)) {
        // THE BOUNDARY: one full rewrite, rows unchanged — history
        // before this point holds id-less files forever
        e.migrateToFieldIds(ref).foreach(record)
        migrated = true
        historyAtMigration = history.size
      }
      if (specEvery.exists(step % _ == 0)) // layout flip for future writes
        e.setPartitionSpec(ref,
          if ((step / specEvery.get) % 2 == 1)
            (if (identitySpecs) Seq(cols.head.name) else Seq("bucket[4](id)"))
          else Seq.empty)
      rnd.nextInt(if (withAdoption) 11 else 10) match {
        case 0 | 1 | 2 => // append fresh rows
          val ids = (0 until (3 + rnd.nextInt(8))).map(_ => { val i = nextId; nextId += 1; i })
          val snap = e.append(ref, batchDf(ids, salt = step)).snapshotId
          putModel(ids, salt = step)
          record(snap)
        case 3 | 4 => // MERGE upsert: rewrite some existing + insert some new
          val existing = rnd.shuffle(model.keys.toSeq).take(1 + rnd.nextInt(5))
          val fresh = (0 until rnd.nextInt(3)).map(_ => { val i = nextId; nextId += 1; i })
          val ids = existing ++ fresh
          val snap = e.upsert(ref, batchDf(ids, salt = step), Seq("id")).snapshotId
          putModel(ids, salt = step)
          record(snap)
        case 5 => // merge-on-read DELETE
          val m = 2 + rnd.nextInt(5)
          val r = rnd.nextInt(m)
          val cr = e.deleteWhere(ref, col("id") % m === r)
          model.keys.toSeq.filter(id => id % m == r).foreach(model.remove)
          cr.foreach(c => record(c.snapshotId))
        case 6 => // add a column (int half the time, to feed widen)
          val name = s"c$nextColName"; nextColName += 1
          val isInt = rnd.nextBoolean()
          e.addColumn(ref, name, if (isInt) "int" else "long")
          cols += Col(nextField, name, isInt)
          nextField += 1
          model.values.foreach(_(cols.last.fieldId) = None) // old rows read null
        case 7 if migrated => // rename a value column (post-boundary only)
          val c = cols(rnd.nextInt(cols.size))
          val to = s"c${nextColName}r"; nextColName += 1
          e.renameColumn(ref, c.name, to)
          c.name = to
        case 7 => // legacy phase: a rename would null the column — append
          val ids = (0 until 3).map(_ => { val i = nextId; nextId += 1; i })
          val snap = e.append(ref, batchDf(ids, salt = step)).snapshotId
          putModel(ids, salt = step)
          record(snap)
        case 8 => // widen an int column, or drop one if none (keep >= 1 col)
          cols.find(_.isInt) match {
            case Some(c) =>
              e.widenColumn(ref, c.name, "long")
              c.isInt = false
            case None if cols.size > 1 && migrated =>
              // a current partition SOURCE cannot drop (SchemaEvolution
              // refuses) — pick among the rest
              val specSrc = e.load(ref).metadata.currentSpec.fields
                .map(_.sourceId).toSet
              val candidates = cols.indices.filterNot(i =>
                specSrc.contains(cols(i).fieldId))
              if (candidates.nonEmpty) {
                val i = candidates(rnd.nextInt(candidates.size))
                e.dropColumn(ref, cols(i).name)
                val dropped = cols.remove(i)
                model.values.foreach(_.remove(dropped.fieldId))
              }
            case _ => () // single long column / legacy phase: skip
          }
        case 9 => // compact (fold deletes when present)
          e.rewriteSmallFiles(ref, smallBytes = 1L << 30)
            .foreach(cr => record(cr.snapshotId))
        case 10 => // ADOPT a foreign drop in place (add-files): plain
          // parquet while the table is legacy, footer-id-attributed
          // after the boundary (adoptFiles refuses id-less files then).
          // An IDENTITY spec whose field names match their sources takes
          // a HIVE-LAYOUT drop (round 17 — partition values in the
          // paths); any other live spec (bucket, renamed sources)
          // refuses adoption — fall back to the write path, exactly
          // what the refusal message advises
          val ids = (0 until (2 + rnd.nextInt(4))).map(_ => { val i = nextId; nextId += 1; i })
          val drop = batchDf(ids, salt = step)
          val md = e.load(ref).metadata
          val spec = md.currentSpec
          val srcName: Map[Int, String] =
            md.currentSchema.fields.map(f => f.id -> f.name).toMap
          val hiveable = spec.fields.nonEmpty &&
            spec.fields.forall(sf => sf.transform == "identity" &&
              srcName.get(sf.sourceId).contains(sf.name))
          if (spec.fields.nonEmpty && !hiveable) {
            val snap = e.append(ref, drop).snapshotId
            putModel(ids, salt = step)
            record(snap)
          } else {
            val dir = Files.createTempDirectory("graft-fuzz-drop").toString
            val out =
              if (!migrated) drop
              else FieldIds.attributeColumns(drop,
                e.load(ref).metadata.currentSchema.fields)
            if (hiveable) {
              hiveAdoptions += 1
              out.coalesce(1).write.mode("overwrite")
                .partitionBy(spec.fields.map(_.name): _*).parquet(dir)
            } else out.coalesce(1).write.mode("overwrite").parquet(dir)
            val snap = e.adoptFiles(ref, dir).snapshotId
            putModel(ids, salt = step)
            record(snap)
          }
      }
      if (jdbcPointer) assertPointer(s"step $step")
      if (step % 8 == 0) checkCurrent(s"step $step")
    }
    if (jdbcPointer) assertPointer("final")
    checkCurrent("final")
    if (identitySpecs && withAdoption)
      assert(hiveAdoptions >= 2,
        s"the seed must land hive-layout adoptions (got $hiveAdoptions) — " +
        "re-seed rather than silently fuzzing nothing")

    // time travel: sampled historical snapshots read back the model AND
    // the schema of their moment. With a migration boundary, sample BOTH
    // sides: pre-boundary pins exercise the name-resolved read of
    // id-less files, post-boundary pins the id read.
    val samples =
      if (historyAtMigration < 0) rnd.shuffle(history.toSeq).take(6)
      else {
        val (pre, post) = history.toSeq.splitAt(historyAtMigration)
        assert(pre.nonEmpty, "the legacy phase must have committed history")
        rnd.shuffle(pre).take(3) ++ rnd.shuffle(post).take(3)
      }
    samples.foreach { case (snap, names, colStates, m) =>
      val df = e.readTable(ref, Some(snap))
      assert(df.columns.toSeq == names,
        s"snapshot $snap must expose its own schema: ${df.columns.toSeq} != $names")
      val got = df.collect().map { r =>
        val id = r.getLong(r.fieldIndex("id"))
        id -> names.drop(1).zip(colStates).map { case (n, (fid, isInt)) =>
          val i = r.fieldIndex(n)
          fid -> (if (r.isNullAt(i)) None
            else Some(if (isInt) r.getInt(i).toLong else r.getLong(i)))
        }.toMap
      }.toMap
      val want = m.map { case (k, v) =>
        k -> colStates.map { case (fid, _) => fid -> v.getOrElse(fid, None) }.toMap
      }
      assert(got.size == want.size,
        s"snapshot $snap rows ${got.size} != ${want.size}")
      want.foreach { case (id, wv) =>
        assert(got(id) == wv, s"snapshot $snap id $id: got ${got(id)} want $wv")
      }
    }
  }

  test("40-step random evolution/write/maintenance sequence matches the model") {
    runFuzz(seed = 20260816L, steps = 40, migrateAt = None, specEvery = None)
  }

  test("LEGACY start → mid-sequence field-id migration with interleaved " +
      "partition-spec evolution matches the model on both sides of the boundary") {
    runFuzz(seed = 20260817L, steps = 40, migrateAt = Some(15), specEvery = Some(6))
  }

  test("adoption in the mix: foreign drops (add-files) interleave with " +
      "evolution, migration and spec flips, and still match the model") {
    runFuzz(seed = 20260818L, steps = 40, migrateAt = Some(12),
      specEvery = Some(8), withAdoption = true)
  }

  test("HIVE adoption in the mix: identity-spec flips make foreign drops " +
      "land as key=value layouts (metadata-filled reads), interleaved " +
      "with evolution, migration and time travel — and match the model") {
    runFuzz(seed = 20260819L, steps = 40, migrateAt = Some(14),
      specEvery = Some(5), withAdoption = true, identitySpecs = true)
  }

  test("JDBC-POINTER fuzz: the whole op mix through a pointer catalog " +
      "keeps the catalog pointer at path-latest after EVERY step, and " +
      "the model still matches") {
    runFuzz(seed = 20260820L, steps = 30, migrateAt = Some(10),
      specEvery = Some(6), withAdoption = true, jdbcPointer = true)
  }
}
