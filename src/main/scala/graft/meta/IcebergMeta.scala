package graft.meta

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** In-memory model + JSON (de)serialization of the Iceberg table-metadata
  * document (format versions 1 and 2).
  *
  * The reference consumes this document through pyiceberg
  * (ref `formatters.py:62-74` table facts, `:156-173` snapshots,
  * `:119-150` schemas, `:106-113` partition specs, `:1350-1360` snapshot
  * summary totals), which reads BOTH format versions — v1 uses the
  * singular `schema`/`partition-spec` keys where v2 uses `schemas`/
  * `partition-specs` lists (its format-version census,
  * `tui/widgets.py:996-1001`, exists because mixed-version warehouses are
  * normal). No Iceberg runtime jar ships in this environment, so we parse
  * the metadata JSON directly with Jackson's tree API (no data-binding
  * modules needed). Writing is only used by the deterministic fixture
  * generator ([[graft.fixtures.FixtureWriter]]).
  */
final case class SchemaField(
    id: Int, name: String, required: Boolean, fieldType: String,
    /** Dotted path from the schema root ("addr.street"); equals `name`
      * for top-level fields. Nested struct/list/map children are
      * flattened into [[IceSchema.fields]] with their full path, so
      * field-id based evolution diffs see nested columns too (the
      * reference renders them recursively, `formatters.py:127-139`). */
    path: String,
    /** Compact JSON of the raw Iceberg type node ("\"long\"" for
      * primitives, the full object for struct/list/map). Preserved so
      * [[IcebergMeta.render]] re-emits the structured node instead of the
      * flattened display string — parse→render of a nested schema stays
      * valid metadata. Empty (programmatically-built flat fields) falls
      * back to [[fieldType]], which for primitives is the same thing. */
    typeJson: String = "")
final case class IceSchema(schemaId: Int, fields: Seq[SchemaField])
final case class SpecField(name: String, transform: String, sourceId: Int, fieldId: Int)
final case class PartitionSpec(specId: Int, fields: Seq[SpecField])
final case class Snapshot(
    snapshotId: Long,
    parentSnapshotId: Option[Long],
    timestampMs: Long,
    operation: String,
    summary: Map[String, String],
    manifestList: String,
    /** Iceberg v2 commit sequence number (monotonic per commit; files
      * inherit their adding snapshot's sequence). Scopes delete
      * application: an equality delete hits only rows of data files with
      * a STRICTLY SMALLER sequence. 0 = pre-sequence metadata. */
    sequenceNumber: Long = 0L,
    /** The table schema id at commit time (Iceberg v2 `schema-id`):
      * time-travel reads use THIS schema, not the current one, so a
      * pinned read across later evolution sees the names/columns as of
      * the snapshot. None = legacy metadata → readers fall back to the
      * current schema. */
    schemaId: Option[Int] = None)

/** A named snapshot reference (Iceberg spec `refs`): `branch` refs move
  * with commits ("main"), `tag` refs pin a snapshot forever. */
final case class SnapshotRef(snapshotId: Long, refType: String)

/** One dimension of an Iceberg sort order (spec `sort-orders.fields`):
  * identity (or transform) of a source field, `asc`/`desc`, and the
  * null placement (`nulls-first`/`nulls-last`). */
final case class SortField(
    sourceId: Int, transform: String, direction: String, nullOrder: String)

/** A named sort order (Iceberg spec): order 0 is the unsorted order. */
final case class IceSortOrder(orderId: Int, fields: Seq[SortField])

final case class TableMetadata(
    formatVersion: Int,
    tableUuid: String,
    location: String,
    lastUpdatedMs: Long,
    currentSchemaId: Int,
    schemas: Seq[IceSchema],
    defaultSpecId: Int,
    partitionSpecs: Seq[PartitionSpec],
    properties: Map[String, String],
    currentSnapshotId: Option[Long],
    snapshots: Seq[Snapshot],
    refs: Map[String, SnapshotRef] = Map.empty,
    sortOrders: Seq[IceSortOrder] = Seq.empty,
    defaultSortOrderId: Int = 0) {

  def currentSchema: IceSchema = schemas.find(_.schemaId == currentSchemaId).get
  def currentSpec: PartitionSpec = partitionSpecs.find(_.specId == defaultSpecId).get
  def snapshot(id: Long): Option[Snapshot] = snapshots.find(_.snapshotId == id)
  def currentSnapshot: Option[Snapshot] = currentSnapshotId.flatMap(snapshot)
  /** The active sort order, if a sorted one is the default. */
  def defaultSortOrder: Option[IceSortOrder] =
    sortOrders.find(o => o.orderId == defaultSortOrderId && o.fields.nonEmpty)
}

object IcebergMeta {
  private val mapper = new ObjectMapper()

  /** Compact recursive rendering of an Iceberg type node: primitive type
    * nodes are plain text; struct/list/map nodes render as
    * `struct<name: t, ...>` / `list<t>` / `map<k, v>` (the reference
    * recurses the same way when drawing the schema tree,
    * `formatters.py:127-139`). */
  def renderType(t: JsonNode): String =
    if (t.isTextual) t.asText()
    else t.path("type").asText() match {
      case "struct" =>
        t.path("fields").elements().asScala.map { f =>
          s"${f.path("name").asText()}: ${renderType(f.path("type"))}"
        }.mkString("struct<", ", ", ">")
      case "list" => s"list<${renderType(t.path("element"))}>"
      case "map" => s"map<${renderType(t.path("key"))}, ${renderType(t.path("value"))}>"
      case other => other
    }

  /** One struct field node → its SchemaField plus flattened nested
    * children (struct members, list elements, map keys/values), each with
    * a dotted path and its own stable field id. */
  private def flattenField(f: JsonNode, prefix: String): Seq[SchemaField] = {
    val name = f.path("name").asText()
    val path = if (prefix.isEmpty) name else s"$prefix.$name"
    val t = f.path("type")
    SchemaField(f.path("id").asInt(), name, f.path("required").asBoolean(),
      renderType(t), path,
      // only non-primitive nodes need the raw JSON preserved — a primitive
      // renders identically from fieldType, and leaving it empty keeps
      // programmatically-built flat SchemaFields equal to parsed ones
      if (t.isTextual) "" else t.toString) +: flattenType(t, path)
  }

  /** Nested children of a type node as flattened SchemaFields. */
  private def flattenType(t: JsonNode, path: String): Seq[SchemaField] =
    if (t.isTextual) Seq.empty
    else t.path("type").asText() match {
      case "struct" =>
        t.path("fields").elements().asScala.toSeq.flatMap(flattenField(_, path))
      case "list" =>
        val el = t.path("element")
        SchemaField(t.path("element-id").asInt(), "element",
          t.path("element-required").asBoolean(), renderType(el),
          s"$path.element") +: flattenType(el, s"$path.element")
      case "map" =>
        val k = t.path("key"); val v = t.path("value")
        Seq(
          SchemaField(t.path("key-id").asInt(), "key", required = true,
            renderType(k), s"$path.key"),
          SchemaField(t.path("value-id").asInt(), "value",
            t.path("value-required").asBoolean(), renderType(v), s"$path.value")) ++
          flattenType(k, s"$path.key") ++ flattenType(v, s"$path.value")
      case _ => Seq.empty
    }

  def parse(json: String): TableMetadata = {
    val n = mapper.readTree(json)
    def strMap(node: JsonNode): Map[String, String] =
      if (node == null || node.isMissingNode) Map.empty
      else node.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap

    def parseSchema(s: JsonNode, defaultId: Int): IceSchema =
      IceSchema(
        if (s.has("schema-id")) s.path("schema-id").asInt() else defaultId,
        s.path("fields").elements().asScala.toSeq.flatMap(flattenField(_, "")))

    // v2 carries a `schemas` list; v1 carries one singular `schema`
    val schemas =
      if (n.has("schemas")) n.path("schemas").elements().asScala.zipWithIndex
        .map { case (s, i) => parseSchema(s, i) }.toSeq
      else Seq(parseSchema(n.path("schema"), 0))

    def parseSpecFields(fields: JsonNode): Seq[SpecField] =
      fields.elements().asScala.map { f =>
        SpecField(
          f.path("name").asText(), f.path("transform").asText(),
          f.path("source-id").asInt(), f.path("field-id").asInt())
      }.toSeq

    // v2 carries `partition-specs`; v1 carries a bare `partition-spec`
    // field array (spec id 0 by definition)
    val specs =
      if (n.has("partition-specs"))
        n.path("partition-specs").elements().asScala.map { s =>
          PartitionSpec(s.path("spec-id").asInt(), parseSpecFields(s.path("fields")))
        }.toSeq
      else Seq(PartitionSpec(0, parseSpecFields(n.path("partition-spec"))))

    val snaps = n.path("snapshots").elements().asScala.map { s =>
      Snapshot(
        s.path("snapshot-id").asLong(),
        Option(s.get("parent-snapshot-id")).filterNot(_.isNull).map(_.asLong()),
        s.path("timestamp-ms").asLong(),
        s.path("summary").path("operation").asText("append"),
        strMap(s.path("summary")),
        s.path("manifest-list").asText(),
        s.path("sequence-number").asLong(0L),
        Option(s.get("schema-id")).filterNot(_.isNull).map(_.asInt()))
    }.toSeq

    TableMetadata(
      n.path("format-version").asInt(),
      n.path("table-uuid").asText(),
      n.path("location").asText(),
      n.path("last-updated-ms").asLong(),
      // v1 has no current-schema-id: the singular schema is current
      if (n.has("current-schema-id")) n.path("current-schema-id").asInt()
      else schemas.head.schemaId,
      schemas,
      n.path("default-spec-id").asInt(),
      specs,
      strMap(n.path("properties")),
      Option(n.get("current-snapshot-id")).filterNot(_.isNull).map(_.asLong()),
      snaps,
      // `refs` (optional; Iceberg spec): name → {snapshot-id, type}
      if (!n.has("refs")) Map.empty
      else n.path("refs").properties().asScala.map { e =>
        e.getKey -> SnapshotRef(
          e.getValue.path("snapshot-id").asLong(),
          e.getValue.path("type").asText("tag"))
      }.toMap,
      // `sort-orders` (optional): order 0 with no fields = unsorted
      n.path("sort-orders").elements().asScala.map { o =>
        IceSortOrder(
          o.path("order-id").asInt(),
          o.path("fields").elements().asScala.map { f =>
            SortField(
              f.path("source-id").asInt(),
              f.path("transform").asText("identity"),
              f.path("direction").asText("asc"),
              f.path("null-order").asText("nulls-first"))
          }.toSeq)
      }.toSeq,
      n.path("default-sort-order-id").asInt(0))
  }

  def render(md: TableMetadata): String = {
    val root = mapper.createObjectNode()
    root.put("format-version", md.formatVersion)
    root.put("table-uuid", md.tableUuid)
    root.put("location", md.location)
    root.put("last-updated-ms", md.lastUpdatedMs)
    root.put("current-schema-id", md.currentSchemaId)
    val schemasArr = root.putArray("schemas")
    md.schemas.foreach { s =>
      val sn = schemasArr.addObject()
      sn.put("type", "struct")
      sn.put("schema-id", s.schemaId)
      val fa = sn.putArray("fields")
      // top-level fields only: flattened nested children (dotted paths)
      // are a parse-side view, not part of the document shape
      s.fields.filter(f => !f.path.contains('.')).foreach { f =>
        val fn = fa.addObject()
        fn.put("id", f.id); fn.put("name", f.name)
        fn.put("required", f.required)
        // structured type node when the parse preserved one; for flat
        // programmatic fields the display string IS the primitive type
        if (f.typeJson.nonEmpty) fn.set[JsonNode]("type", mapper.readTree(f.typeJson))
        else fn.put("type", f.fieldType)
      }
    }
    root.put("default-spec-id", md.defaultSpecId)
    val specArr = root.putArray("partition-specs")
    md.partitionSpecs.foreach { s =>
      val sn = specArr.addObject()
      sn.put("spec-id", s.specId)
      val fa = sn.putArray("fields")
      s.fields.foreach { f =>
        val fn = fa.addObject()
        fn.put("name", f.name); fn.put("transform", f.transform)
        fn.put("source-id", f.sourceId); fn.put("field-id", f.fieldId)
      }
    }
    if (md.sortOrders.nonEmpty) {
      root.put("default-sort-order-id", md.defaultSortOrderId)
      val soArr = root.putArray("sort-orders")
      md.sortOrders.foreach { o =>
        val on = soArr.addObject()
        on.put("order-id", o.orderId)
        val fa = on.putArray("fields")
        o.fields.foreach { f =>
          val fn = fa.addObject()
          fn.put("transform", f.transform)
          fn.put("source-id", f.sourceId)
          fn.put("direction", f.direction)
          fn.put("null-order", f.nullOrder)
        }
      }
    }
    val props = root.putObject("properties")
    md.properties.toSeq.sortBy(_._1).foreach { case (k, v) => props.put(k, v) }
    md.currentSnapshotId.foreach(root.put("current-snapshot-id", _))
    if (md.refs.nonEmpty) {
      val refsNode = root.putObject("refs")
      md.refs.toSeq.sortBy(_._1).foreach { case (name, r) =>
        val rn = refsNode.putObject(name)
        rn.put("snapshot-id", r.snapshotId)
        rn.put("type", r.refType)
      }
    }
    val snapArr = root.putArray("snapshots")
    md.snapshots.foreach { s =>
      val sn = snapArr.addObject()
      sn.put("snapshot-id", s.snapshotId)
      s.parentSnapshotId.foreach(sn.put("parent-snapshot-id", _))
      sn.put("timestamp-ms", s.timestampMs)
      if (s.sequenceNumber != 0L) sn.put("sequence-number", s.sequenceNumber)
      s.schemaId.foreach(sn.put("schema-id", _))
      val sum = sn.putObject("summary")
      sum.put("operation", s.operation)
      s.summary.filterNot(_._1 == "operation").toSeq.sortBy(_._1)
        .foreach { case (k, v) => sum.put(k, v) }
      sn.put("manifest-list", s.manifestList)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Resolve the latest metadata file in `<tableDir>/metadata/`
    * (highest v<N>.metadata.json).
    *
    * Fast path (round 18): `version-hint.text` (the Iceberg
    * HadoopTableOperations convention, written best-effort by
    * [[publish]]) names a version to START from; versions advance by
    * exactly one through the link CAS, so probing FORWARD from the hint
    * until the first missing file finds the true latest without listing
    * the directory — on a streaming table whose metadata dir holds tens
    * of thousands of snap/manifest Avro files, every load used to pay
    * that listing. The hint is ADVISORY only: stale, regressed, torn or
    * absent hints degrade to extra probes or the full listing, never to
    * serving a stale version. */
  def latestMetadataPath(tableDir: String): Path = {
    val metaDir = Paths.get(tableDir, "metadata")
    def at(v: Int) = metaDir.resolve(s"v$v.metadata.json")
    val hinted = readVersionHint(metaDir).filter(h => Files.exists(at(h)))
    hinted match {
      case Some(h) =>
        var v = h
        while (Files.exists(at(v + 1))) v += 1
        at(v)
      case None =>
        val versions = scala.util.Using.resource(Files.list(metaDir)) { s =>
          s.iterator().asScala
            .filter(_.getFileName.toString.matches("v\\d+\\.metadata\\.json"))
            .toSeq
        }
        require(versions.nonEmpty, s"no metadata files under $metaDir")
        versions.maxBy(p => p.getFileName.toString.stripPrefix("v")
          .stripSuffix(".metadata.json").toInt)
    }
  }

  private def readVersionHint(metaDir: Path): Option[Int] = {
    val hint = metaDir.resolve("version-hint.text")
    if (!Files.exists(hint)) None
    else scala.util.Try(Files.readString(hint).trim.toInt).toOption
      .filter(_ >= 1)
  }

  /** Retry a resolve-then-read body when the resolved file VANISHED in
    * between: a concurrent committer's metadata retention
    * ([[afterPublish]]) may unlink an old version right after a slow
    * reader resolved it as latest — re-resolving finds the newer
    * version, so the race costs a retry, never a failure. Bounded: any
    * steady-state miss (a truly absent table) surfaces the original
    * error. */
  private def withRetiredRetry[A](body: => A): A = {
    var attempts = 5
    while (true) {
      try return body
      catch {
        case e: java.nio.file.NoSuchFileException =>
          attempts -= 1
          if (attempts <= 0) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  def load(tableDir: String): TableMetadata = loadVersioned(tableDir)._1

  /** Load a SPECIFIC metadata version file (a retired tombstone — zero
    * bytes — fails the parse loudly; only LATEST resolution retries). */
  def loadAt(path: Path): TableMetadata =
    parse(new String(Files.readAllBytes(path), StandardCharsets.UTF_8))

  /** Load the latest metadata TOGETHER with its version number from ONE
    * directory listing. Commit paths must base their CAS publish on this
    * consistent (content, version) pair: reading the content and the
    * version in two separate listings lets a concurrent commit land in
    * between, and a publish at the NEWER version + the STALE content
    * silently drops the racer's snapshot (no CAS conflict fires, because
    * the skipped version file itself is never contended). */
  def loadVersioned(tableDir: String): (TableMetadata, Int) = withRetiredRetry {
    val p = latestMetadataPath(tableDir)
    val bytes = Files.readAllBytes(p)
    if (bytes.isEmpty) // retired to a tombstone between resolve and read
      throw new java.nio.file.NoSuchFileException(s"$p (retired)")
    (parse(new String(bytes, StandardCharsets.UTF_8)),
      p.getFileName.toString
        .stripPrefix("v").stripSuffix(".metadata.json").toInt)
  }

  /** PUBLISH the next metadata version with compare-and-swap semantics:
    * the content is written to a temp file and hard-LINKED to `target` —
    * `link(2)` both is atomic for readers (no torn document) AND fails
    * with EEXIST if another writer already claimed the version, unlike
    * `rename(2)` which silently replaces. Optimistic concurrency, the
    * way an Iceberg catalog's commit CAS behaves: the losing writer of a
    * race gets [[CommitConflictException]] (reload + retry), never a
    * clobbered or lost commit. */
  def publish(target: Path, content: String): Unit = {
    // per-attempt temp name: two racing writers must not share a staging
    // file, or the loser could clobber the winner's content pre-link
    val tmp = target.resolveSibling(
      s"${target.getFileName}.${java.util.UUID.randomUUID()}.tmp")
    Files.writeString(tmp, content)
    try Files.createLink(target, tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new CommitConflictException(
          s"metadata version ${target.getFileName} was committed by a " +
            "concurrent writer; reload the table and retry")
    } finally Files.deleteIfExists(tmp)
    afterPublish(target, content)
  }

  /** `"graft.metadata.previous-versions-max" : "N"` in the committed
    * metadata (Iceberg `write.metadata.previous-versions-max` +
    * delete-after-commit analog) — scanned with a regex so publish need
    * not re-parse its own document. */
  private val PrevVersionsMaxRe =
    """"graft\.metadata\.previous-versions-max"\s*:\s*"(\d+)"""".r

  /** Post-CAS housekeeping, both best-effort (a failure here never fails
    * the commit — the linked version file IS the commit):
    *  - advisory `version-hint.text` so readers resolve the latest
    *    version without listing the metadata directory (atomic replace;
    *    racing writers may land a LOWER hint, which only costs forward
    *    probes);
    *  - metadata-log retention when the table opts in: versions at or
    *    below N-keep are TRUNCATED to zero-byte tombstones, walking
    *    backward until the first already-retired version (amortized one
    *    truncation per commit; the first commit after enabling the
    *    property clears the backlog). Tombstone, NOT unlink, for two
    *    load-bearing reasons: the hint's forward probe relies on version
    *    files being contiguous (a deletion GAP under a regressed hint
    *    would resolve a stale latest silently), and [[publish]]'s link
    *    CAS relies on claimed version numbers STAYING claimed — an
    *    unlinked version could be re-created by a writer holding a
    *    stale base, silently forking history. The bytes are the
    *    retention win; the dirent is the safety ledger. Old version
    *    files are only metadata-log history — snapshots, time travel
    *    and rollback all live in the CURRENT document. */
  private def afterPublish(target: Path, content: String): Unit = {
    val name = target.getFileName.toString
    if (!name.matches("v\\d+\\.metadata\\.json")) return
    val version = name.stripPrefix("v").stripSuffix(".metadata.json").toInt
    val metaDir = target.getParent
    val tmp = metaDir.resolve(
      s"version-hint.${java.util.UUID.randomUUID()}.tmp")
    try {
      Files.writeString(tmp, version.toString)
      Files.move(tmp, metaDir.resolve("version-hint.text"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } catch { case _: Exception => () }
    finally { try Files.deleteIfExists(tmp) catch { case _: Exception => () } }
    try {
      PrevVersionsMaxRe.findFirstMatchIn(content).foreach { m =>
        val keep = math.max(1, m.group(1).toInt)
        var v = version - keep
        var continue = true
        while (v >= 1 && continue) {
          val p = metaDir.resolve(s"v$v.metadata.json")
          if (Files.exists(p) && Files.size(p) > 0) {
            Files.write(p, Array.emptyByteArray)
            v -= 1
          } else continue = false
        }
      }
    } catch { case _: Exception => () }
  }

  /** The TRI-STATE snapshot pin shared by CAS-conditional commits
    * ([[graft.meta.TableWriter.commitFiles]], `SchemaEvolution
    * .setProperties`): `expected = Some(id)` requires the table still
    * sits at `id`; `expectNone = true` requires it is STILL
    * snapshot-less (the leg None-means-no-check cannot express — a
    * caller whose decision derives from an EMPTY table state must fail
    * loudly if a first write landed in between). */
  def requireSnapshotPin(
      md: TableMetadata,
      expected: Option[Long],
      expectNone: Boolean): Unit = {
    expected.foreach { exp =>
      if (!md.currentSnapshotId.contains(exp))
        throw new CommitConflictException(
          s"expected current snapshot $exp but table moved to " +
            s"${md.currentSnapshotId.getOrElse("<none>")} — " +
            "revalidate and retry")
    }
    if (expectNone && md.currentSnapshotId.nonEmpty)
      throw new CommitConflictException(
        s"expected no current snapshot but table moved to " +
          s"${md.currentSnapshotId.get} — revalidate and retry")
  }
}

/** A concurrent writer claimed the metadata version first (optimistic-
  * concurrency loss). The commit made no changes; reload and retry. */
final class CommitConflictException(msg: String)
  extends RuntimeException(msg)
