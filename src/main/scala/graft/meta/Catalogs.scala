package graft.meta

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** Catalog SPI — the pluggable backend boundary the reference gets from
  * pyiceberg's catalog registry (`catalog.py:99-142`: rest / sql / glue /
  * hive / filesystem). This engine ships the filesystem implementation;
  * network-backed catalogs (REST, JDBC, Glue, Hive) plug in behind the
  * same four methods but cannot be built or tested in this offline
  * environment, so [[Catalogs.forConfig]] maps them to the friendly error
  * taxonomy instead of silently falling back.
  */
trait MetaCatalog {
  def name: String
  def listNamespaces(): Seq[String]
  /** (namespace, table) pairs, sorted. */
  def listTables(): Seq[(String, String)]
  /** Load a table by `<namespace>.<table>` ref. */
  def loadTable(ref: String): IcebergTable
  /** Root directory/URI of a table (for path-based consumers). */
  def tableLocation(ref: String): String
}

/** Catalogs that address tables through a MUTABLE METADATA POINTER (a
  * JDBC `iceberg_tables` row, a REST server's table record) rather than
  * the filesystem's own version listing. The engine's commits are
  * path-addressed and CAS-ordered by the version-file link
  * ([[IcebergMeta.publish]]); after every commit the engine MIRRORS the
  * new version into the pointer ([[PointerSync.sync]]) so other clients
  * of the same catalog see the new state — without this, a table
  * written through the engine serves stale metadata to every other
  * catalog client (the reference's whole load path goes through the
  * catalog pointer, ref `catalog.py:145-161`). */
trait PointerCatalog { self: MetaCatalog =>
  /** Current metadata location for `ref`; None when unregistered (or
    * registered with a NULL location — an in-flight foreign commit). */
  def metadataPointer(ref: String): Option[String]

  /** Compare-and-swap the pointer from `expected` to `next`
    * (`expected = None` registers a new ref). Throws
    * [[CommitConflictException]] when the stored value is not
    * `expected` — the optimistic-concurrency analog of
    * [[IcebergMeta.publish]]'s version-file link. */
  def casPointer(ref: String, expected: Option[String], next: String): Unit

  /** Directory a NEW table created through the engine should live in
    * (pointer catalogs have no path convention of their own — this is
    * the warehouse-property convention, pyiceberg `SqlCatalog` style). */
  def createLocation(ref: String): String

  /** Remove `ref`'s pointer (registration-failure cleanup: a pointer
    * must not dangle at a deleted table directory). Idempotent. */
  def dropPointer(ref: String): Unit
}

/** Mirror a path-addressed commit into a pointer catalog. The PATH is
  * the engine's source of truth (every writer CAS-orders on the version
  * file); the pointer is a downstream mirror for OTHER catalog clients,
  * advanced monotonically:
  *
  *  - pointer already at (or past) the committed version in the same
  *    lineage → no-op (a later commit's sync subsumed ours);
  *  - CAS loss against another engine writer mirroring an OLDER version
  *    → retry from the fresh pointer;
  *  - pointer moved OUTSIDE the table's version lineage (a foreign
  *    writer committed through the catalog) → loud
  *    [[CommitConflictException]], never a silent overwrite.
  *
  * A crash between the path publish and the mirror leaves the pointer
  * one version behind; the next successful sync (any verb) self-heals
  * it forward. */
object PointerSync {

  private val VersionRe = """^(.*)/metadata/v(\d+)\.metadata\.json$""".r

  /** (table dir, version) of a metadata location in THIS engine's
    * naming, scheme-normalized; None for foreign shapes. */
  private[meta] def lineageOf(location: String): Option[(String, Int)] =
    normalize(location) match {
      case VersionRe(dir, v) => Some((dir, v.toInt))
      case _ => None
    }

  private def normalize(location: String): String =
    try MetadataLocations.localPath(location, "pointer").toString
    catch { case _: IllegalStateException => location }

  def sync(catalog: MetaCatalog, ref: String, tableDir: String): Unit =
    catalog match {
      case pc: PointerCatalog =>
        val next = IcebergMeta.latestMetadataPath(tableDir).toString
        val nextLin = lineageOf(next)
        var expected = pc.metadataPointer(ref)
        var attempts = 0
        while (true) {
          // a pointer OUTSIDE the table's version lineage is owned by a
          // foreign writer: never clobber it. NOT a conflict exception —
          // the path commit already landed, and "reload and retry" would
          // replay it; the caller must reconcile the catalog instead.
          expected.filter(c => lineageOf(c) match {
            case Some((dir, _)) => !nextLin.exists(_._1 == dir)
            case None => true
          }).foreach(c => throw new IllegalStateException(
            s"the commit to $ref landed path-addressed at $next, but the " +
            s"catalog pointer was NOT advanced: it points at foreign " +
            s"metadata $c (a non-engine writer committed through the " +
            "catalog) — reconcile the catalog before further engine writes"))
          val subsumed = (expected.flatMap(lineageOf), nextLin) match {
            case (Some((ed, ev)), Some((nd, nv))) => ed == nd && ev >= nv
            case _ => false
          }
          if (expected.contains(next) || subsumed) return
          try { pc.casPointer(ref, expected, next); return }
          catch {
            case e: CommitConflictException =>
              attempts += 1
              if (attempts > 5) throw e
              val cur = pc.metadataPointer(ref)
              // the pointer did not move yet the CAS refused: the
              // backend disagrees in a way retrying cannot settle
              if (cur == expected) throw e
              expected = cur
          }
        }
      case _ => ()
    }
}

/** Shared helper for metadata-location catalogs (REST fallback, JDBC,
  * Glue, Hive): production tables in those catalogs commonly point
  * `metadata_location` at s3:// / hdfs:// / gs:// URIs, which this
  * engine's local reader cannot open — surface that as a clear typed
  * error instead of `Paths.get`'s opaque InvalidPathException. */
private[meta] object MetadataLocations {
  // A scheme prefix with ANY number of slashes after the colon: Hadoop
  // Path and java.io.File.toURI emit the single-slash form
  // (`file:/tmp/x`), RFC-style writers the double-slash form — both must
  // resolve (or error) the same way, never fall through to Paths.get as
  // a relative literal.
  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*):(/*)(.*)$".r

  /** `location` as a local filesystem path, or a descriptive error when
    * it carries a non-file URI scheme (schemes compare case-insensitively
    * per RFC 3986 — foreign writers do emit File://). `backend` names
    * the catalog in the message (e.g. "glue"). */
  def localPath(location: String, backend: String): java.nio.file.Path =
    location match {
      case SchemeRe(scheme, slashes, rest) if scheme.equalsIgnoreCase("file") =>
        if (slashes.length == 2 && rest.nonEmpty) {
          // exactly two slashes = authority form (`file://host/p`): only
          // an empty/localhost authority is this machine
          val authority = rest.takeWhile(_ != '/')
          if (authority.nonEmpty && !authority.equalsIgnoreCase("localhost"))
            throw new IllegalStateException(
              s"$backend catalog points table metadata at '$location' — " +
                s"file URIs with a remote authority ($authority) are " +
                "unsupported; only local filesystem paths are readable")
          Paths.get(rest.dropWhile(_ != '/') match {
            case "" => "/"
            case p => p
          })
        } else if (slashes.isEmpty) Paths.get(rest) // rare relative form
        // 1 slash (Hadoop Path / File.toURI) or 3+ (`file:///p`): an
        // absolute local path with no authority
        else Paths.get("/" + rest)
      case SchemeRe(scheme, _, _) => throw new IllegalStateException(
        s"$backend catalog points table metadata at '$location' — " +
          s"remote object-store locations ($scheme://) are unsupported by " +
          "this engine; only local filesystem paths are readable")
      case _ => Paths.get(location)
    }
}

/** Filesystem warehouse catalog: `<warehouse>/<namespace>/<table>/metadata`
  * (ref `catalog.py:164-189` namespace walk). */
final class FsCatalog(warehouseDir: String) extends MetaCatalog {
  override def name: String = s"fs:$warehouseDir"

  private def subdirs(p: java.nio.file.Path): Seq[java.nio.file.Path] =
    if (!Files.isDirectory(p)) Seq.empty
    else scala.util.Using.resource(Files.list(p)) { s =>
      s.iterator().asScala.filter(Files.isDirectory(_))
        .toSeq.sortBy(_.getFileName.toString)
    }

  override def listNamespaces(): Seq[String] =
    subdirs(Paths.get(warehouseDir)).map(_.getFileName.toString)

  override def listTables(): Seq[(String, String)] =
    subdirs(Paths.get(warehouseDir)).flatMap { ns =>
      subdirs(ns).filter(t => Files.isDirectory(t.resolve("metadata")))
        .map(t => ns.getFileName.toString -> t.getFileName.toString)
    }

  override def tableLocation(ref: String): String = {
    val parts = ref.split("\\.", 2)
    require(parts.length == 2, s"table ref must be <namespace>.<table>: $ref")
    s"$warehouseDir/${parts(0)}/${parts(1)}"
  }

  override def loadTable(ref: String): IcebergTable =
    IcebergTable.load(tableLocation(ref))
}

/** Iceberg REST catalog client (the public REST Catalog OpenAPI surface
  * pyiceberg's `RestCatalog` speaks; ref `catalog.py:99-142` routes
  * `type: rest` / `uri: http…` configs there). JDK `HttpURLConnection`
  * only — no extra dependencies — and the existing [[IcebergMeta]] Jackson
  * parser for the returned metadata.
  *
  * Protocol subset: `GET /v1/config` (honoring the server's `prefix`
  * override, merged defaults < client props < overrides),
  * `GET /v1/{prefix}/namespaces`, `…/namespaces/{ns}/tables`, and
  * `…/namespaces/{ns}/tables/{t}` (LoadTableResult: inline `metadata`
  * preferred, `metadata-location` fallback read as a local path). A
  * `token` property is sent as a `Bearer` header on every request.
  */
final class RestCatalog(
    baseUri: String,
    clientProps: Map[String, String] = Map.empty)
    extends MetaCatalog with PointerCatalog {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val root = baseUri.stripSuffix("/")

  private def get(path: String): com.fasterxml.jackson.databind.JsonNode = {
    val url = java.net.URI.create(s"$root$path").toURL
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod("GET")
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      conn.setRequestProperty("Accept", "application/json")
      clientProps.get("token").foreach(t =>
        conn.setRequestProperty("Authorization", s"Bearer $t"))
      val code = conn.getResponseCode
      if (code != 200) throw new IllegalStateException(
        s"REST catalog GET $path returned HTTP $code")
      val body = scala.util.Using.resource(conn.getInputStream) { in =>
        new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      }
      mapper.readTree(body)
    } catch {
      case e: java.io.IOException => throw new IllegalStateException(
        s"REST catalog at $root unreachable (GET $path): ${e.getMessage}", e)
    } finally conn.disconnect()
  }

  /** Effective config: server defaults < client properties < server
    * overrides (the REST spec's merge order). Fetched once, lazily. */
  lazy val config: Map[String, String] = {
    val node = get("/v1/config")
    def toMap(n: com.fasterxml.jackson.databind.JsonNode): Map[String, String] =
      if (n == null || !n.isObject) Map.empty
      else n.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    toMap(node.get("defaults")) ++ clientProps ++ toMap(node.get("overrides"))
  }

  private def prefixed(path: String): String = {
    val p = config.get("prefix").filter(_.nonEmpty)
      .map(pre => s"/${enc(pre)}").getOrElse("")
    s"/v1$p$path"
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  /** URL form of a (possibly nested) namespace ref: levels split on '.'
    * (the client-side ref syntax) and joined with the percent-encoded
    * 0x1F UNIT SEPARATOR the REST spec prescribes — joining with a
    * literal '.' would make the server see one single-level namespace
    * named "a.b" and 404 every nested-namespace table. */
  private def nsPath(ns: String): String =
    ns.split("\\.").map(enc).mkString("%1F")

  override def name: String = s"rest:$root"

  /** ALL namespaces, nested included: the spec's list endpoint returns
    * only one level, so each result recurses as `parent=` until the tree
    * bottoms out (pyiceberg's list_all_tables walks the same way).
    * Children must be PROPER extensions of their parent (the spec returns
    * full level arrays) — anything else is dropped, which both rejects
    * malformed responses and guarantees termination against a server
    * that ignores the parent param and echoes its top level. */
  override def listNamespaces(): Seq[String] = {
    def children(parent: Option[String]): Seq[String] = {
      val q = parent.map(p => s"?parent=${nsPath(p)}").getOrElse("")
      val arr = get(prefixed(s"/namespaces$q")).get("namespaces")
      val listed = (0 until arr.size()).map { i =>
        val levels = arr.get(i)
        (0 until levels.size()).map(levels.get(_).asText()).mkString(".")
      }
      val here = parent match {
        case None => listed
        case Some(p) => listed.filter(ns => ns.startsWith(p + ".") && ns != p)
      }
      here ++ here.flatMap(ns => children(Some(ns)))
    }
    children(None).distinct.sorted
  }

  override def listTables(): Seq[(String, String)] =
    listNamespaces().flatMap { ns =>
      val arr = get(prefixed(s"/namespaces/${nsPath(ns)}/tables")).get("identifiers")
      (0 until arr.size()).map(i => ns -> arr.get(i).get("name").asText())
    }.sorted

  override def loadTable(ref: String): IcebergTable = {
    // the LAST dot separates table from (possibly nested) namespace —
    // splitting on the first would read "a.b.t" as table "b.t" in "a".
    // Consequence (same contract as pyiceberg string identifiers, which
    // the reference delegates to): a table whose NAME itself contains a
    // dot is not expressible in dotted-ref form — the trailing segment
    // is always the table.
    val cut = ref.lastIndexOf('.')
    require(cut > 0 && cut < ref.length - 1,
      s"table ref must be <namespace>.<table>: $ref")
    val parts = Array(ref.substring(0, cut), ref.substring(cut + 1))
    val res = get(prefixed(s"/namespaces/${nsPath(parts(0))}/tables/${enc(parts(1))}"))
    val md =
      if (res.has("metadata") && res.get("metadata").isObject)
        IcebergMeta.parse(res.get("metadata").toString)
      else {
        val loc = Option(res.get("metadata-location")).map(_.asText()).getOrElse(
          throw new IllegalStateException(
            s"LoadTableResult for $ref has neither metadata nor metadata-location"))
        IcebergMeta.loadAt(MetadataLocations.localPath(loc, "rest"))
      }
    // relative manifest/data paths resolve against the table location the
    // metadata itself declares (REST tables are location-addressed; there
    // is no catalog-side directory convention to fall back on)
    new IcebergTable(md.location, md)
  }

  override def tableLocation(ref: String): String = loadTable(ref).metadata.location

  // ---- commit path (the REST spec's `POST …/tables/{t}` endpoint:
  // CommitTableRequest = requirements + updates; the server validates
  // the requirements against its current state and 409s a loser) ----

  private def refSplit(ref: String): (String, String) = {
    val cut = ref.lastIndexOf('.')
    require(cut > 0 && cut < ref.length - 1,
      s"table ref must be <namespace>.<table>: $ref")
    (ref.substring(0, cut), ref.substring(cut + 1))
  }

  /** GET returning None on 404 (the unregistered-table probe). */
  private def getOpt(path: String): Option[com.fasterxml.jackson.databind.JsonNode] = {
    val url = java.net.URI.create(s"$root$path").toURL
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod("GET")
      conn.setConnectTimeout(10000); conn.setReadTimeout(30000)
      conn.setRequestProperty("Accept", "application/json")
      clientProps.get("token").foreach(t =>
        conn.setRequestProperty("Authorization", s"Bearer $t"))
      conn.getResponseCode match {
        case 200 =>
          val body = scala.util.Using.resource(conn.getInputStream)(in =>
            new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
          Some(mapper.readTree(body))
        case 404 => None
        case code => throw new IllegalStateException(
          s"REST catalog GET $path returned HTTP $code")
      }
    } catch {
      case e: java.io.IOException => throw new IllegalStateException(
        s"REST catalog at $root unreachable (GET $path): ${e.getMessage}", e)
    } finally conn.disconnect()
  }

  override def metadataPointer(ref: String): Option[String] = {
    val (ns, t) = refSplit(ref)
    getOpt(prefixed(s"/namespaces/${nsPath(ns)}/tables/${enc(t)}"))
      .flatMap(res => Option(res.get("metadata-location")).map(_.asText()))
  }

  override def createLocation(ref: String): String = {
    val (ns, t) = refSplit(ref)
    val wh = config.get("warehouse").filter(_.nonEmpty).getOrElse(
      throw new IllegalArgumentException(
        s"creating $ref through the rest catalog needs a 'warehouse' " +
          "path in the catalog config"))
    s"${wh.stripSuffix("/")}/$ns/$t"
  }

  /** Commit through the spec's table endpoint: requirements assert the
    * state the commit was based on (`assert-create` /
    * `assert-table-uuid` + `assert-ref-snapshot-id` on `main`), updates
    * carry the METADATA DIFF from `expected` to `next` in the public
    * TableUpdate vocabulary (add-schema / set-current-schema, add-spec
    * / set-default-spec, add-snapshot / remove-snapshots,
    * set-snapshot-ref / remove-snapshot-ref, set-/remove-properties,
    * set-location, assign-uuid, upgrade-format-version). HTTP 409 maps
    * to [[CommitConflictException]] — the same reload-and-retry
    * contract as the path CAS. */
  override def casPointer(
      ref: String, expected: Option[String], next: String): Unit = {
    val (ns, t) = refSplit(ref)
    val body = commitRequestBody(ns, t, expected, next)
    val url = java.net.URI.create(
      s"$root${prefixed(s"/namespaces/${nsPath(ns)}/tables/${enc(t)}")}").toURL
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(10000); conn.setReadTimeout(30000)
      conn.setRequestProperty("Accept", "application/json")
      conn.setRequestProperty("Content-Type", "application/json")
      clientProps.get("token").foreach(tok =>
        conn.setRequestProperty("Authorization", s"Bearer $tok"))
      conn.setDoOutput(true)
      scala.util.Using.resource(conn.getOutputStream)(os =>
        os.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      conn.getResponseCode match {
        case 200 => ()
        case 409 => throw new CommitConflictException(
          s"REST catalog rejected the commit for $ref (HTTP 409): the " +
            "table state moved; reload and retry")
        case code => throw new IllegalStateException(
          s"REST catalog commit for $ref returned HTTP $code")
      }
    } catch {
      case e: java.io.IOException => throw new IllegalStateException(
        s"REST catalog at $root unreachable (POST commit $ref): ${e.getMessage}", e)
    } finally conn.disconnect()
  }

  /** The spec's `DELETE …/tables/{t}` — 404 (already gone) is fine. */
  override def dropPointer(ref: String): Unit = {
    val (ns, t) = refSplit(ref)
    val url = java.net.URI.create(
      s"$root${prefixed(s"/namespaces/${nsPath(ns)}/tables/${enc(t)}")}").toURL
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod("DELETE")
      conn.setConnectTimeout(10000); conn.setReadTimeout(30000)
      clientProps.get("token").foreach(tok =>
        conn.setRequestProperty("Authorization", s"Bearer $tok"))
      conn.getResponseCode match {
        case 200 | 202 | 204 | 404 => ()
        case code => throw new IllegalStateException(
          s"REST catalog DELETE for $ref returned HTTP $code")
      }
    } catch {
      case e: java.io.IOException => throw new IllegalStateException(
        s"REST catalog at $root unreachable (DELETE $ref): ${e.getMessage}", e)
    } finally conn.disconnect()
  }

  /** CommitTableRequest JSON: requirements from the EXPECTED metadata,
    * updates from a field-level diff of the two metadata documents
    * (both local — the engine just published `next` path-addressed). */
  private def commitRequestBody(
      ns: String, table: String,
      expected: Option[String], next: String): String = {
    import com.fasterxml.jackson.databind.JsonNode
    import com.fasterxml.jackson.databind.node.ObjectNode
    import scala.jdk.CollectionConverters._
    def readLocal(loc: String): JsonNode = mapper.readTree(
      Files.readString(MetadataLocations.localPath(loc, "rest")))
    val newJ = readLocal(next)
    val oldJ = expected.map(readLocal)

    val req = mapper.createObjectNode()
    val ident = req.putObject("identifier")
    val nsArr = ident.putArray("namespace")
    ns.split("\\.").foreach(nsArr.add)
    ident.put("name", table)

    val reqs = req.putArray("requirements")
    oldJ match {
      case None =>
        reqs.addObject().put("type", "assert-create")
        ()
      case Some(o) =>
        reqs.addObject().put("type", "assert-table-uuid")
          .put("uuid", o.get("table-uuid").asText())
        val r = reqs.addObject()
        r.put("type", "assert-ref-snapshot-id"); r.put("ref", "main")
        if (o.hasNonNull("current-snapshot-id"))
          r.put("snapshot-id", o.get("current-snapshot-id").asLong())
        else r.putNull("snapshot-id")
        ()
    }

    val ups = req.putArray("updates")
    def arr(n: Option[JsonNode], field: String): Seq[JsonNode] =
      n.flatMap(x => Option(x.get(field))).toSeq
        .flatMap(a => (0 until a.size()).map(a.get))
    def longIds(n: Option[JsonNode], field: String, idField: String): Set[Long] =
      arr(n, field).map(_.get(idField).asLong()).toSet
    def obj(n: Option[JsonNode], field: String): Map[String, JsonNode] =
      n.flatMap(x => Option(x.get(field))).filter(_.isObject).map(x =>
        x.properties().asScala.map(e => e.getKey -> e.getValue).toMap)
        .getOrElse(Map.empty)
    def optLong(n: Option[JsonNode], field: String): Option[Long] =
      n.flatMap(x => Option(x.get(field))).filter(!_.isNull).map(_.asLong())
    val newOpt = Some(newJ)

    if (oldJ.isEmpty) {
      ups.addObject().put("action", "assign-uuid")
        .put("uuid", newJ.get("table-uuid").asText())
      ups.addObject().put("action", "upgrade-format-version")
        .put("format-version", newJ.get("format-version").asInt())
      ()
    }
    if (oldJ.forall(o => o.get("location").asText() != newJ.get("location").asText())) {
      ups.addObject().put("action", "set-location")
        .put("location", newJ.get("location").asText())
      ()
    }
    // schemas / specs / sort orders: additions by id + default moves
    val oldSchemas = longIds(oldJ, "schemas", "schema-id")
    arr(newOpt, "schemas").filterNot(s => oldSchemas(s.get("schema-id").asLong()))
      .foreach { s =>
        ups.addObject().put("action", "add-schema").set[ObjectNode]("schema", s); () }
    if (optLong(oldJ, "current-schema-id") != optLong(newOpt, "current-schema-id"))
      optLong(newOpt, "current-schema-id").foreach(id =>
        ups.addObject().put("action", "set-current-schema").put("schema-id", id))
    val oldSpecs = longIds(oldJ, "partition-specs", "spec-id")
    arr(newOpt, "partition-specs").filterNot(s => oldSpecs(s.get("spec-id").asLong()))
      .foreach { s =>
        ups.addObject().put("action", "add-spec").set[ObjectNode]("spec", s); () }
    if (optLong(oldJ, "default-spec-id") != optLong(newOpt, "default-spec-id"))
      optLong(newOpt, "default-spec-id").foreach(id =>
        ups.addObject().put("action", "set-default-spec").put("spec-id", id))
    val oldOrders = longIds(oldJ, "sort-orders", "order-id")
    arr(newOpt, "sort-orders").filterNot(s => oldOrders(s.get("order-id").asLong()))
      .foreach { s =>
        ups.addObject().put("action", "add-sort-order")
          .set[ObjectNode]("sort-order", s); () }
    if (optLong(oldJ, "default-sort-order-id") != optLong(newOpt, "default-sort-order-id"))
      optLong(newOpt, "default-sort-order-id").foreach(id =>
        ups.addObject().put("action", "set-default-sort-order")
          .put("sort-order-id", id))
    // properties: changed/added keys in one set-properties, removals apart
    val oldProps = obj(oldJ, "properties").view.mapValues(_.asText()).toMap
    val newProps = obj(newOpt, "properties").view.mapValues(_.asText()).toMap
    val setProps = newProps.filter { case (k, v) => !oldProps.get(k).contains(v) }
    if (setProps.nonEmpty) {
      val u = ups.addObject(); u.put("action", "set-properties")
      val m = u.putObject("updates")
      setProps.toSeq.sortBy(_._1).foreach { case (k, v) => m.put(k, v) }
    }
    val removedProps = (oldProps.keySet -- newProps.keySet).toSeq.sorted
    if (removedProps.nonEmpty) {
      val u = ups.addObject(); u.put("action", "remove-properties")
      val a = u.putArray("removals"); removedProps.foreach(a.add)
    }
    // snapshots: additions ride whole; expirations as remove-snapshots
    val oldSnaps = longIds(oldJ, "snapshots", "snapshot-id")
    val newSnaps = longIds(newOpt, "snapshots", "snapshot-id")
    arr(newOpt, "snapshots").filterNot(s => oldSnaps(s.get("snapshot-id").asLong()))
      .foreach { s =>
        ups.addObject().put("action", "add-snapshot").set[ObjectNode]("snapshot", s); () }
    val removedSnaps = (oldSnaps -- newSnaps).toSeq.sorted
    if (removedSnaps.nonEmpty) {
      val u = ups.addObject(); u.put("action", "remove-snapshots")
      val a = u.putArray("snapshot-ids"); removedSnaps.foreach(a.add)
    }
    // refs: set changed/added, remove dropped
    val oldRefs = obj(oldJ, "refs")
    val newRefs = obj(newOpt, "refs")
    newRefs.toSeq.sortBy(_._1).foreach { case (name, r) =>
      if (!oldRefs.get(name).contains(r)) {
        val u = ups.addObject(); u.put("action", "set-snapshot-ref")
        u.put("ref-name", name)
        u.put("type", r.get("type").asText())
        u.put("snapshot-id", r.get("snapshot-id").asLong())
      }
    }
    (oldRefs.keySet -- newRefs.keySet).toSeq.sorted.foreach { name =>
      ups.addObject().put("action", "remove-snapshot-ref").put("ref-name", name)
      ()
    }
    mapper.writeValueAsString(req)
  }
}

/** JDBC ("sql") catalog — pyiceberg's `SqlCatalog` table layout (ref
  * `catalog.py:99-142` routes `type: sql` there): one `iceberg_tables`
  * row per table, `(catalog_name, table_namespace, table_name,
  * metadata_location, previous_metadata_location)`. Plain `java.sql` over
  * whatever driver the classpath offers (embedded Derby ships with
  * Spark, so this is testable offline; any server JDBC URL works the
  * same way).
  *
  * Read surface plus [[register]]/[[drop]] — registration is how
  * metadata-location catalogs adopt existing tables; data/metadata
  * writes stay with the engine's own commit path.
  */
final class JdbcCatalog(
    jdbcUrl: String,
    catalogName: String = "default",
    warehouse: Option[String] = None) extends MetaCatalog with PointerCatalog {

  val TableName = "iceberg_tables"

  private def withConn[A](f: java.sql.Connection => A): A =
    scala.util.Using.resource(java.sql.DriverManager.getConnection(jdbcUrl))(f)

  /** Create the `iceberg_tables` table if absent (idempotent). */
  def init(): Unit = withConn { c =>
    val meta = c.getMetaData
    val exists = scala.util.Using.resource(
      meta.getTables(null, null, TableName.toUpperCase, null))(_.next()) ||
      scala.util.Using.resource(
        meta.getTables(null, null, TableName, null))(_.next())
    if (!exists) scala.util.Using.resource(c.createStatement()) { st =>
      st.executeUpdate(
        s"""CREATE TABLE $TableName (
           |  catalog_name VARCHAR(255) NOT NULL,
           |  table_namespace VARCHAR(255) NOT NULL,
           |  table_name VARCHAR(255) NOT NULL,
           |  metadata_location VARCHAR(1000),
           |  previous_metadata_location VARCHAR(1000),
           |  PRIMARY KEY (catalog_name, table_namespace, table_name))"""
          .stripMargin)
      ()
    }
  }

  /** Adopt a table: point the catalog row at its current metadata file.
    * UPSERT semantics — re-registering an existing ref moves its pointer
    * (old location preserved as previous_metadata_location) instead of
    * throwing a raw primary-key violation. */
  def register(ref: String, metadataLocation: String): Unit = {
    val Array(ns, t) = refParts(ref)
    withConn { c =>
      val updated = scala.util.Using.resource(c.prepareStatement(
        s"UPDATE $TableName SET previous_metadata_location = metadata_location, " +
          "metadata_location = ? WHERE catalog_name = ? AND " +
          "table_namespace = ? AND table_name = ?")) { ps =>
        ps.setString(1, metadataLocation)
        ps.setString(2, catalogName); ps.setString(3, ns); ps.setString(4, t)
        ps.executeUpdate()
      }
      if (updated == 0) {
        // UPDATE saw no row, but a concurrent register may INSERT in the
        // gap (no portable MERGE across drivers): absorb the key
        // violation and settle the race by updating the winner's row
        val inserted =
          try {
            scala.util.Using.resource(c.prepareStatement(
              s"INSERT INTO $TableName (catalog_name, table_namespace, table_name, " +
                "metadata_location, previous_metadata_location) VALUES (?, ?, ?, ?, NULL)")) { ps =>
              ps.setString(1, catalogName); ps.setString(2, ns); ps.setString(3, t)
              ps.setString(4, metadataLocation)
              ps.executeUpdate()
            }
            true
          } catch {
            case _: java.sql.SQLIntegrityConstraintViolationException => false
          }
        if (!inserted)
          scala.util.Using.resource(c.prepareStatement(
            s"UPDATE $TableName SET previous_metadata_location = metadata_location, " +
              "metadata_location = ? WHERE catalog_name = ? AND " +
              "table_namespace = ? AND table_name = ?")) { ps =>
            ps.setString(1, metadataLocation)
            ps.setString(2, catalogName); ps.setString(3, ns); ps.setString(4, t)
            ps.executeUpdate()
          }
      }
    }
    ()
  }

  /** Current pointer, None when the ref is unregistered or its location
    * is NULL (an in-flight foreign registration). */
  override def metadataPointer(ref: String): Option[String] = {
    val Array(ns, t) = refParts(ref)
    query(
      s"SELECT metadata_location FROM $TableName WHERE catalog_name = ? " +
        "AND table_namespace = ? AND table_name = ?",
      Seq(catalogName, ns, t))(rs => Option(rs.getString(1)))
      .headOption.flatten
  }

  /** The pyiceberg `SqlCatalog` commit CAS: one guarded UPDATE moving
    * `metadata_location` to `next` (old value preserved as
    * `previous_metadata_location`) iff the row still holds `expected`;
    * `expected = None` INSERTs the row. 0 rows touched — or a key
    * violation on insert — is a [[CommitConflictException]]. */
  override def casPointer(
      ref: String, expected: Option[String], next: String): Unit = {
    val Array(ns, t) = refParts(ref)
    val won = withConn { c =>
      expected match {
        case Some(exp) =>
          scala.util.Using.resource(c.prepareStatement(
            s"UPDATE $TableName SET previous_metadata_location = metadata_location, " +
              "metadata_location = ? WHERE catalog_name = ? AND " +
              "table_namespace = ? AND table_name = ? AND " +
              "metadata_location = ?")) { ps =>
            ps.setString(1, next)
            ps.setString(2, catalogName); ps.setString(3, ns); ps.setString(4, t)
            ps.setString(5, exp)
            ps.executeUpdate() == 1
          }
        case None =>
          try {
            scala.util.Using.resource(c.prepareStatement(
              s"INSERT INTO $TableName (catalog_name, table_namespace, table_name, " +
                "metadata_location, previous_metadata_location) VALUES (?, ?, ?, ?, NULL)")) { ps =>
              ps.setString(1, catalogName); ps.setString(2, ns); ps.setString(3, t)
              ps.setString(4, next)
              ps.executeUpdate() == 1
            }
          } catch {
            case _: java.sql.SQLIntegrityConstraintViolationException => false
          }
      }
    }
    if (!won) throw new CommitConflictException(
      s"catalog pointer for $ref is no longer at " +
        s"${expected.getOrElse("<unregistered>")} — a concurrent writer " +
        "moved it; reload and retry")
  }

  override def createLocation(ref: String): String = {
    val Array(ns, t) = refParts(ref)
    val wh = warehouse.getOrElse(throw new IllegalArgumentException(
      s"creating $ref through the sql catalog needs a 'warehouse' path " +
        "(set it in the catalog config)"))
    s"${wh.stripSuffix("/")}/$ns/$t"
  }

  override def dropPointer(ref: String): Unit = drop(ref)

  def drop(ref: String): Unit = {
    val Array(ns, t) = refParts(ref)
    withConn { c =>
      scala.util.Using.resource(c.prepareStatement(
        s"DELETE FROM $TableName WHERE catalog_name = ? AND " +
          "table_namespace = ? AND table_name = ?")) { ps =>
        ps.setString(1, catalogName); ps.setString(2, ns); ps.setString(3, t)
        ps.executeUpdate()
      }
    }
    ()
  }

  private def refParts(ref: String): Array[String] = {
    val parts = ref.split("\\.", 2)
    require(parts.length == 2, s"table ref must be <namespace>.<table>: $ref")
    parts
  }

  private def query[A](sql: String, binds: Seq[String])(
      read: java.sql.ResultSet => A): Seq[A] = withConn { c =>
    scala.util.Using.resource(c.prepareStatement(sql)) { ps =>
      binds.zipWithIndex.foreach { case (b, i) => ps.setString(i + 1, b) }
      scala.util.Using.resource(ps.executeQuery()) { rs =>
        val out = Seq.newBuilder[A]
        while (rs.next()) out += read(rs)
        out.result()
      }
    }
  }

  override def name: String = s"sql:$jdbcUrl"

  override def listNamespaces(): Seq[String] =
    query(
      s"SELECT DISTINCT table_namespace FROM $TableName WHERE catalog_name = ? " +
        "ORDER BY table_namespace",
      Seq(catalogName))(_.getString(1))

  override def listTables(): Seq[(String, String)] =
    query(
      s"SELECT table_namespace, table_name FROM $TableName WHERE catalog_name = ? " +
        "ORDER BY table_namespace, table_name",
      Seq(catalogName))(rs => rs.getString(1) -> rs.getString(2))

  private def metadataLocation(ref: String): String = {
    val Array(ns, t) = refParts(ref)
    query(
      s"SELECT metadata_location FROM $TableName WHERE catalog_name = ? " +
        "AND table_namespace = ? AND table_name = ?",
      Seq(catalogName, ns, t))(rs => Option(rs.getString(1)))
      .headOption.getOrElse(throw new IllegalArgumentException(
        s"table $ref not found in catalog '$catalogName' at $jdbcUrl"))
      // the column is nullable (mid-commit rows, foreign writers):
      // surface that as a descriptive error, not Paths.get(null)'s NPE
      .getOrElse(throw new IllegalStateException(
        s"table $ref exists in catalog '$catalogName' but its " +
          "metadata_location is NULL (incomplete registration or " +
          "in-flight commit) — re-register the table to adopt it"))
  }

  override def loadTable(ref: String): IcebergTable = {
    val md = IcebergMeta.loadAt(
      MetadataLocations.localPath(metadataLocation(ref), "sql"))
    new IcebergTable(md.location, md)
  }

  override def tableLocation(ref: String): String =
    loadTable(ref).metadata.location
}

object Catalogs {

  /** Catalog types the reference supports through pyiceberg — ALL four
    * network backends are real here: REST speaks plain HTTP
    * ([[RestCatalog]]), `sql` is plain JDBC ([[JdbcCatalog]] — embedded
    * Derby ships with Spark), `glue` is AWS JSON-1.1 over HTTP with
    * SigV4 signing ([[GlueCatalog]], JDK crypto), and `hive` is Thrift
    * binary protocol over a raw socket ([[HiveCatalog]], hand-rolled
    * codec pinned against the published wire format). */
  val NetworkBackends: Set[String] = Set("rest", "sql", "glue", "hive")

  /** Build a catalog from resolved [[CatalogConfig]]: a `warehouse` path
    * (with no network `type`) yields [[FsCatalog]]; `type: rest` (or an
    * `http(s)` uri) yields [[RestCatalog]]; `type: sql`/`jdbc:` yields
    * [[JdbcCatalog]]; `type: glue` yields [[GlueCatalog]]; `type: hive`
    * (or a `thrift://` uri) yields [[HiveCatalog]]. Misconfigured
    * backends raise `IllegalArgumentException`, which
    * [[graft.api.Errors]] maps to a friendly message. */
  def forConfig(cfg: CatalogConfig): MetaCatalog = {
    val backend = cfg.properties.get("type")
      .orElse(cfg.uri.map(u => u.takeWhile(_ != ':')))
      .map(_.toLowerCase)
    backend match {
      case Some(b) if b == "rest" || b == "http" || b == "https" =>
        val uri = cfg.uri.getOrElse(throw new IllegalArgumentException(
          s"catalog '${cfg.name}' is type rest but has no uri"))
        new RestCatalog(uri, cfg.properties - "type")
      case Some(b) if b == "sql" || b == "jdbc" =>
        val uri = cfg.uri.getOrElse(throw new IllegalArgumentException(
          s"catalog '${cfg.name}' is type sql but has no jdbc uri"))
        new JdbcCatalog(uri, cfg.name,
          cfg.warehouse.orElse(cfg.properties.get("warehouse")))
      case Some("glue") =>
        def prop(key: String, env: String): String =
          cfg.properties.get(key).orElse(sys.env.get(env)).getOrElse(
            throw new IllegalArgumentException(
              s"catalog '${cfg.name}' is type glue but has no '$key' " +
                s"property and $env is unset"))
        val region = prop("region", "AWS_REGION")
        new GlueCatalog(
          cfg.uri.getOrElse(s"https://glue.$region.amazonaws.com"),
          region,
          prop("access-key", "AWS_ACCESS_KEY_ID"),
          prop("secret-key", "AWS_SECRET_ACCESS_KEY"),
          cfg.warehouse.orElse(cfg.properties.get("warehouse")))
      case Some(b) if b == "hive" || b == "thrift" =>
        val uri = cfg.uri.getOrElse(throw new IllegalArgumentException(
          s"catalog '${cfg.name}' is type hive but has no thrift uri"))
        val hp = uri.stripPrefix("thrift://").split(":", 2)
        require(hp.length == 2 && hp(1).nonEmpty && hp(1).forall(_.isDigit),
          s"hive uri must be thrift://host:port: $uri")
        new HiveCatalog(hp(0), hp(1).toInt,
          cfg.warehouse.orElse(cfg.properties.get("warehouse")))
      case _ =>
        val wh = cfg.warehouse.getOrElse(throw new IllegalArgumentException(
          s"catalog '${cfg.name}' resolves to no warehouse path"))
        new FsCatalog(wh)
    }
  }
}
