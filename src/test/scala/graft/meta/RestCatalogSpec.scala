package graft.meta

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec
import graft.fixtures.FixtureWriter

/** In-process Iceberg-REST-catalog stub (JDK `com.sun.net.httpserver`)
  * fronting a filesystem fixture warehouse, driven through the real
  * [[RestCatalog]] client — the offline-testable half of the reference's
  * pyiceberg REST backend (ref `catalog.py:99-142`). */
class RestCatalogSpec extends SparkSpec {

  /** Serve the warehouse at `whDir` over the REST catalog protocol with a
    * `demo` prefix and required bearer token, PLUS a synthetic nested
    * namespace `deep.sub` (parent-aware listing; one adopted table
    * aliasing the first fixture table) so the client's 0x1F level
    * separator and parent-recursion are exercised against the wire.
    *
    * The stub is POINTER-SERVING, like a real server: each table's
    * LoadTableResult comes from the stub's own metadata pointer (seeded
    * at start), which advances ONLY through the spec's commit endpoint
    * (`POST .../tables/{t}`) after the requirements validate against
    * the currently-pointed metadata — a stale `assert-ref-snapshot-id`
    * or `assert-table-uuid` 409s. The stub fronts the same filesystem
    * the engine publishes to, so on a valid commit it advances to the
    * table's path-latest version (the engine's publish CAS already
    * ordered the writers; the update stream is validated for shape).
    * Returns (server, port, seen-auth, seen-raw-URIs, commit-bodies). */
  private def startStub(whDir: String): (HttpServer, Int,
      scala.collection.mutable.Buffer[String],
      scala.collection.mutable.Buffer[String],
      scala.collection.mutable.Buffer[String]) = {
    val fs = new FsCatalog(whDir)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val seenAuth = scala.collection.mutable.Buffer.empty[String]
    val seenUris = scala.collection.mutable.Buffer.empty[String]
    val commits = scala.collection.mutable.Buffer.empty[String]
    val pointers = scala.collection.mutable.Map.empty[String, String]
    fs.listTables().foreach { case (n, t) =>
      pointers(s"$n.$t") =
        IcebergMeta.latestMetadataPath(fs.tableLocation(s"$n.$t")).toString
    }
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def reply(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    // the decoded form of "deep%1Fsub" — the unit-separated level pair
    val deepSub = "deep\u001Fsub"
    def firstTableMetadata(): String = {
      val (n, t) = fs.listTables().head
      val mdPath = IcebergMeta.latestMetadataPath(fs.tableLocation(s"$n.$t"))
      val md = new String(Files.readAllBytes(mdPath), StandardCharsets.UTF_8)
      s"""{"metadata-location": "$mdPath", "metadata": $md}"""
    }
    def loadResult(ref: String): Option[String] =
      pointers.get(ref).map { loc =>
        val md = new String(Files.readAllBytes(Paths.get(loc)), StandardCharsets.UTF_8)
        s"""{"metadata-location": "$loc", "metadata": $md}"""
      }
    /** Validate the CommitTableRequest's requirements against the
      * POINTED metadata; advance the pointer to path-latest on pass. */
    def commitTable(ref: String, body: String): Int = {
      commits += body
      val req = mapper.readTree(body)
      val current = pointers.get(ref).map(loc =>
        mapper.readTree(Files.readString(Paths.get(loc))))
      val reqs = req.get("requirements")
      val ok = (0 until reqs.size()).forall { i =>
        val r = reqs.get(i)
        r.get("type").asText() match {
          case "assert-create" => current.isEmpty
          case "assert-table-uuid" => current.exists(
            _.get("table-uuid").asText() == r.get("uuid").asText())
          case "assert-ref-snapshot-id" =>
            val want = Option(r.get("snapshot-id")).filter(!_.isNull).map(_.asLong())
            val have = current.flatMap(c =>
              Option(c.get("current-snapshot-id")).filter(!_.isNull).map(_.asLong()))
            want == have
          case _ => false // unknown requirement: refuse, never ignore
        }
      }
      // shape check: a commit must carry at least one update action
      val updates = req.get("updates")
      if (!ok || updates == null || updates.size() == 0) 409
      else {
        pointers(ref) =
          IcebergMeta.latestMetadataPath(fs.tableLocation(ref)).toString
        200
      }
    }
    server.createContext("/", (ex: HttpExchange) => {
      seenAuth += Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      seenUris += ex.getRequestURI.toString
      val path = ex.getRequestURI.getPath
      val method = ex.getRequestMethod
      val TablesRe = "/v1/demo/namespaces/([^/]+)/tables".r
      val TableRe = "/v1/demo/namespaces/([^/]+)/tables/([^/]+)".r
      path match {
        case "/v1/config" =>
          // defaults are overridden by the client, overrides override it —
          // prefix comes back as an override like real servers send it
          reply(ex, 200,
            """{"defaults": {"warehouse": "ignored-default"},
              | "overrides": {"prefix": "demo"}}""".stripMargin)
        case "/v1/demo/namespaces" =>
          Option(ex.getRequestURI.getQuery) match {
            case None =>
              // top level only (the spec's contract): fixture dirs + the
              // synthetic nested root
              val ns = (fs.listNamespaces() :+ "deep").sorted
                .map(n => "[\"" + n + "\"]").mkString(",")
              reply(ex, 200, s"""{"namespaces": [$ns]}""")
            case Some("parent=deep") =>
              reply(ex, 200, """{"namespaces": [["deep", "sub"]]}""")
            case Some(_) =>
              reply(ex, 200, """{"namespaces": []}""")
          }
        case TableRe(ns, t) if method == "POST" =>
          val body = scala.util.Using.resource(ex.getRequestBody)(in =>
            new String(in.readAllBytes(), StandardCharsets.UTF_8))
          commitTable(s"$ns.$t", body) match {
            case 200 => reply(ex, 200, loadResult(s"$ns.$t").get)
            case code => reply(ex, code,
              """{"error": {"message": "requirement failed", "type": "CommitFailedException"}}""")
          }
        case TableRe(ns, t) if method == "DELETE" =>
          if (pointers.remove(s"$ns.$t").isDefined) {
            ex.sendResponseHeaders(204, -1); ex.close()
          } else reply(ex, 404, """{"error": "not found"}""")
        case TableRe(ns, t) =>
          if (ns == deepSub && t == "adopted") reply(ex, 200, firstTableMetadata())
          else loadResult(s"$ns.$t") match {
            case Some(res) => reply(ex, 200, res)
            case None => reply(ex, 404, """{"error": "not found"}""")
          }
        case TablesRe(ns) =>
          if (ns == deepSub) reply(ex, 200,
            """{"identifiers": [{"namespace": ["deep", "sub"], "name": "adopted"}]}""")
          else {
            val ids = fs.listTables().filter(_._1 == ns)
              .map { case (n, t) =>
                s"""{"namespace": ["$n"], "name": "$t"}"""
              }.mkString(",")
            reply(ex, 200, s"""{"identifiers": [$ids]}""")
          }
        case _ => reply(ex, 404, """{"error": "not found"}""")
      }
    })
    server.start()
    (server, server.getAddress.getPort, seenAuth, seenUris, commits)
  }

  test("RestCatalog speaks the REST protocol end-to-end against a live HTTP server") {
    val wh = Files.createTempDirectory("restwh").toString
    FixtureWriter.writeDemo(spark, wh)
    val (server, port, seenAuth, seenUris, _) = startStub(wh)
    try {
      val rest = new RestCatalog(s"http://127.0.0.1:$port",
        Map("token" -> "sesame"))
      // config merge: server default < client prop < server override
      assert(rest.config("prefix") == "demo")
      assert(rest.config("token") == "sesame")
      assert(rest.config("warehouse") == "ignored-default")

      // catalog walk matches the filesystem truth PLUS the stub's nested
      // namespace, discovered through parent-param recursion
      val fs = new FsCatalog(wh)
      assert(rest.listNamespaces() ==
        (fs.listNamespaces() ++ Seq("deep", "deep.sub")).sorted)
      assert(rest.listTables() ==
        (fs.listTables() :+ ("deep.sub" -> "adopted")).sorted)
      // the nested listing went over the wire with the spec's 0x1F level
      // separator, not a literal dot
      assert(seenUris.exists(_.contains("deep%1Fsub")),
        seenUris.mkString("\n"))

      // nested-namespace table ref: the LAST dot separates the table
      val adopted = rest.loadTable("deep.sub.adopted")
      assert(adopted.metadata.tableUuid ==
        fs.loadTable(fs.listTables().map { case (n, t) => s"$n.$t" }.head)
          .metadata.tableUuid)

      // table load: metadata parses from the inline LoadTableResult and
      // matches a direct filesystem load
      val ref = fs.listTables().map { case (n, t) => s"$n.$t" }.head
      val viaRest = rest.loadTable(ref)
      val viaFs = fs.loadTable(ref)
      assert(viaRest.metadata.tableUuid == viaFs.metadata.tableUuid)
      assert(viaRest.metadata.currentSnapshotId == viaFs.metadata.currentSnapshotId)
      assert(viaRest.metadata.schemas == viaFs.metadata.schemas)

      // the REST-loaded table drives the real distributed scan machinery
      val files = graft.rel.MetaRelations.files(spark, viaRest)
      assert(files.count() > 0)

      // every request carried the bearer token
      assert(seenAuth.nonEmpty && seenAuth.forall(_ == "Bearer sesame"))

      // the ENGINE FACADE runs over the REST catalog: list/summary/
      // overview verbs drive the same analytics with no warehouse dir
      val eng = graft.api.Engine.forConfig(spark, CatalogConfig(
        "r", Some(s"http://127.0.0.1:$port"),
        None, Map("type" -> "rest", "token" -> "sesame")))
      assert(eng.listTables().count() == fs.listTables().size.toLong + 1L)
      assert(eng.summary(ref).collect().head.getAs[Long]("file_count") > 0)
      val ov = eng.warehouseOverview().collect()
      assert(ov.length >= 2) // per-namespace rows + rollup total row
    } finally server.stop(0)
  }

  test("CLI drives table-info over the REST catalog end-to-end (uri arg + config-file token)") {
    val wh = Files.createTempDirectory("restwh3").toString
    FixtureWriter.writeDemo(spark, wh)
    val (server, port, seenAuth, _, _) = startStub(wh)
    try {
      val fs = new FsCatalog(wh)
      val ref = fs.listTables().map { case (n, t) => s"$n.$t" }.head
      // config file supplies the token; the positional URI supplies the
      // endpoint — the full file+arg resolution chain, through the real
      // CLI entrypoint, against a live HTTP server
      val cfg = Files.createTempFile("restcli", ".json")
      Files.writeString(cfg,
        """{"catalogs": {"cli": {"type": "rest", "token": "sesame"}}}""")
      val rc = graft.tools.Cli.run(Array(
        s"http://127.0.0.1:$port", "table-info", ref,
        "--config", cfg.toString))
      assert(rc == 0)
      assert(seenAuth.exists(_ == "Bearer sesame"), seenAuth.mkString(","))
      // a second verb through the same path: list-tables
      assert(graft.tools.Cli.run(Array(
        s"http://127.0.0.1:$port", "list-tables", "--config", cfg.toString)) == 0)
    } finally server.stop(0)
  }

  test("engine commits mirror through the REST commit endpoint: the " +
      "pointer-serving stub validates requirements, fresh clients see " +
      "the snapshot, stale requirements 409 into a conflict") {
    val wh = Files.createTempDirectory("restwh-commit").toString
    FixtureWriter.writeDemo(spark, wh)
    val (server, port, _, _, commits) = startStub(wh)
    try {
      val fs = new FsCatalog(wh)
      val ref = fs.listTables().map { case (n, t) => s"$n.$t" }.head
      val cfg = CatalogConfig("r", Some(s"http://127.0.0.1:$port"),
        None, Map("type" -> "rest", "token" -> "sesame"))
      val eng = graft.api.Engine.forConfig(spark, cfg)
      val rest = new RestCatalog(s"http://127.0.0.1:$port",
        Map("token" -> "sesame"))
      val before = eng.readTable(ref).count()
      val p0 = rest.metadataPointer(ref).get

      // the commit POSTs through the spec endpoint and the stub's
      // pointer advances — a FRESH engine over the same catalog reads
      // the new snapshot through the pointer, not the filesystem
      eng.append(ref, eng.readTable(ref).limit(1))
      val p1 = rest.metadataPointer(ref).get
      assert(p1 != p0, "the commit must advance the served pointer")
      val fresh = graft.api.Engine.forConfig(spark, cfg)
      assert(fresh.readTable(ref).count() == before + 1)

      // the request was spec-shaped: asserted requirements + an
      // add-snapshot / set-snapshot-ref update stream
      val body = commits.last
      assert(body.contains("\"assert-table-uuid\"") &&
        body.contains("\"assert-ref-snapshot-id\"") &&
        body.contains("\"add-snapshot\"") &&
        body.contains("\"set-snapshot-ref\""), body)

      // a STALE commit (requirements derived from the superseded
      // pointer) 409s and maps to CommitConflictException; the served
      // pointer does not move
      intercept[CommitConflictException](
        rest.casPointer(ref, Some(p0), p1))
      assert(rest.metadataPointer(ref).contains(p1))

      // schema evolution mirrors too: add-schema + set-current-schema
      // reach the wire and a fresh client sees the column
      eng.addColumn(ref, "rest_note", "string")
      assert(commits.last.contains("\"add-schema\"") &&
        commits.last.contains("\"set-current-schema\""), commits.last)
      assert(graft.api.Engine.forConfig(spark, cfg)
        .readTable(ref).columns.contains("rest_note"))

      // dropPointer speaks the spec's DELETE (404 after removal)
      rest.dropPointer(ref)
      assert(rest.metadataPointer(ref).isEmpty)
      rest.dropPointer(ref) // idempotent: 404 is fine
    } finally server.stop(0)
  }

  test("forConfig routes rest configs to RestCatalog and keeps typed errors for the rest") {
    val wh = Files.createTempDirectory("restwh2").toString
    FixtureWriter.writeDemo(spark, wh)
    val (server, port, _, _, _) = startStub(wh)
    try {
      val cat = Catalogs.forConfig(CatalogConfig(
        "r", Some(s"http://127.0.0.1:$port"), None, Map("type" -> "rest")))
      assert(cat.isInstanceOf[RestCatalog])
      assert(cat.listNamespaces().nonEmpty)
      // uri-scheme detection without an explicit type
      val cat2 = Catalogs.forConfig(CatalogConfig(
        "r2", Some(s"http://127.0.0.1:$port"), None))
      assert(cat2.isInstanceOf[RestCatalog])
      // every network backend is real now; a misconfigured one (hive
      // with no uri) is a config error, not a typed block
      intercept[IllegalArgumentException] {
        Catalogs.forConfig(CatalogConfig(
          "h", None, None, Map("type" -> "hive")))
      }
      // unreachable server surfaces a clear error, not a hang or NPE
      val dead = new RestCatalog("http://127.0.0.1:1")
      val err = intercept[IllegalStateException](dead.listNamespaces())
      assert(err.getMessage.contains("unreachable"))
    } finally server.stop(0)
  }
}
