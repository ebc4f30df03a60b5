package graft.meta

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec
import graft.fixtures.FixtureWriter

/** In-process AWS-Glue stub (JDK `com.sun.net.httpserver`) fronting a
  * fixture warehouse, driven through the real [[GlueCatalog]] client.
  * The stub RE-DERIVES the SigV4 signature server-side from the received
  * request and the shared secret, so a signing bug in the client fails
  * the auth check — the strongest offline test of the signer. */
class GlueCatalogSpec extends SparkSpec {

  private val AK = "AKIDEXAMPLE"
  private val SK = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"

  /** Stateful Glue stub: per-table (metadata_location, VersionId) rows
    * seeded from the fixture warehouse, served on GetTable and advanced
    * ONLY through VersionId-guarded UpdateTable — a stale VersionId
    * answers `ConcurrentModificationException` exactly like the real
    * service under Iceberg's optimistic-locking commit shape. */
  private def startStub(whDir: String): (HttpServer, Int,
      scala.collection.mutable.Map[String, (String, Int)]) = {
    val fs = new FsCatalog(whDir)
    val tables = scala.collection.mutable.Map.empty[String, (String, Int)]
    fs.listTables().foreach { case (n, t) =>
      tables(s"$n.$t") =
        (IcebergMeta.latestMetadataPath(fs.tableLocation(s"$n.$t")).toString, 1)
    }
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def reply(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/x-amz-json-1.1")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    server.createContext("/", (ex: HttpExchange) => {
      val payload = ex.getRequestBody.readAllBytes()
      val h = ex.getRequestHeaders
      val auth = Option(h.getFirst("Authorization")).getOrElse("")
      // re-derive the signature exactly as the client must have computed
      // it (same signed-header set, same payload) and compare
      val expectAuth = SigV4.sign(
        "POST", "/", "",
        Seq(
          "content-type" -> h.getFirst("Content-Type"),
          "host" -> h.getFirst("Host"),
          "x-amz-date" -> h.getFirst("X-Amz-Date"),
          "x-amz-target" -> h.getFirst("X-Amz-Target")),
        payload, "eu-test-1", "glue", AK, SK).last._2
      if (auth != expectAuth) {
        reply(ex, 403, s"""{"__type": "AccessDeniedException",
          | "got": "$auth", "want": "$expectAuth"}""".stripMargin)
      } else {
        val target = h.getFirst("X-Amz-Target")
        val req = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(new String(payload, StandardCharsets.UTF_8))
        target match {
          case "AWSGlue.GetDatabases" =>
            val dbs = tables.keySet.map(_.split("\\.", 2)(0)).toSeq.distinct.sorted
              .map(n => s"""{"Name": "$n"}""").mkString(",")
            reply(ex, 200, s"""{"DatabaseList": [$dbs]}""")
          case "AWSGlue.GetTables" =>
            val db = req.get("DatabaseName").asText()
            val ts = tables.keySet.toSeq.sorted
              .map(_.split("\\.", 2)).filter(_(0) == db)
              .map(p => s"""{"Name": "${p(1)}"}""").mkString(",")
            reply(ex, 200, s"""{"TableList": [$ts]}""")
          case "AWSGlue.GetTable" =>
            val db = req.get("DatabaseName").asText()
            val t = req.get("Name").asText()
            tables.get(s"$db.$t") match {
              case Some((loc, vid)) => reply(ex, 200,
                s"""{"Table": {"Name": "$t", "DatabaseName": "$db",
                   | "VersionId": "$vid",
                   | "Parameters": {"table_type": "ICEBERG",
                   |   "metadata_location": "$loc"}}}""".stripMargin)
              case None => reply(ex, 400,
                """{"__type": "EntityNotFoundException", "Message": "not found"}""")
            }
          case "AWSGlue.CreateTable" =>
            val db = req.get("DatabaseName").asText()
            val in = req.get("TableInput")
            val t = in.get("Name").asText()
            if (tables.contains(s"$db.$t")) reply(ex, 400,
              """{"__type": "AlreadyExistsException", "Message": "exists"}""")
            else {
              tables(s"$db.$t") =
                (in.get("Parameters").get("metadata_location").asText(), 1)
              reply(ex, 200, "{}")
            }
          case "AWSGlue.UpdateTable" =>
            val db = req.get("DatabaseName").asText()
            val in = req.get("TableInput")
            val t = in.get("Name").asText()
            val sentVid = Option(req.get("VersionId")).map(_.asText())
            tables.get(s"$db.$t") match {
              case None => reply(ex, 400,
                """{"__type": "EntityNotFoundException", "Message": "not found"}""")
              // test hook: a NEGATIVE stored version simulates a racer
              // landing between the client's GetTable and its
              // UpdateTable — the window the VersionId guard exists for
              case Some((_, vid)) if vid < 0 || !sentVid.contains(vid.toString) =>
                reply(ex, 400,
                  """{"__type": "ConcurrentModificationException", "Message": "version superseded"}""")
              case Some((_, vid)) =>
                tables(s"$db.$t") =
                  (in.get("Parameters").get("metadata_location").asText(), vid + 1)
                reply(ex, 200, "{}")
            }
          case "AWSGlue.DeleteTable" =>
            val db = req.get("DatabaseName").asText()
            val t = req.get("Name").asText()
            if (tables.remove(s"$db.$t").isDefined) reply(ex, 200, "{}")
            else reply(ex, 400,
              """{"__type": "EntityNotFoundException", "Message": "not found"}""")
          case other =>
            reply(ex, 400, s"""{"__type": "UnknownOperation", "op": "$other"}""")
        }
      }
    })
    server.start()
    (server, server.getAddress.getPort, tables)
  }

  test("SigV4 signer matches AWS's published test-suite derivation shape") {
    // deterministic signature: fixed date/headers/payload always produce
    // the same HMAC chain output (pinned so a signer refactor that
    // changes canonicalization breaks loudly)
    val headers = SigV4.sign(
      "POST", "/", "",
      Seq("host" -> "glue.eu-test-1.amazonaws.com",
        "x-amz-date" -> "20260813T000000Z"),
      "{}".getBytes(StandardCharsets.UTF_8),
      "eu-test-1", "glue", AK, SK)
    val auth = headers.last._2
    assert(auth.startsWith(
      s"AWS4-HMAC-SHA256 Credential=$AK/20260813/eu-test-1/glue/aws4_request, " +
        "SignedHeaders=host;x-amz-date, Signature="))
    assert(auth.endsWith(SigV4.hmac(
      SigV4.hmac(SigV4.hmac(SigV4.hmac(SigV4.hmac(
        ("AWS4" + SK).getBytes(StandardCharsets.UTF_8), "20260813"),
        "eu-test-1"), "glue"), "aws4_request"),
      Seq("AWS4-HMAC-SHA256", "20260813T000000Z",
        "20260813/eu-test-1/glue/aws4_request",
        SigV4.hexSha256((
          "POST\n/\n\n" +
          "host:glue.eu-test-1.amazonaws.com\nx-amz-date:20260813T000000Z\n" +
          "\nhost;x-amz-date\n" +
          SigV4.hexSha256("{}".getBytes(StandardCharsets.UTF_8)))
          .getBytes(StandardCharsets.UTF_8))).mkString("\n"))
      .map("%02x".format(_)).mkString))
  }

  test("GlueCatalog walks and loads tables through a signature-checking stub") {
    val wh = Files.createTempDirectory("gluewh").toString
    FixtureWriter.writeDemo(spark, wh)
    val (server, port, _) = startStub(wh)
    try {
      val glue = new GlueCatalog(s"http://127.0.0.1:$port", "eu-test-1", AK, SK)
      val fs = new FsCatalog(wh)
      assert(glue.listNamespaces() == fs.listNamespaces())
      assert(glue.listTables() == fs.listTables())
      val ref = fs.listTables().map { case (n, t) => s"$n.$t" }.head
      val viaGlue = glue.loadTable(ref)
      assert(viaGlue.metadata.tableUuid == fs.loadTable(ref).metadata.tableUuid)
      assert(graft.rel.MetaRelations.files(spark, viaGlue).count() > 0)
      // a WRONG secret is rejected by the stub's server-side re-derivation
      val bad = new GlueCatalog(s"http://127.0.0.1:$port", "eu-test-1", AK, "nope")
      val err = intercept[IllegalStateException](bad.listNamespaces())
      assert(err.getMessage.contains("403"))
      // and the Engine facade runs over Glue like the other backends
      val eng = graft.api.Engine.forConfig(spark, CatalogConfig(
        "g", Some(s"http://127.0.0.1:$port"), None,
        Map("type" -> "glue", "region" -> "eu-test-1",
          "access-key" -> AK, "secret-key" -> SK)))
      assert(eng.listTables().count() == fs.listTables().size.toLong)
      assert(eng.summary(ref).collect().head.getAs[Long]("file_count") > 0)
    } finally server.stop(0)
  }

  test("engine commits mirror into Glue via VersionId-guarded UpdateTable; " +
      "stale pointers and superseded versions lose with conflicts") {
    import spark.implicits._
    val wh = Files.createTempDirectory("gluewh-commit").toString
    FixtureWriter.writeDemo(spark, wh)
    val (server, port, stubTables) = startStub(wh)
    try {
      val cfg = CatalogConfig(
        "g", Some(s"http://127.0.0.1:$port"), Some(wh),
        Map("type" -> "glue", "region" -> "eu-test-1",
          "access-key" -> AK, "secret-key" -> SK))
      val eng = graft.api.Engine.forConfig(spark, cfg)
      val fs = new FsCatalog(wh)
      val ref = fs.listTables().map { case (n, t) => s"$n.$t" }.head
      val glue = eng.catalog.asInstanceOf[GlueCatalog]
      val p0 = glue.metadataPointer(ref).get
      val before = eng.readTable(ref).count()

      // a data commit advances the Glue pointer (UpdateTable carrying
      // the GetTable's VersionId); a fresh engine reads through it
      eng.append(ref, eng.readTable(ref).limit(1))
      val p1 = glue.metadataPointer(ref).get
      assert(p1 != p0, "the commit must advance the Glue pointer")
      assert(stubTables(ref)._2 == 2, "UpdateTable must bump the VersionId")
      assert(graft.api.Engine.forConfig(spark, cfg)
        .readTable(ref).count() == before + 1)

      // a STALE expected location refuses before any UpdateTable fires
      intercept[CommitConflictException](glue.casPointer(ref, Some(p0), p1))
      // a superseded VERSION between the read and the update refuses
      // through the service's own ConcurrentModificationException (the
      // stub's negative-version hook simulates the racer landing inside
      // the GetTable→UpdateTable window)
      val savedVid = stubTables(ref)._2
      stubTables(ref) = (stubTables(ref)._1, -1)
      val raced = intercept[CommitConflictException](
        glue.casPointer(ref, Some(p1), p0))
      assert(raced.getMessage.contains("reload and retry"))
      stubTables(ref) = (stubTables(ref)._1, savedVid)

      // CREATE through the Glue engine lands under the warehouse and
      // registers the pointer; the failure-path dropPointer removes it
      eng.createTable("sales.glue_new",
        Seq((1L, "a")).toDF("id", "name").schema)
      assert(glue.metadataPointer("sales.glue_new")
        .exists(_.startsWith(wh)), glue.metadataPointer("sales.glue_new"))
      eng.append("sales.glue_new", Seq((1L, "a")).toDF("id", "name"))
      assert(graft.api.Engine.forConfig(spark, cfg)
        .readTable("sales.glue_new").count() == 1L)
      glue.dropPointer("sales.glue_new")
      assert(glue.metadataPointer("sales.glue_new").isEmpty)
      glue.dropPointer("sales.glue_new") // idempotent (EntityNotFound)
    } finally server.stop(0)
  }

  test("CLI drives table-info over Glue end-to-end (--catalog entry in a config file)") {
    val wh = java.nio.file.Files.createTempDirectory("gluewh2").toString
    FixtureWriter.writeDemo(spark, wh)
    val (server, port, _) = startStub(wh)
    try {
      val fs = new FsCatalog(wh)
      val ref = fs.listTables().map { case (n, t) => s"$n.$t" }.head
      // glue can't be inferred from an https:// uri (that's REST), so the
      // CLI resolves the named config-file entry: type, endpoint, region
      // and signing credentials all flow through the file
      val cfg = java.nio.file.Files.createTempFile("gluecli", ".json")
      java.nio.file.Files.writeString(cfg,
        s"""{"catalogs": {"g": {"type": "glue", "uri": "http://127.0.0.1:$port",
           |  "region": "eu-test-1", "access-key": "$AK", "secret-key": "$SK"}}}"""
          .stripMargin)
      assert(graft.tools.Cli.run(Array(
        "-", "table-info", ref, "--catalog", "g", "--config", cfg.toString)) == 0)
      assert(graft.tools.Cli.run(Array(
        "-", "list-tables", "--catalog", "g", "--config", cfg.toString)) == 0)
    } finally server.stop(0)
  }

  test("forConfig: glue without region/credentials is a config error, not a typed block") {
    intercept[IllegalArgumentException] {
      Catalogs.forConfig(CatalogConfig("g", None, None,
        Map("type" -> "glue", "access-key" -> "a", "secret-key" -> "s")))
    }
  }
}
