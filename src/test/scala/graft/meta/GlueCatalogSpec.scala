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

  private def startStub(whDir: String): (HttpServer, Int) = {
    val fs = new FsCatalog(whDir)
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
            val dbs = fs.listNamespaces()
              .map(n => s"""{"Name": "$n"}""").mkString(",")
            reply(ex, 200, s"""{"DatabaseList": [$dbs]}""")
          case "AWSGlue.GetTables" =>
            val db = req.get("DatabaseName").asText()
            val ts = fs.listTables().filter(_._1 == db)
              .map { case (_, t) => s"""{"Name": "$t"}""" }.mkString(",")
            reply(ex, 200, s"""{"TableList": [$ts]}""")
          case "AWSGlue.GetTable" =>
            val db = req.get("DatabaseName").asText()
            val t = req.get("Name").asText()
            val mdPath = IcebergMeta.latestMetadataPath(fs.tableLocation(s"$db.$t"))
            reply(ex, 200,
              s"""{"Table": {"Name": "$t", "DatabaseName": "$db",
                 | "Parameters": {"table_type": "ICEBERG",
                 |   "metadata_location": "$mdPath"}}}""".stripMargin)
          case other =>
            reply(ex, 400, s"""{"__type": "UnknownOperation", "op": "$other"}""")
        }
      }
    })
    server.start()
    (server, server.getAddress.getPort)
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
    val (server, port) = startStub(wh)
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

  test("CLI drives table-info over Glue end-to-end (--catalog entry in a config file)") {
    val wh = java.nio.file.Files.createTempDirectory("gluewh2").toString
    FixtureWriter.writeDemo(spark, wh)
    val (server, port) = startStub(wh)
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
