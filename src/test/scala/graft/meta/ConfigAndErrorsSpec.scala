package graft.meta

import org.scalatest.funsuite.AnyFunSuite

import graft.api.Errors

class ConfigAndErrorsSpec extends AnyFunSuite {

  test("placeholder expansion substitutes env vars and blanks unknowns") {
    val env = Map("WH" -> "/data/wh", "TOKEN" -> "s3cr3t")
    assert(CatalogConfig.expand("${WH}/tables", env) == "/data/wh/tables")
    assert(CatalogConfig.expand("key=${TOKEN}", env) == "key=s3cr3t")
    assert(CatalogConfig.expand("${MISSING}/x", env) == "/x")
  }

  test("resolution priority: args > env > file config") {
    val file = Map("uri" -> "file-uri", "warehouse" -> "${WH}", "extra" -> "1")
    val env = Map("ICEBERG_META_URI" -> "env-uri", "WH" -> "/from-env")
    val fromFile = CatalogConfig.resolve("c", None, None, file, Map("WH" -> "/wh"))
    assert(fromFile.uri.contains("file-uri"))
    assert(fromFile.warehouse.contains("/wh"))
    assert(fromFile.properties("extra") == "1")
    val envWins = CatalogConfig.resolve("c", None, None, file, env)
    assert(envWins.uri.contains("env-uri"))
    val argWins = CatalogConfig.resolve("c", Some("arg-uri"), Some("arg-wh"), file, env)
    assert(argWins.uri.contains("arg-uri"))
    assert(argWins.warehouse.contains("arg-wh"))
  }

  test("config file round-trip: nested catalogs shape, ${VAR} expansion, priority") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cfg")
    val path = dir.resolve("iceberg-meta.json")
    java.nio.file.Files.writeString(path,
      """{"catalogs": {
        |  "prod": {"uri": "thrift://meta:9083", "warehouse": "${WH}/prod",
        |           "io-impl": "hadoop"},
        |  "dev": {"warehouse": "/tmp/dev-wh"}
        |}}""".stripMargin)
    val env = Map("WH" -> "/data")
    val prod = CatalogConfig.resolveFromFile("prod", path = path, env = env)
    assert(prod.uri.contains("thrift://meta:9083"))
    assert(prod.warehouse.contains("/data/prod")) // ${WH} expanded
    assert(prod.properties("io-impl") == "hadoop")
    // env still beats file; args beat env
    val envEnv = env + ("ICEBERG_META_WAREHOUSE" -> "/env-wh")
    assert(CatalogConfig.resolveFromFile("prod", path = path, env = envEnv)
      .warehouse.contains("/env-wh"))
    assert(CatalogConfig.resolveFromFile("prod", warehouseArg = Some("/arg"),
      path = path, env = envEnv).warehouse.contains("/arg"))
    // unknown catalog / missing file → empty config, not an error
    assert(CatalogConfig.loadFile("nope", path).isEmpty)
    assert(CatalogConfig.loadFile("prod", dir.resolve("absent.json")).isEmpty)
    // flat single-map shape applies to any name
    val flat = dir.resolve("flat.json")
    java.nio.file.Files.writeString(flat, """{"warehouse": "/flat-wh"}""")
    assert(CatalogConfig.resolveFromFile("anything", path = flat, env = Map.empty)
      .warehouse.contains("/flat-wh"))
  }

  test("dotenv: parse, quoting, export prefix, comments; shell env wins") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dotenv")
    val f = dir.resolve(".env")
    java.nio.file.Files.writeString(f,
      """# catalog settings
        |ICEBERG_META_WAREHOUSE=/env-wh
        |export TOKEN="quoted value"
        |SINGLE='single quoted'
        |  SPACED  =  trimmed
        |NOT A VALID KEY=skipped
        |novalue
        |""".stripMargin)
    val d = CatalogConfig.loadDotEnv(f)
    assert(d("ICEBERG_META_WAREHOUSE") == "/env-wh")
    assert(d("TOKEN") == "quoted value")
    assert(d("SINGLE") == "single quoted")
    assert(d("SPACED") == "trimmed")
    assert(!d.contains("NOT A VALID KEY") && !d.contains("novalue"))
    // missing file is not an error
    assert(CatalogConfig.loadDotEnv(dir.resolve("absent.env")).isEmpty)
    // already-exported shell variables take precedence (dotenv standard)
    val merged = CatalogConfig.envWithDotEnv(Some(f),
      env = Map("TOKEN" -> "from-shell"))
    assert(merged("TOKEN") == "from-shell")
    assert(merged("ICEBERG_META_WAREHOUSE") == "/env-wh")
    // flows into the usual resolution chain: dotenv beats file config
    val cfg = CatalogConfig.resolve("c", None, None,
      fileConfig = Map("warehouse" -> "/file-wh"), env = merged)
    assert(cfg.warehouse.contains("/env-wh"))
  }

  test("catalog SPI: fs/rest/sql configs build real catalogs, the rest raise clearly") {
    val fs = Catalogs.forConfig(CatalogConfig("c", None, Some("/tmp/wh")))
    assert(fs.isInstanceOf[FsCatalog])
    assert(fs.name == "fs:/tmp/wh")
    // rest and sql are REAL backends now (RestCatalogSpec / JdbcCatalogSpec
    // drive them end-to-end); here just check the routing
    val rest = Catalogs.forConfig(CatalogConfig("c", Some("http://h:1"), None,
      Map("type" -> "rest")))
    assert(rest.isInstanceOf[RestCatalog])
    val sql = Catalogs.forConfig(CatalogConfig("c",
      Some("jdbc:derby:memory:spi;create=true"), None, Map("type" -> "sql")))
    assert(sql.isInstanceOf[JdbcCatalog])
    // a rest TYPE with no uri is a config error, not a typed backend error
    intercept[IllegalArgumentException](
      Catalogs.forConfig(CatalogConfig("c", None, Some("/wh"),
        Map("type" -> "rest"))))
    // hive routes to the real thrift client now (HiveCatalogSpec drives
    // it end-to-end); a thrift uri without a port is a config error
    assert(Catalogs.forConfig(CatalogConfig("c", Some("thrift://meta:9083"), None))
      .isInstanceOf[HiveCatalog])
    intercept[IllegalArgumentException](
      Catalogs.forConfig(CatalogConfig("c", None, None, Map("type" -> "hive"))))
    intercept[IllegalArgumentException](
      Catalogs.forConfig(CatalogConfig("c", None, None)))
  }

  test("error taxonomy maps exception classes to friendly messages") {
    assert(Errors.classify(new java.io.FileNotFoundException("x"))
      .contains("not found"))
    assert(Errors.classify(new java.net.ConnectException("refused"))
      .contains("Connection refused"))
    assert(Errors.classify(new NoSuchElementException("Snapshot 7 not found"))
      .contains("snapshots"))
    assert(Errors.friendly(41 + 1) == Right(42))
    assert(Errors.friendly(throw new IllegalArgumentException("bad"))
      .left.exists(_.contains("Invalid argument: bad")))
  }
}
