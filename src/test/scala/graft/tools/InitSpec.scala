package graft.tools

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Scripted `init` sessions — the reference's interactive catalog setup
  * (ref `cli.py` `init`) driven through injectable IO: preset choice,
  * per-property prompts with kept defaults, config-file merge, and the
  * optional connection test through the real resolution chain. */
class InitSpec extends AnyFunSuite {

  private def run(input: String, path: java.nio.file.Path): (Int, String) = {
    val bos = new ByteArrayOutputStream()
    val rc = Init.run(
      new BufferedReader(new StringReader(input)),
      new PrintStream(bos, true, "UTF-8"), path)
    (rc, new String(bos.toByteArray, StandardCharsets.UTF_8))
  }

  test("fs preset: answers land in the config file and the connection test walks the warehouse") {
    val wh = Files.createTempDirectory("init-wh")
    // a real mini warehouse: one namespace dir with one table dir
    Files.createDirectories(wh.resolve("ns1/t1/metadata"))
    val cfg = Files.createTempDirectory("init-cfg").resolve("cfg.json")

    // preset 5 = fs; name "mywh"; warehouse prompt overridden with the
    // real path; NOT default (but first write becomes default anyway);
    // test connection = yes
    val fsIdx = Init.Presets.indexWhere(_._1 == "fs") + 1
    val (rc, out) = run(s"$fsIdx\nmywh\n$wh\nn\ny\n", cfg)
    assert(rc == 0, out)
    assert(out.contains("Saved to "))
    assert(out.contains("Connected!") && out.contains("1 namespace") &&
      out.contains("1 table"), out)

    val json = Files.readString(cfg)
    assert(json.contains("\"mywh\"") && json.contains(wh.toString))
    assert(graft.meta.CatalogConfig.defaultCatalogName(cfg).contains("mywh"))
    assert(graft.meta.CatalogConfig.loadFile("mywh", cfg)
      .get("warehouse").contains(wh.toString))
  }

  test("a second init merges alongside and can take over default_catalog") {
    val cfg = Files.createTempDirectory("init-cfg2").resolve("cfg.json")
    val fsIdx = Init.Presets.indexWhere(_._1 == "fs") + 1
    assert(run(s"$fsIdx\nfirst\n/tmp/wh1\ny\nn\n", cfg)._1 == 0)
    // preset 1 = sql: keep every default (name "local", ${VAR} props),
    // make default, skip the connection test
    val (rc, out) = run("1\n\n\n\n\ny\nn\n", cfg)
    assert(rc == 0, out)
    assert(out.contains("A new catalog will be added alongside existing ones."))
    // ${VAR} placeholders are reported as env vars to set
    assert(out.contains("ICEBERG_CATALOG_URI=<your-value>"), out)
    val first = graft.meta.CatalogConfig.loadFile("first", cfg)
    val local = graft.meta.CatalogConfig.loadFile("local", cfg)
    assert(first.get("warehouse").contains("/tmp/wh1")) // untouched
    assert(local.get("type").contains("sql") &&
      local.get("uri").contains("${ICEBERG_CATALOG_URI}"))
    assert(graft.meta.CatalogConfig.defaultCatalogName(cfg).contains("local"))
  }

  test("invalid preset choice exits 2-free with code 1") {
    val cfg = Files.createTempDirectory("init-cfg3").resolve("cfg.json")
    val (rc, out) = run("99\n", cfg)
    assert(rc == 1 && out.contains("Invalid choice"))
    assert(!Files.exists(cfg)) // nothing written
  }
}
