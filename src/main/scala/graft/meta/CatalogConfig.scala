package graft.meta

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/** Catalog configuration resolution (ref `catalog.py:26-142`): typed
  * config with priority explicit args > `ICEBERG_META_*` environment
  * overrides > config-file values, plus `${VAR}` placeholder
  * expansion (ref `catalog.py:60-96`).
  */
final case class CatalogConfig(
    name: String,
    uri: Option[String],
    warehouse: Option[String],
    properties: Map[String, String] = Map.empty)

object CatalogConfig {

  private val Placeholder = """\$\{([A-Za-z_][A-Za-z0-9_]*)\}""".r

  /** `${VAR}` → environment value (empty when unset — ref
    * `catalog.py:70-76`). */
  def expand(value: String, env: Map[String, String] = sys.env): String =
    Placeholder.replaceAllIn(value, m =>
      java.util.regex.Matcher.quoteReplacement(env.getOrElse(m.group(1), "")))

  /** Resolve with the reference's priority: CLI/API args beat
    * `ICEBERG_META_URI`/`ICEBERG_META_WAREHOUSE` env, which beat the
    * config-file map (ref `catalog.py:90-96,99-142`). */
  def resolve(
      name: String,
      uriArg: Option[String] = None,
      warehouseArg: Option[String] = None,
      fileConfig: Map[String, String] = Map.empty,
      env: Map[String, String] = sys.env): CatalogConfig = {
    def pick(arg: Option[String], envKey: String, fileKey: String): Option[String] =
      arg
        .orElse(env.get(envKey))
        .orElse(fileConfig.get(fileKey).map(expand(_, env)))
        .filter(_.nonEmpty)
    CatalogConfig(
      name = name,
      uri = pick(uriArg, "ICEBERG_META_URI", "uri"),
      warehouse = pick(warehouseArg, "ICEBERG_META_WAREHOUSE", "warehouse"),
      properties = fileConfig.view
        .filterKeys(k => k != "uri" && k != "warehouse")
        .mapValues(expand(_, env)).toMap)
  }

  /** Default config-file location — the JSON-subset analog of the
    * reference's `~/.iceberg-meta.yaml` (ref `catalog.py:60-66`). */
  def defaultPath: Path =
    Paths.get(sys.props.getOrElse("user.home", "."), ".iceberg-meta.json")

  /** Load one catalog's entry from the config file. Accepts either the
    * reference's nested shape `{"catalogs": {"<name>": {...}}}`
    * (ref `catalog.py:78-87`) or a flat `{key: value}` object applying to
    * any catalog name. A missing file or entry is Map.empty — absent
    * config is not an error (ref `catalog.py:62-64`). */
  def loadFile(name: String, path: Path = defaultPath): Map[String, String] = {
    if (!Files.exists(path)) Map.empty
    else {
      val n = new ObjectMapper().readTree(Files.readString(path))
      val entry = if (n.has("catalogs")) n.path("catalogs").path(name) else n
      if (entry.isMissingNode || !entry.isObject) Map.empty
      else entry.properties().asScala
        .filter(_.getValue.isValueNode)
        .map(e => e.getKey -> e.getValue.asText()).toMap
    }
  }

  /** File-backed resolve: reads `path`, then applies the usual
    * arg > env > file priority chain. The environment auto-includes a
    * `.env` from the working directory (shell variables win) — the
    * reference's python-dotenv behavior; pass `env` explicitly to
    * override. */
  def resolveFromFile(
      name: String,
      uriArg: Option[String] = None,
      warehouseArg: Option[String] = None,
      path: Path = defaultPath,
      env: Map[String, String] = envWithDotEnv()): CatalogConfig =
    resolve(name, uriArg, warehouseArg, loadFile(name, path), env)

  /** The config file's `default_catalog` entry, if present — what an
    * unnamed invocation resolves to (ref `catalog.py` default-catalog
    * handling; written by `init`). */
  def defaultCatalogName(path: Path = defaultPath): Option[String] = {
    if (!Files.exists(path)) None
    else {
      val n = new ObjectMapper().readTree(Files.readString(path))
        .path("default_catalog")
      if (n.isTextual) Some(n.asText()) else None
    }
  }

  /** Add or update ONE catalog entry in the config file without touching
    * the others — the write half of `init` (ref `catalog.py:206-219`
    * `merge_config_file`). The first catalog written (or
    * `makeDefault = true`) becomes `default_catalog`. */
  def mergeConfigFile(
      name: String,
      props: Map[String, String],
      makeDefault: Boolean = false,
      path: Path = defaultPath): Path = {
    val om = new ObjectMapper()
    val root: com.fasterxml.jackson.databind.node.ObjectNode =
      if (Files.exists(path))
        om.readTree(Files.readString(path)) match {
          case o: com.fasterxml.jackson.databind.node.ObjectNode => o
          case _ => om.createObjectNode()
        }
      else om.createObjectNode()
    val entry = om.createObjectNode()
    props.toSeq.sortBy(_._1).foreach { case (k, v) => entry.put(k, v); () }
    root.withObject("/catalogs").set(name, entry)
    if (makeDefault || !root.path("default_catalog").isTextual)
      root.put("default_catalog", name)
    Option(path.getParent).foreach(Files.createDirectories(_))
    Files.writeString(path,
      om.writerWithDefaultPrettyPrinter().writeValueAsString(root))
    path
  }

  /** Parse a dotenv-format file (ref: the reference auto-loads `.env`
    * via python-dotenv, `docs/configuration.md` "`.env` file support"):
    * `KEY=VALUE` lines, `#` comments, optional `export ` prefix,
    * single/double quotes stripped, blank lines ignored. Missing file →
    * empty map (absence is not an error, matching the reference). */
  def loadDotEnv(path: Path = Paths.get(".env")): Map[String, String] = {
    if (!Files.exists(path)) Map.empty
    else Files.readAllLines(path).asScala.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains('='))
      .map(l => if (l.startsWith("export ")) l.stripPrefix("export ").trim else l)
      .flatMap { l =>
        val i = l.indexOf('=')
        val k = l.take(i).trim
        var v = l.drop(i + 1).trim
        if (v.length >= 2 &&
            ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
          v = v.substring(1, v.length - 1)
        if (k.matches("[A-Za-z_][A-Za-z0-9_]*")) Some(k -> v) else None
      }.toMap
  }

  /** The environment the reference resolves against: dotenv values with
    * already-exported shell variables taking precedence (standard dotenv
    * behavior, ref `docs/configuration.md`). */
  def envWithDotEnv(
      envFile: Option[Path] = None,
      env: Map[String, String] = sys.env): Map[String, String] =
    loadDotEnv(envFile.getOrElse(Paths.get(".env"))) ++ env
}
