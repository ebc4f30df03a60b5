package graft.meta

/** Catalog configuration resolution (ref `catalog.py:26-142`): typed
  * config with priority explicit args > `ICEBERG_META_*` environment
  * overrides > config-map (file) values, plus `${VAR}` placeholder
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
}
