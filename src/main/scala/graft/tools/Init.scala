package graft.tools

import java.io.{BufferedReader, PrintStream}
import java.nio.file.Path

import graft.meta.{CatalogConfig, Catalogs}

/** `init` — the reference CLI's interactive catalog setup (ref `cli.py`
  * `init`, 348-448): pick a preset, name the catalog, override the
  * per-property defaults, and merge the result into the config file with
  * `${VAR}` placeholders so secrets stay in the environment. Optionally
  * tests the connection through the SAME resolution chain every other
  * verb uses (config file + dotenv + env).
  *
  * IO is injectable (prompts read from `in`, everything prints to
  * `out`), so specs drive scripted sessions — the same pattern as
  * [[Tui]]. An empty answer keeps the shown default, mirroring the
  * reference's `typer.prompt(..., default=...)`.
  */
object Init {

  /** (key, description, property defaults) — adapted to THIS engine's
    * backends (ref `cli.py` `_PRESETS`): `sql` is plain JDBC, `glue`
    * needs region + signing credentials (see `Catalogs.forConfig`),
    * `fs` is the local filesystem warehouse the reference configures
    * through pyiceberg's file IO. */
  val Presets: Seq[(String, String, Seq[(String, String)])] = Seq(
    ("sql", "SQL catalog via JDBC  (local dev, CI, Derby/Postgres)", Seq(
      "type" -> "sql",
      "uri" -> "${ICEBERG_CATALOG_URI}",
      "warehouse" -> "${ICEBERG_WAREHOUSE}")),
    ("glue", "AWS Glue Data Catalog  (SigV4 credentials)", Seq(
      "type" -> "glue",
      "warehouse" -> "${ICEBERG_WAREHOUSE}",
      "region" -> "${AWS_REGION}",
      "access-key" -> "${AWS_ACCESS_KEY_ID}",
      "secret-key" -> "${AWS_SECRET_ACCESS_KEY}")),
    ("rest", "REST catalog  (Tabular, Polaris, or custom)", Seq(
      "type" -> "rest",
      "uri" -> "${ICEBERG_REST_URI}",
      "warehouse" -> "${ICEBERG_WAREHOUSE}")),
    ("hive", "Hive Metastore  (Thrift)", Seq(
      "type" -> "hive",
      "uri" -> "${HIVE_URI}",
      "warehouse" -> "${ICEBERG_WAREHOUSE}")),
    ("fs", "Local filesystem warehouse  (no network catalog)", Seq(
      "warehouse" -> "${ICEBERG_WAREHOUSE}")))

  private def prompt(
      in: BufferedReader, out: PrintStream,
      label: String, default: String): String = {
    out.print(s"$label [$default]: "); out.flush()
    Option(in.readLine()).map(_.trim).filter(_.nonEmpty).getOrElse(default)
  }

  private def confirm(
      in: BufferedReader, out: PrintStream,
      label: String, default: Boolean): Boolean = {
    val hint = if (default) "Y/n" else "y/N"
    out.print(s"$label [$hint]: "); out.flush()
    Option(in.readLine()).map(_.trim.toLowerCase).filter(_.nonEmpty) match {
      case Some(a) => a.startsWith("y")
      case None => default
    }
  }

  /** Run the setup dialog; returns the process exit code. */
  def run(in: BufferedReader, out: PrintStream,
      path: Path = CatalogConfig.defaultPath): Int = {
    out.println("iceberg-meta setup\n")
    if (java.nio.file.Files.exists(path)) {
      out.println(s"Config file found: $path")
      out.println("A new catalog will be added alongside existing ones.\n")
    }

    out.println("Choose your catalog type:\n")
    Presets.zipWithIndex.foreach { case ((_, desc, _), i) =>
      out.println(s"  ${i + 1}  $desc")
    }
    out.println()
    val choice = prompt(in, out, "Enter number", "1")
    val idx = scala.util.Try(choice.toInt - 1).getOrElse(-1)
    if (idx < 0 || idx >= Presets.size) {
      out.println(s"Invalid choice: $choice"); return 1
    }
    val (presetKey, _, defaults) = Presets(idx)

    val defaultName = if (presetKey == "sql") "local" else presetKey
    val name = prompt(in, out, "Catalog name", defaultName)

    out.println("\nThe config uses ${VAR} placeholders resolved from the environment.")
    out.println("Press Enter to keep each default, or type a value to override.\n")
    val props = defaults.map { case (k, d) =>
      k -> prompt(in, out, s"  $k", d)
    }.toMap

    val makeDefault = confirm(in, out, "\nSet as default catalog?", default = true)
    CatalogConfig.mergeConfigFile(name, props, makeDefault, path)
    out.println(s"\nSaved to $path")

    val placeholders = props.valuesIterator.filter(_.contains("${")).toSeq
    if (placeholders.nonEmpty) {
      out.println("\nSet these environment variables (in .env or your shell):\n")
      placeholders.foreach { v =>
        out.println(s"  ${v.replace("${", "").replace("}", "")}=<your-value>")
      }
      out.println("\nTip: place a .env file in your working directory — " +
        "it is loaded automatically.")
    }

    out.println()
    if (confirm(in, out, "Test the connection now?", default = true)) {
      try {
        val cfg = CatalogConfig.resolveFromFile(name, path = path)
        val cat = Catalogs.forConfig(cfg)
        val ns = cat.listNamespaces().size
        val tbl = cat.listTables().size
        out.println(s"\nConnected!  Found $ns namespace${if (ns != 1) "s" else ""}, " +
          s"$tbl table${if (tbl != 1) "s" else ""}")
      } catch {
        case e: Exception =>
          out.println(s"\nConnection failed: ${e.getMessage}")
          out.println("This is normal if the environment variables aren't set yet.\n" +
            "Set them and run the doctor verb to verify.")
      }
    }

    out.println("\nNext steps:\n" +
      "  list-tables       Discover tables\n" +
      "  tui               Interactive browser\n" +
      "  doctor            Verify config & connection")
    0
  }
}
