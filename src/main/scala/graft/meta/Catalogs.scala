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

object Catalogs {

  /** Catalog types the reference supports through pyiceberg; everything
    * except the filesystem warehouse needs network access. */
  val NetworkBackends: Set[String] = Set("rest", "sql", "glue", "hive")

  /** Build a catalog from resolved [[CatalogConfig]]: a `warehouse` path
    * (with no network `type`) yields [[FsCatalog]]; a network backend
    * raises `UnsupportedOperationException` with the backend named, which
    * [[graft.api.Errors]] maps to a friendly message. */
  def forConfig(cfg: CatalogConfig): MetaCatalog = {
    val backend = cfg.properties.get("type")
      .orElse(cfg.uri.map(u => u.takeWhile(_ != ':')))
      .map(_.toLowerCase)
    backend match {
      case Some(b) if NetworkBackends.contains(b) || b == "thrift" || b == "http" || b == "https" =>
        throw new UnsupportedOperationException(
          s"catalog backend '$b' needs network access; configure a filesystem " +
            "warehouse path, or plug a network MetaCatalog implementation in")
      case _ =>
        val wh = cfg.warehouse.getOrElse(throw new IllegalArgumentException(
          s"catalog '${cfg.name}' resolves to no warehouse path"))
        new FsCatalog(wh)
    }
  }
}
