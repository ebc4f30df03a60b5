package graft.meta

import java.nio.file.Paths

/** A loaded Iceberg table: metadata document + snapshot-pinned manifest
  * access (ref `catalog.py:145-161` table load; `formatters.py:193-206`,
  * `:263-267` snapshot-pinned scans — the time-travel analog of partition
  * pruning: only the requested snapshot's manifest list is read).
  */
final class IcebergTable(val tableDir: String, val metadata: TableMetadata) {

  private def resolve(p: String): String =
    if (Paths.get(p).isAbsolute) p else s"$tableDir/$p"

  /** Manifest-list entries of a snapshot (default: current). */
  def manifests(snapshotId: Option[Long] = None): Seq[ManifestFile] = {
    val snap = snapshotId.map(id =>
        metadata.snapshot(id).getOrElse(
          throw new NoSuchElementException(s"Snapshot $id not found")))
      .orElse(metadata.currentSnapshot)
    snap.map(s => AvroManifests.readManifestList(resolve(s.manifestList)))
      .getOrElse(Seq.empty)
  }

  /** Live data-file entries of a snapshot: all manifests' entries with
    * status existing(0)/added(1); deleted(2) entries are dropped
    * (ref `tbl.inspect.files`, `formatters.py:263-281`). */
  def files(snapshotId: Option[Long] = None): Seq[DataFileEntry] =
    manifests(snapshotId)
      .filter(_.content == 0)
      .flatMap(m => AvroManifests.readManifest(resolve(m.manifestPath)))
      .filter(_.status != 2)

  /** All manifest entries (incl. deletes) of one manifest file — the lazy
    * TUI tree path (ref `formatters.py:1266-1279`). */
  def manifestEntries(manifestPath: String): Seq[DataFileEntry] =
    AvroManifests.readManifest(resolve(manifestPath))
}

object IcebergTable {
  /** Load a table directory laid out as `<dir>/metadata/v*.metadata.json`. */
  def load(tableDir: String): IcebergTable =
    new IcebergTable(tableDir, IcebergMeta.load(tableDir))
}
