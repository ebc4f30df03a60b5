package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.meta.{IcebergTable, TableWriter}

/** Row-level DELETE, COPY-ON-WRITE mode (Iceberg
  * `write.delete.mode=copy-on-write`): rewrite exactly the files that
  * hold matching rows, without those rows, as one `replace` snapshot.
  * The merge-on-read twin is [[graft.meta.TableWriter.deleteWhere]]
  * (position-delete files, no rewrite); copy-on-write costs the rewrite
  * up front but leaves the table delete-free — which keeps the bare
  * file-scan read paths (the SQL catalog's vectorized scan) valid, so
  * it is the mode behind SQL `DELETE FROM`.
  *
  * Scale shape: one distributed predicate scan over the merge-on-read
  * lineage view emits only the DISTINCT matching file paths (driver gets
  * a metadata-scale path list, like any scan-planning step); one
  * distributed rewrite of exactly those files; untouched files carry
  * forward. SQL semantics: rows delete where the predicate is TRUE;
  * FALSE and NULL rows survive. */
object Delete {

  def copyOnWrite(
      spark: SparkSession,
      tableDir: String,
      predicate: Column): Option[TableWriter.CommitResult] = {
    val t = IcebergTable.load(tableDir)
    if (t.files().isEmpty) return None

    // deletes are applied BEFORE the predicate (lineage view), so
    // already-deleted rows can neither match nor resurrect
    val matchedRel = ScanPlanner.readTableLineage(spark, t)
      .filter(predicate)
      .select("__gr_path").distinct()
      .collect().map(_.getString(0)).toSet
    if (matchedRel.isEmpty) return None

    val matchedAbs = t.files()
      .filter(e => matchedRel.contains(e.filePath))
      .map(e => t.resolvePath(e.filePath))
    val survivors = ScanPlanner.readFiles(spark, t, matchedAbs)
      .filter(not(coalesce(predicate, lit(false))))
    Some(TableWriter.replaceFiles(spark, tableDir, matchedRel, survivors,
      carryDeletes = t.deleteFiles().nonEmpty))
  }
}
