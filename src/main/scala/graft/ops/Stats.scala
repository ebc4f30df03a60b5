package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.PortableHash
import graft.meta.{IcebergMeta, IcebergTable}

/** Column statistics at 100 TB: exact `COUNT(DISTINCT c)` is a full
  * shuffle of every distinct value; a KMV (k-minimum-values) sketch gets
  * within a few percent with a shuffle of AT MOST k 8-byte hashes per
  * partition. The estimator is the classic bottom-k one (Bar-Yossef et
  * al. 2002; the same family HyperLogLog refines): hash values uniformly
  * into [0, M), keep the k smallest DISTINCT hashes; if fewer than k
  * exist the sketch IS the exact count, otherwise
  * `ndv ≈ (k-1) * M / h_k` where `h_k` is the k-th smallest hash.
  *
  * The hash is the engine-portable md5 fold ([[PortableHash]]), so the
  * whole sketch — including the estimate — is bit-reproducible in DuckDB
  * and oracle-verified (`q_ndv_sketch`), unlike approx_count_distinct
  * whose HLL internals no second engine reproduces.
  *
  * [[analyzeTable]] persists the estimates as table properties
  * (`graft.stats.ndv.<col>`) in a metadata-only commit — the ANALYZE
  * TABLE twin — and the DSv2 scan surfaces them to Catalyst as
  * per-column `distinctCount` ([[graft.sql.GraftFileScan]]), where CBO
  * join planning can use them.
  */
object Stats {

  /** 2^60 — the portable hash's range ([[PortableHash.md5Hash60]]). */
  val HashRange: Long = 1L << 60

  /** One KMV sketch row per column: `(column_name, n_sketch, kth_min,
    * ndv_est)`, ordered by column name. Columns are hashed through their
    * CANONICAL STRING form (cast to string) — restrict to string /
    * integral columns when cross-engine verification matters (float
    * rendering differs between engines).
    *
    * Plan shape per column: partial-aggregated `distinct` over the
    * 8-byte hash, then `TakeOrdered(k)` — the shuffle carries hashes,
    * never values. */
  def kmvSketch(df: DataFrame, cols: Seq[String], k: Int = 256): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val perCol = cols.map { c =>
      val hashes = df
        .where(col(c).isNotNull)
        .select(PortableHash.md5Hash60(col(c).cast("string")).as("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
      hashes.agg(
        count(lit(1)).as("n_sketch"),
        max(col("h")).as("kth_min"))
        .select(
          lit(c).as("column_name"),
          col("n_sketch"),
          coalesce(col("kth_min"), lit(0L)).as("kth_min"),
          when(col("n_sketch") < k, col("n_sketch"))
            .otherwise(floor(
              lit((k - 1).toDouble) * lit(HashRange.toDouble) /
                col("kth_min").cast("double")).cast("long"))
            .as("ndv_est"))
    }
    perCol.reduce(_.unionAll(_)).orderBy("column_name")
  }

  /** DuckDB SQL computing one [[kmvSketch]] row for `colExpr` — the
    * oracle twin (same hash, same estimator, explicit DOUBLE casts so
    * both engines run the identical IEEE arithmetic). */
  def kmvOracleSql(table: String, colName: String, k: Int = 256): String = {
    val h = PortableHash.duckDbMd5Number(s"CAST($colName AS VARCHAR)", 15)
    s"""SELECT '$colName' AS column_name, count(*) AS n_sketch,
       |  coalesce(max(h), 0) AS kth_min,
       |  CASE WHEN count(*) < $k THEN count(*)
       |       ELSE CAST(floor(${(k - 1).toDouble} * ${HashRange.toDouble} /
       |                 CAST(max(h) AS DOUBLE)) AS BIGINT) END AS ndv_est
       |FROM (SELECT DISTINCT $h AS h FROM $table
       |      WHERE $colName IS NOT NULL ORDER BY h LIMIT $k)""".stripMargin
  }

  final case class AnalyzeResult(
      ndv: Map[String, Long], snapshotId: Long, metadataVersion: Int)

  /** ANALYZE TABLE: KMV-estimate NDV for every top-level column (one
    * sketch job per column) and persist `graft.stats.ndv.<col>` table
    * properties plus the analyzed snapshot id in a metadata-only commit.
    * The DSv2 scan reports these to Catalyst as `distinctCount`. */
  def analyzeTable(
      spark: SparkSession, tableDir: String, k: Int = 1024): AnalyzeResult = {
    val t = IcebergTable.load(tableDir)
    val snapId = t.metadata.currentSnapshotId.getOrElse(
      throw new IllegalStateException(s"$tableDir has no snapshots to analyze"))
    val df = ScanPlanner.readTable(spark, t)
    val fields = t.metadata.currentSchema.fields.filter(f => !f.path.contains('.'))
    val sketch = kmvSketch(df, fields.map(_.name), k)
      .select("column_name", "ndv_est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val md = IcebergMeta.load(tableDir)
    val props = md.properties ++
      sketch.map { case (c, n) => s"graft.stats.ndv.$c" -> n.toString } +
      ("graft.stats.analyzed-snapshot" -> snapId.toString)
    val cur = IcebergMeta.latestMetadataPath(tableDir)
    val v = cur.getFileName.toString.stripPrefix("v")
      .stripSuffix(".metadata.json").toInt + 1
    IcebergMeta.publish(
      java.nio.file.Paths.get(tableDir, "metadata", s"v$v.metadata.json"),
      IcebergMeta.render(md.copy(
        lastUpdatedMs = System.currentTimeMillis(), properties = props)))
    AnalyzeResult(sketch, snapId, v)
  }

  /** Stored NDV estimates (empty if the table was never analyzed). */
  def storedNdv(t: IcebergTable): Map[String, Long] =
    t.metadata.properties.collect {
      case (k, v) if k.startsWith("graft.stats.ndv.") =>
        k.stripPrefix("graft.stats.ndv.") -> v.toLong
    }
}
