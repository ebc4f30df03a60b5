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
    * SINGLE-PASS over ALL columns: one table scan projects every
    * column's hash (posexplode to `(column_index, hash)`), a map-side
    * bounded bottom-k dedups WITHIN each input partition (at most
    * k·cols hashes leave any partition — an ANALYZE of a 20-column
    * 100 TB table reads the table once, not twenty times), and the
    * global merge (distinct + per-column `row_number ≤ k`) runs over
    * ≤ k·cols·partitions 8-byte hashes — metadata-scale. The result is
    * value-identical to a per-column bottom-k (dedup order can't change
    * which k distinct hashes are smallest). */
  def kmvSketch(df: DataFrame, cols: Seq[String], k: Int = 256): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    require(cols.nonEmpty, "kmvSketch needs at least one column")
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df
      .select(posexplode(array(cols.map(c =>
        when(col(c).isNotNull,
          PortableHash.md5Hash60(col(c).cast("string")))): _*)).as(Seq("ci", "h")))
      .where(col("h").isNotNull)
      .as[(Int, Long)]
    val nCols = cols.length
    val kk = k
    val local = pairs.mapPartitions { it =>
      // one bounded ordered set per column: ≤ k distinct hashes kept
      val sets = Array.fill(nCols)(new java.util.TreeSet[java.lang.Long]())
      it.foreach { case (ci, h) =>
        val s = sets(ci)
        if (s.size < kk) s.add(h)
        else if (h < s.last && s.add(h)) s.pollLast()
      }
      sets.iterator.zipWithIndex.flatMap { case (s, ci) =>
        scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
          .asScala.map(h => (ci, h.longValue()))
      }
    }.toDF("ci", "h")
    // global merge: dedup across partitions, true bottom-k per column
    val winK = org.apache.spark.sql.expressions.Window
      .partitionBy("ci").orderBy("h")
    val merged = local.distinct()
      .withColumn("rn", row_number().over(winK))
      .where(col("rn") <= k)
      .groupBy("ci")
      .agg(count(lit(1)).as("n_sketch"), max(col("h")).as("kth_min0"))
    // reinstate all-null columns (no surviving hash → no group row)
    val allCols = spark.createDataFrame(
      cols.indices.map(i => Tuple1(i))).toDF("ci")
    val nameByCi = array(cols.map(lit): _*)
    allCols.join(merged, Seq("ci"), "left")
      .select(
        element_at(nameByCi, col("ci") + 1).as("column_name"),
        coalesce(col("n_sketch"), lit(0L)).as("n_sketch"),
        coalesce(col("kth_min0"), lit(0L)).as("kth_min"),
        coalesce(
          when(col("n_sketch") < k, col("n_sketch"))
            .otherwise(floor(
              lit((k - 1).toDouble) * lit(HashRange.toDouble) /
                col("kth_min0").cast("double")).cast("long")),
          lit(0L)).as("ndv_est"))
      .orderBy("column_name")
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

  /** ANALYZE TABLE: KMV-estimate NDV for every top-level column in ONE
    * table scan ([[kmvSketch]] sketches all columns per pass) and persist
    * `graft.stats.ndv.<col>` table properties plus the analyzed snapshot
    * id in a metadata-only commit. The DSv2 scan reports these to
    * Catalyst as `distinctCount`. */
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
    val (md, baseV) = IcebergMeta.loadVersioned(tableDir)
    val props = md.properties ++
      sketch.map { case (c, n) => s"graft.stats.ndv.$c" -> n.toString } +
      ("graft.stats.analyzed-snapshot" -> snapId.toString)
    val v = baseV + 1
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
