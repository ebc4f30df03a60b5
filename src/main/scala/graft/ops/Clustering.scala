package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._

import graft.expr.VecDot

/** Deterministic Lloyd k-means over an `array<float>` embedding column —
  * the clustering step of a training-data curation pipeline (corpus
  * balancing, IVF coarse-quantizer training; the reference has no
  * clustering, this is north-star surface).
  *
  * Scale design: the ASSIGNMENT is a map-side argmin over k broadcast
  * centroid literals using the native [[graft.expr.VecDot]] codegen kernel
  * (`argmin_c  -2·v⋅c + |c|²` — no shuffle, no explode, no per-row k×dim
  * lambda interpretation); the UPDATE is one (cluster, dim) integer
  * aggregate per iteration (map-side combinable, shuffles k×dim longs);
  * per iteration the k×dim centroid matrix is driver-collected and
  * re-broadcast — the same loop structure Spark MLlib's KMeans uses.
  *
  * Determinism (engine-exact, DuckDB-oracle-reproducible):
  *   - centroid sums are integer-quantized (`floor(x·quant)` as long), so
  *     aggregation order cannot perturb them;
  *   - distances use the sequential VecDot fold and driver-computed
  *     `|c|²` folds (ascending index order both engines);
  *   - argmin ties break on the lower cluster id via struct ordering.
  */
object Clustering {

  final case class KmeansModel(centroids: Seq[Seq[Double]], assignments: DataFrame)

  /** Census of [[kmeans]] invocations — the persisted-index specs assert
    * a probe/admit run never re-clusters ([[AnnIndex]]'s contract). */
  private[graft] val kmeansRuns = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Iteration count of the LATEST [[kmeans]] run — the rebuild specs
    * assert `AnnIndex.rebuild` retrains at the PERSISTED bootstrap depth
    * instead of a default-constructed handle's. */
  private[graft] val lastKmeansIters =
    new java.util.concurrent.atomic.AtomicInteger(-1)

  private def dot(v: Column, c: Column): Column =
    GraftColumnBridge.column(VecDot(
      GraftColumnBridge.expression(v), GraftColumnBridge.expression(c)))

  /** Tag each row with its nearest centroid's index: map-side argmin via
    * `array_min` over (score, id) structs — ties take the lower id. */
  def assign(emb: DataFrame, centroids: Seq[Seq[Double]]): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    val scored = centroids.zipWithIndex.map { case (cv, j) =>
      // |v|² is constant per row, so argmin over -2·v⋅c + |c|² equals
      // argmin over the true squared distance
      val normSq = cv.foldLeft(0.0)((a, x) => a + x * x)
      struct(
        (lit(-2.0) * dot(col("embedding"), typedLit(cv)) + lit(normSq)).as("d"),
        lit(j).as("c"))
    }
    emb.withColumn("cluster", array_min(array(scored: _*)).getField("c"))
  }

  /** Per-(cluster, dim) integer-quantized member sums + counts; `dim` is
    * 1-based. One narrow aggregate — the only shuffle of the iteration. */
  def quantizedSums(assigned: DataFrame, quant: Double = 1e6): DataFrame =
    assigned
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("cluster"), (col("pos") + 1).as("dim"),
        floor(col("x").cast("double") * quant).cast("long").as("q"))
      .groupBy("cluster", "dim")
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("cnt"))

  /** Driver-side centroid recompute from the collected quantized sums
    * (k×dim rows). A cluster that lost all members keeps its previous
    * centroid. */
  private def updateCentroids(
      assigned: DataFrame, prev: Seq[Seq[Double]], quant: Double): Seq[Seq[Double]] = {
    val byCluster = quantizedSums(assigned, quant).collect()
      .map(r => (r.getAs[Int]("cluster"), r.getAs[Int]("dim"),
        r.getAs[Long]("sq"), r.getAs[Long]("cnt")))
      .groupBy(_._1)
    prev.zipWithIndex.map { case (old, j) =>
      byCluster.get(j) match {
        case Some(rows) =>
          rows.sortBy(_._2).map { case (_, _, sq, cnt) =>
            sq.toDouble / (cnt * quant)
          }.toSeq
        case None => old
      }
    }
  }

  /** `iters` assignment rounds with `iters - 1` centroid updates between
    * them; initial centroids are the k lowest-id vectors. */
  def kmeans(emb: DataFrame, k: Int, iters: Int, quant: Double = 1e6): KmeansModel = {
    require(k >= 1 && iters >= 1)
    kmeansRuns.incrementAndGet()
    lastKmeansIters.set(iters)
    val idCol = emb.columns.head // vec_id by convention
    var cents: Seq[Seq[Double]] = emb.orderBy(idCol).limit(k)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    var assigned = assign(emb, cents)
    (1 until iters).foreach { _ =>
      cents = updateCentroids(assigned, cents, quant)
      assigned = assign(emb, cents)
    }
    KmeansModel(cents, assigned)
  }

  /** Per-cluster summary of a finished model: member count plus an
    * integer checksum of the quantized member sums (order-independent,
    * engine-exact) — the oracle-friendly digest of the centroid. */
  def clusterStats(model: KmeansModel, quant: Double = 1e6): DataFrame = {
    val P = 1000000007L
    // both aggregates re-derive the assignment projection (k dot
    // products per row) — materialize it once and share
    val assigned = model.assignments.localCheckpoint()
    val sizes = assigned.groupBy("cluster").agg(count(lit(1)).as("n_vecs"))
    val fp = quantizedSums(assigned, quant)
      .groupBy("cluster")
      .agg((sum((col("sq") % P) * col("dim")) % P).as("centroid_fp"))
    sizes.join(fp, "cluster").orderBy("cluster")
  }
}
