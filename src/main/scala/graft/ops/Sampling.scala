package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.PortableHash

/** Deterministic, content-keyed sampling and dataset splitting for corpus
  * curation. Everything is a map-side filter/projection on the portable
  * 32-bit md5 hash of a key column ([[PortableHash]]) — no RNG state, no
  * shuffle, reproducible across runs, engines and partitionings, and a
  * given document always lands in the same sample/split no matter how the
  * corpus is re-partitioned or re-processed (the property `rand()`-based
  * sampling loses).
  */
object Sampling {

  /** 2^32 — the portable hash's value range. */
  private val Range32 = 4294967296L

  private def threshold(fraction: Double): Long = (fraction * Range32).toLong

  /** Keep ~`fraction` of rows, chosen by key hash (deterministic). */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0)
    df.filter(PortableHash.md5Hash32(key) < lit(threshold(fraction)))
  }

  /** Per-stratum sampling rates (e.g. per language): strata not in the map
    * use `defaultFraction`. One literal-map lookup + filter — no join. */
  def stratifiedSample(df: DataFrame, strata: Column, key: Column,
      fractions: Map[String, Double], defaultFraction: Double = 0.0): DataFrame = {
    val thrMap = fractions.map { case (k, f) => k -> threshold(f) }
    df.filter(PortableHash.md5Hash32(key) <
      coalesce(element_at(typedLit(thrMap), strata), lit(threshold(defaultFraction))))
  }

  /** Integer bucket thresholds (out of 10000) for cumulative weights —
    * shared with oracle generation so both engines bucket identically. */
  def splitThresholds(weights: Seq[(String, Double)]): Seq[(String, Long)] = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    var cum = 0.0
    weights.map { case (name, w) => cum += w; name -> (cum * 10000).toLong }
  }

  /** Deterministic SHARDING for training export: each row gets
    * `(shard, shard_pos)` — `shard` = 60-bit key hash mod `nShards`
    * (stable under any repartitioning), `shard_pos` = the row's rank by
    * hash within its shard. Hash order is pseudo-random but
    * reproducible, so this doubles as the global pre-training shuffle:
    * writing shards out in `shard_pos` order yields the same shuffled
    * dataset on every run and engine (what `rand()` ordering cannot).
    * One window shuffle partitioned by shard — each shard's rank sort
    * is distributed across executors, never a global single-partition
    * sort. Ties (hash collisions) break on the key's string form. */
  def shardAssign(df: DataFrame, key: Column, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__h"), col("__k"))
    df.withColumn("__h", PortableHash.md5Hash60(key))
      .withColumn("__k", key.cast("string"))
      .withColumn("shard", (col("__h") % nShards).cast("int"))
      .withColumn("shard_pos", (row_number().over(w) - 1).cast("long"))
      .drop("__h", "__k")
  }

  /** Deterministic fixed-SIZE sample per stratum (the reservoir-sampling
    * use case, made reproducible): every row gets a hash priority from its
    * key and the k smallest-priority rows of each stratum survive, with
    * `sample_rank` (1-based) recording the priority order. Equivalent to
    * a uniform k-reservoir per group but stable across runs, engines and
    * partitionings — adding rows can only displace, never reshuffle, the
    * survivors. One window shuffle partitioned by stratum; each group's
    * rank sort is a per-partition top-k, never a global sort. Ties break
    * on the key's string form. */
  def prioritySample(df: DataFrame, strata: Column, key: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__s").orderBy(col("__p"), col("__k"))
    df.withColumn("__s", strata)
      .withColumn("__p", PortableHash.md5Hash60(key))
      .withColumn("__k", key.cast("string"))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
      .drop("__s", "__p", "__k")
  }

  /** CLUSTER-BALANCED downsampling: cap every LEARNED kmeans cluster at
    * `cap` members by hash priority — the diversity-preserving sample
    * (a dominant topic cluster cannot crowd out the tail; DoReMi/
    * cluster-balanced selection shape). The clustering is the
    * deterministic integer-quantized Lloyd of [[Clustering.kmeans]];
    * the per-cluster cap is [[prioritySample]]'s stable hash reservoir.
    * One narrow iteration shuffle per Lloyd round + one window shuffle
    * keyed by cluster — embeddings never collect. */
  def clusterBalancedSample(emb: DataFrame, k: Int, iters: Int,
      cap: Int): DataFrame = {
    val model = Clustering.kmeans(emb, k, iters)
    prioritySample(model.assignments,
      col("cluster"), col("vec_id").cast("string"), cap)
      .select(col("cluster").cast("int").as("cluster"),
        col("sample_rank"), col("vec_id"))
      .orderBy("cluster", "sample_rank")
  }

  /** Add a `split` column assigning each row to train/val/test (or any
    * weighted partition) by hash bucket — deterministic and stable under
    * re-partitioning. */
  def assignSplit(df: DataFrame, key: Column, weights: Seq[(String, Double)]): DataFrame = {
    val thrs = splitThresholds(weights)
    val bucket = PortableHash.md5Hash32(key) % 10000
    val assigned = thrs.init.foldRight(lit(thrs.last._1): Column) { case ((name, t), other) =>
      when(bucket < t, name).otherwise(other)
    }
    df.withColumn("split", assigned)
  }

  /** CROSS-SPLIT LEAKAGE CHECK — the eval-contamination audit a
    * hash-keyed split needs: splitting on `key` (typically the doc id)
    * keeps each ROW in exactly one split, but the same CONTENT can
    * appear under several ids — and then train and test share text.
    * Groups rows by a content `fingerprint` (the canonical exact-dup
    * digest, a prefix digest, a minhash band signature — any
    * deterministic column), assigns splits with [[assignSplit]]'s exact
    * bucketing, and reports per group-column: `dup_groups` (fingerprint
    * groups with >1 row), `leak_groups` (those spanning >1 split), and
    * `leaked_docs` (rows inside leaking groups).
    *
    * Scale shape: fingerprint and split are both computed map-side; the
    * single wide shuffle carries `(group, fingerprint)` pairs — never
    * text — into a map-side-combinable aggregation, then a second agg
    * over the group-sized frame. The same shape as exact dedup, with
    * the split census riding the digest key. */
  def splitLeakage(
      df: DataFrame,
      key: Column,
      weights: Seq[(String, Double)],
      fingerprint: Column,
      groupCol: String = "lang"): DataFrame = {
    assignSplit(df, key, weights)
      .select(col(groupCol), fingerprint.as("fp"), col("split"))
      .groupBy(col(groupCol), col("fp"))
      .agg(countDistinct(col("split")).as("n_splits"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("dup_groups"),
        sum(when(col("n_splits") > 1, 1L).otherwise(0L)).as("leak_groups"),
        sum(when(col("n_splits") > 1, col("n_docs")).otherwise(0L)).as("leaked_docs"))
      .orderBy(groupCol)
  }
}
