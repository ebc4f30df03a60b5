package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.PortableHash

/** Data selection for training pipelines: rank raw documents by how much
  * they resemble a target distribution, in the style of DSIR (Xie et al.
  * 2023, "Data Selection for Language Models via Importance Resampling").
  *
  * DSIR scores a raw document by the likelihood ratio
  * p_target(x)/p_raw(x) under hashed n-gram bag models. The statistic
  * here is the same ratio over a document's hashed-bigram bag, computed
  * with pure integer arithmetic (wide products go through DECIMAL(38,0) —
  * exact, and bit-identical to DuckDB's HUGEINT — and one integral
  * division per document), so scores reproduce exactly on any engine and
  * under any row order: no log-space float accumulation.
  */
object Selection {

  /** Hashed-bigram target affinity: for each doc,
    * `affinity_milli = 1000 · (Σ_b c_b·n_t(b)) · R / ((Σ_b c_b·n_r(b)) · T)`
    * where `c_b` is the doc's count of feature bucket `b`, `n_t`/`n_r`
    * the target/raw corpus counts of that bucket, and `T`/`R` their
    * totals — the doc's mean target-vs-raw likelihood ratio in permille.
    * 1000 ≈ typical; above = target-like, below = off-target.
    *
    * Scale shape: each document's feature bag is ONE codegen kernel pass
    * ([[graft.expr.BucketBagKernel]] — hashed-bigram bucket histogram),
    * so the explode fodder is distinct buckets per doc, not one row per
    * bigram occurrence. The bucket count table is bounded by `buckets`,
    * so it BROADCASTS into the count-weighted per-doc scoring join — no
    * shuffle of the corpus by feature; the totals are a 1-row broadcast,
    * and the per-doc aggregation is map-side combinable. The text never
    * shuffles; the wide rows are `(doc_id, bucket, count)` triples.
    *
    * @param target a boolean Column over `docs` rows marking the target
    *               distribution (must select ≥1 bigram, or the
    *               ratio's denominator is zero and ANSI mode throws) */
  def targetAffinity(docs: DataFrame, target: Column,
      buckets: Int = 4096): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    import org.apache.spark.sql.GraftColumnBridge
    val feats = docs
      .select(col("doc_id"), target.as("is_t"),
        explode(GraftColumnBridge.column(graft.expr.HashedBigramBuckets(
          GraftColumnBridge.expression(col("text")), buckets))).as("f"))
      .select(col("doc_id"), col("is_t"),
        col("f.b").as("b"), col("f.c").as("c"))
    val table = feats.groupBy("b").agg(
      sum(col("c")).as("n_r"),
      sum(when(col("is_t"), col("c")).otherwise(0L)).as("n_t"))
    val totals = table.agg(sum("n_r").as("tot_r"), sum("n_t").as("tot_t"))
    feats.join(broadcast(table), "b")
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_feats"),
        sum(col("n_t") * col("c")).as("s_t"),
        sum(col("n_r") * col("c")).as("s_r"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("n_feats"), expr(
        "CAST(s_t AS DECIMAL(38,0)) * CAST(tot_r AS DECIMAL(38,0)) * 1000 div " +
          "(CAST(s_r AS DECIMAL(38,0)) * CAST(tot_t AS DECIMAL(38,0)))")
        .as("affinity_milli"))
      .orderBy("doc_id")
  }
}
