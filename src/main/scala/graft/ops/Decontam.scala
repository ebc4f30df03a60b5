package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/test decontamination — the benchmark-leakage check every
  * training-data pipeline runs before a model sees the corpus: for each
  * held-out (test) document, the fraction of its word n-grams that occur
  * ANYWHERE in the training split (corpus-level n-gram containment, the
  * standard "13-gram overlap" decontamination shape at smaller n).
  *
  * Scale shape: one explode to distinct (doc, gram) rows, one left-semi
  * hash join from test grams to the distinct train-gram set (the only
  * wide shuffle — equi-join on the gram string, skew-bounded because
  * grams are distinct per side), one per-doc aggregate. No cross join,
  * no driver materialization; at 100 TB the train-gram set shards across
  * the cluster like any big-side join input.
  */
object Decontam {

  /** Distinct word n-grams per document: (doc_id, split, gram). Tokens
    * are whitespace-split over lowercased trimmed text (same
    * tokenization as [[Dedup.shingles]]); documents shorter than `n`
    * tokens carry no grams. Deduplicated IN-KERNEL
    * ([[graft.expr.WordNgramKernel]]) — the old corpus-wide (doc, gram)
    * distinct shuffle is gone; the cross-split semi join is the only
    * wide shuffle left. */
  def wordNgrams(docs: DataFrame, split: Column, n: Int): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    docs.select(col("doc_id"), split.as("split"),
      explode(GraftColumnBridge.column(graft.expr.WordNgramSet(
        GraftColumnBridge.expression(col("text")), n))).as("gram"))
  }

  /** Containment of each test document's n-grams in the train split.
    * Emits (doc_id, n_grams, n_hit, containment) for every test doc with
    * ≥ n tokens, ordered by doc_id; `containment` = n_hit / n_grams
    * rounded to 6 decimals (exact rational → portable across engines). */
  def crossSplitContainment(docs: DataFrame, split: Column, n: Int): DataFrame = {
    val grams = wordNgrams(docs, split, n)
    val trainGrams = grams.filter(col("split") === "train").select("gram").distinct()
    val testGrams = grams.filter(col("split") === "test")

    val totals = testGrams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val hits = testGrams.join(trainGrams, Seq("gram"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))

    totals.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("containment",
        round(col("n_hit").cast("double") / col("n_grams"), 6))
      .orderBy("doc_id")
  }
}
