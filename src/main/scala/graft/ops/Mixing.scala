package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DATA-MIXING WEIGHTS — the mixture-planning step before a training
  * run: a per-group (language) character budget turns into per-source
  * sampling rates and expected sampled volume. All arithmetic is
  * integral (permille rates, `DIV`) so the result is engine-exact and
  * oracle-verifiable.
  *
  * Scale shape: ONE grouped aggregation (map-side partial sums — the
  * shuffle carries one row per (group, source), never documents) plus
  * ONE window partitioned by group (re-shuffles only the tiny aggregate,
  * one row per source pair). No driver-side state; group cardinality
  * (languages × sources) bounds every post-agg stage. */
object Mixing {

  /** Per-(group, source) sampling plan: `src_chars` (source volume),
    * `lang_chars` (group total), `rate_permille` (what fraction of the
    * group survives to land the budget, capped at 1000), and
    * `sampled_chars` (expected post-sampling volume). Column names keep
    * the lang/source defaults for the documents-table contract. */
  def mixWeights(
      docs: DataFrame,
      budgetChars: Long = 500000L,
      groupCol: String = "lang",
      sourceCol: String = "source",
      sizeCol: String = "n_chars"): DataFrame = {
    val w = Window.partitionBy(groupCol)
    docs
      .groupBy(col(groupCol), col(sourceCol))
      .agg(sum(col(sizeCol)).as("src_chars"))
      .withColumn("lang_chars", sum(col("src_chars")).over(w))
      // integral DIV end to end — engine-exact, no float rounding
      .withColumn("rate_permille",
        least(lit(1000L), expr(s"${budgetChars * 1000L}L DIV lang_chars")))
      .withColumn("sampled_chars",
        expr("(src_chars * rate_permille) DIV 1000"))
      .orderBy(groupCol, sourceCol)
  }
}
