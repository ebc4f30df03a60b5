package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.PortableHash

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

  /** MATERIALIZE the mixture plan — the "act" half of [[mixWeights]]:
    * a document survives iff its portable 32-bit id hash lands inside
    * its (group, source)'s `rate_permille` gate, so the surviving
    * corpus meets the per-group budget in expectation — and the SAME
    * documents survive on every run and every engine (the gate is the
    * md5 hash the oracle reproduces, not `rand()`).
    *
    * Scale shape: the rate table is one row per (group, source) and is
    * broadcast; the gate itself is a map-side hash-compare, so beyond
    * the [[mixWeights]] aggregate there is no extra shuffle over the
    * corpus. */
  def applyMixture(
      docs: DataFrame,
      budgetChars: Long = 500000L,
      groupCol: String = "lang",
      sourceCol: String = "source",
      sizeCol: String = "n_chars",
      idCol: String = "doc_id"): DataFrame = {
    val rates = mixWeights(docs, budgetChars, groupCol, sourceCol, sizeCol)
      .select(col(groupCol), col(sourceCol), col("rate_permille"))
    docs.join(broadcast(rates), Seq(groupCol, sourceCol))
      .filter(
        PortableHash.md5Hash32(col(idCol).cast("string")) % 1000 < col("rate_permille"))
  }

  /** TEMPERATURE-SCALED MIXTURE WEIGHTS (the multilingual-sampling
    * reweighting of XLM/mT5: upsample small sources, downsample large
    * ones): per source, weight ∝ `src_chars^0.5`. The exponent is fixed
    * at 0.5 because `sqrt` is the one fractional power IEEE 754 requires
    * to be correctly rounded, so `floor(sqrt(chars) · 1e6)` is bit-exact
    * in every engine — a general `pow(x, α)` goes through libm and is
    * not. Integral `DIV` for the permille shares.
    *
    * Output per source: `src_chars`, `natural_permille` (share before
    * reweighting), `w_micro` (the quantized temperature weight), and
    * `share_permille` (post-temperature sampling share).
    *
    * Scale shape: one grouped agg (map-side partial sums; the shuffle
    * carries one row per source) + one unpartitioned window over the
    * #sources-row aggregate — bounded by source cardinality, never by
    * corpus size. */
  /** EPOCH / REPEAT-FACTOR PLANNER — the step after mixture weighting:
    * given a total training-volume budget and the α=0.5
    * temperature-scaled target shares of [[temperatureWeights]], how
    * many PASSES over each source does the run make?
    * `epochs_milli = target DIV available` (milli-epochs: 1000 = one
    * full pass, 500 = half the source, 2000 = the source twice), capped
    * at `maxEpochsMilli` — the repeated-data guidance of Muennighoff et
    * al. 2023 (arXiv:2305.16264): beyond ~4 epochs of repeats the
    * marginal data stops helping, so the planner refuses to promise
    * more and reports the shortfall via `planned_chars < target_chars`.
    *
    * Output per source: `src_chars` (available), `w_micro` (quantized
    * sqrt weight), `share_permille` (target share), `target_chars`
    * (budget × share), `epochs_milli` (capped repeat factor), and
    * `planned_chars` (what the plan actually delivers).
    *
    * Scale shape: identical to [[temperatureWeights]] — one grouped agg
    * whose shuffle carries a row per source, one window over the
    * #sources-row aggregate, integral arithmetic end to end (`sqrt` is
    * IEEE-correctly-rounded, everything else is BIGINT `DIV`). */
  def epochPlan(
      docs: DataFrame,
      budgetChars: Long,
      maxEpochsMilli: Long = 4000L,
      sourceCol: String = "source",
      sizeCol: String = "n_chars"): DataFrame = {
    require(budgetChars >= 0, "budgetChars must be non-negative")
    require(maxEpochsMilli > 0, "maxEpochsMilli must be positive")
    val w = Window.partitionBy()
    docs
      .groupBy(col(sourceCol))
      .agg(sum(col(sizeCol)).as("src_chars"))
      .withColumn("w_micro",
        floor(sqrt(col("src_chars").cast("double")) * lit(1e6)).cast("long"))
      .withColumn("total_w", sum(col("w_micro")).over(w))
      // nullif-guard every divisor (like corpusDrift): a source whose
      // docs sum to zero chars — or an all-empty corpus — surfaces as
      // NULL rows instead of an ANSI DIVIDE_BY_ZERO killing the plan
      .withColumn("share_permille",
        expr("(w_micro * 1000) DIV nullif(total_w, 0)"))
      .withColumn("target_chars",
        expr(s"(${budgetChars}L * share_permille) DIV 1000"))
      // `least` IGNORES nulls, so the zero-source case must be an
      // explicit CASE branch (CaseWhen evaluates only the selected arm —
      // the DIV never runs on a zero divisor)
      .withColumn("epochs_milli",
        when(col("src_chars") === 0, lit(null).cast("long"))
          .otherwise(least(lit(maxEpochsMilli),
            expr("(target_chars * 1000) DIV src_chars"))))
      .withColumn("planned_chars",
        expr("(src_chars * epochs_milli) DIV 1000"))
      .drop("total_w")
      .orderBy(sourceCol)
  }

  def temperatureWeights(
      docs: DataFrame,
      sourceCol: String = "source",
      sizeCol: String = "n_chars"): DataFrame = {
    val w = Window.partitionBy()
    docs
      .groupBy(col(sourceCol))
      .agg(sum(col(sizeCol)).as("src_chars"))
      .withColumn("w_micro",
        floor(sqrt(col("src_chars").cast("double")) * lit(1e6)).cast("long"))
      .withColumn("total_chars", sum(col("src_chars")).over(w))
      .withColumn("total_w", sum(col("w_micro")).over(w))
      // same nullif guard as epochPlan — an all-empty corpus is a NULL
      // share, not a DIVIDE_BY_ZERO
      .withColumn("natural_permille",
        expr("(src_chars * 1000) DIV nullif(total_chars, 0)"))
      .withColumn("share_permille",
        expr("(w_micro * 1000) DIV nullif(total_w, 0)"))
      .drop("total_chars", "total_w")
      .orderBy(sourceCol)
  }
}
