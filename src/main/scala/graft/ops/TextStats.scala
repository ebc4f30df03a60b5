package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting (whitespace + BPE-ish regex), quality scoring,
  * n-gram-marker language ID, and rolling document fingerprints.
  *
  * All pure `Column` expressions (whole-stage codegen, no UDFs); integer
  * arithmetic wherever cross-engine bit-determinism matters.
  */
object TextStats {

  /** Whitespace token count of a text column. */
  def wsTokens(text: Column): Column = size(split(trim(text), "\\s+"))

  /** BPE-ish token count: letter runs, digit runs, single punctuation. */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokens(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Per-language token statistics. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
        col("lang"),
        wsTokens(col("text")).as("ws_toks"),
        bpeTokens(col("text")).as("bpe_toks"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws_toks")).as("sum_ws"),
        sum(col("bpe_toks")).as("sum_bpe"))
      .withColumn("avg_ws", round(col("sum_ws").cast("double") / col("n_docs"), 2))
      .orderBy("lang")

  /** Per-language top-k vocabulary: token frequency histogram with a
    * deterministic (count desc, token) rank — the vocab-building pass of
    * a tokenizer pipeline. One (lang, token) hash aggregate (map-side
    * combinable) then a per-lang window over the VOCABULARY (bounded by
    * distinct tokens, not corpus size), so the plan survives corpus
    * scale-up. */
  def topTokens(docs: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("cnt").desc, col("tok"))
    docs.select(col("lang"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("lang", "rank")
  }

  /** OUT-OF-VOCABULARY RATE: per language, the share of token
    * OCCURRENCES not covered by that language's top-`k` vocabulary —
    * the tokenizer-coverage check run before committing to a vocab
    * size. Same plan spine as [[topTokens]]: one (lang, token) hash
    * aggregate (map-side combinable, bounded by the vocabulary), one
    * per-lang window over the vocabulary, one final rollup; integral
    * permille, engine-exact. */
  def oovRate(docs: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("cnt").desc, col("tok"))
    docs.select(col("lang"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w))
      .groupBy("lang")
      .agg(
        sum(col("cnt")).as("n_tokens"),
        sum(when(col("rank") <= k, col("cnt")).otherwise(lit(0L))).as("covered"),
        count(lit(1)).as("vocab_size"))
      .withColumn("oov_permille",
        expr("((n_tokens - covered) * 1000) DIV n_tokens"))
      .orderBy("lang")
  }

  /** Quality score in [0,1]: alpha ratio + length credit − punctuation
    * penalty. The exact operation order is mirrored by the DuckDB oracle. */
  def qualityScore(text: Column): Column = {
    val alpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / length(text)
    val wtok  = wsTokens(text).cast("double")
    val punct = length(regexp_replace(text, "[^.,!?]", "")).cast("double")
    lit(0.5) * alpha +
      lit(0.3) * least(lit(1.0), wtok / lit(100.0)) +
      lit(0.2) * (lit(1.0) - least(lit(1.0), punct / lit(50.0)))
  }

  /** Histogram of quality-score deciles. */
  def qualityBuckets(docs: DataFrame): DataFrame =
    docs.select(floor(qualityScore(col("text")) * 10).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("bucket")

  /** Per-source ADAPTIVE quality cut — the curation step that keeps the
    * top `keepPct`% of documents per corpus by quality score (micro-
    * quantized, doc_id tiebreak) instead of one global threshold: noisy
    * corpora get a stricter absolute cut, clean ones a looser one. One
    * window shuffle per call; the integer rank test `rank*100 <= n*pct`
    * keeps the predicate engine-exact. */
  def qualityCut(docs: DataFrame, keepPct: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keepPct > 0 && keepPct <= 100, "keepPct in (0, 100]")
    val scored = docs.select(col("doc_id"), col("source"),
      floor(qualityScore(col("text")) * 1e6).cast("long").as("q_micro"))
    val w = Window.partitionBy("source").orderBy(col("q_micro").desc, col("doc_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .withColumn("n_docs", count(lit(1)).over(Window.partitionBy("source")))
      .filter(col("rnk") * 100 <= col("n_docs") * keepPct)
      .groupBy("source")
      .agg(count(lit(1)).as("kept"), max(col("n_docs")).as("n_docs"),
        min(col("q_micro")).as("cut_micro"))
      .orderBy("source")
  }

  /** TOKEN-BUDGET QUALITY CALIBRATION — the inverse of [[qualityCut]]:
    * instead of "keep the top P% of documents", answer "what quality
    * threshold keeps AT MOST `budgetChars` of volume per language?" —
    * the knob a curation run actually turns when the training budget is
    * fixed in tokens, not in percentiles.
    *
    * Per language: `threshold_milli` (the lowest milli-quantized quality
    * score still admitted), `kept_docs`, and `kept_chars` (≤ budget).
    * A language whose single best bin already exceeds the budget emits
    * no row (nothing can be kept without overshooting).
    *
    * Scale shape: the corpus pass is a map-side-combinable aggregation
    * into (lang, q_milli) bins — at most 1001 bins per language, so the
    * shuffle carries bins, never documents, and the cumulative window
    * runs over the tiny bin frame. Compare qualityCut, whose
    * per-source window ranks every document row: this formulation is
    * the 100 TB-safe shape for GLOBAL thresholding, trading doc-level
    * tie-breaking for bin granularity (exact at the milli-score
    * contract both engines share). */
  /** Corpus DRIFT monitor: distribution shift between two slices of a
    * corpus (yesterday vs today's crawl, split A vs B) over hashed
    * word-bigram buckets — the ingestion-time canary that a source
    * changed character before it poisons a training mix. Integer-exact:
    * per bucket, the cross-multiplied proportion gap
    * `drift_micro = |n_a·T_b − n_b·T_a| · 1e6 / (T_a·T_b)` (micro units
    * of absolute probability difference; wide products in DECIMAL(38,0),
    * one integral division per bucket), reported for the `topK` most
    * drifted buckets. Σ drift_micro over ALL buckets would be 1e6 × the
    * total-variation distance × 2.
    *
    * Scale shape: one kernel pass per doc (distinct-bucket rows), one
    * buckets-bounded partial aggregate, totals broadcast as a 1-row
    * frame, top-k via a window over ≤`buckets` rows. Text never
    * shuffles. */
  def corpusDrift(docs: DataFrame, sliceA: Column,
      buckets: Int = 256, topK: Int = 20): DataFrame = {
    require(buckets > 0 && topK > 0, "buckets and topK must be positive")
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.expressions.Window
    val feats = docs
      .select(sliceA.as("is_a"),
        explode(GraftColumnBridge.column(graft.expr.HashedBigramBuckets(
          GraftColumnBridge.expression(col("text")), buckets))).as("f"))
      .select(col("is_a"), col("f.b").as("b"), col("f.c").as("c"))
    val byBucket = feats.groupBy("b").agg(
      sum(when(col("is_a"), col("c")).otherwise(0L)).as("n_a"),
      sum(when(!col("is_a"), col("c")).otherwise(0L)).as("n_b"))
    val totals = byBucket.agg(
      sum("n_a").as("tot_a"), sum("n_b").as("tot_b"))
    val w = Window.orderBy(col("drift_micro").desc, col("b"))
    // nullif guard: an EMPTY slice (first run, wrong predicate) must
    // surface as NULL drift rows, not an ANSI divide-by-zero that kills
    // the canary itself
    byBucket.crossJoin(broadcast(totals))
      .select(col("b"), col("n_a"), col("n_b"), expr(
        "abs(CAST(n_a AS DECIMAL(38,0)) * tot_b - " +
          "CAST(n_b AS DECIMAL(38,0)) * tot_a) * 1000000 div " +
          "nullif(CAST(tot_a AS DECIMAL(38,0)) * CAST(tot_b AS DECIMAL(38,0)), 0)")
        .cast("long").as("drift_micro"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .orderBy("rn")
  }

  def budgetThreshold(docs: DataFrame, budgetChars: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetChars >= 0, "budgetChars must be non-negative")
    val bins = docs
      .select(col("lang"),
        floor(qualityScore(col("text")) * 1000).cast("long").as("q_milli"),
        col("n_chars"))
      .groupBy("lang", "q_milli")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("bin_chars"))
    val w = Window.partitionBy("lang").orderBy(col("q_milli").desc)
    bins
      .withColumn("cum_docs", sum(col("n_docs")).over(w))
      .withColumn("cum_chars", sum(col("bin_chars")).over(w))
      .filter(col("cum_chars") <= budgetChars)
      .groupBy("lang")
      .agg(min(col("q_milli")).as("threshold_milli"),
        max(col("cum_docs")).as("kept_docs"),
        max(col("cum_chars")).as("kept_chars"))
      .orderBy("lang")
  }

  /** Marker-word occurrence count: `(len(t) − len(replace(t, m, ''))) / len(m)`
    * — integer-valued, hence bit-deterministic. */
  def markerCount(text: Column, marker: String): Column =
    ((length(text) - length(replace(text, lit(marker), lit("")))) / lit(marker.length))
      .cast("long")

  /** N-gram-marker language ID: priority chain over marker hits, compared
    * against the labeled `lang` column. */
  def langId(docs: DataFrame): DataFrame = {
    val t = col("text")
    val predicted =
      when(markerCount(t, "的") > 0, "zh")
        .when(markerCount(t, " der ") > 0, "de")
        .when(markerCount(t, " le ") > 0, "fr")
        .when(markerCount(t, " el ") > 0, "es")
        .when(markerCount(t, " the ") > 0, "en")
        .otherwise(lit("unknown"))
    docs.select(col("lang"), predicted.as("predicted"),
        markerCount(t, " the ").as("occ_the"))
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("cnt"), sum(col("occ_the")).as("sum_the"))
      .orderBy("lang", "predicted")
  }

  /** Per-document Shannon CHARACTER entropy (micro-quantized) — the
    * cheap "is this text or noise" quality signal pipelines use to drop
    * binary junk / repeated-char spam before expensive stages: natural
    * text sits ~4.1–4.4 bits·ln2, single-char spam near 0. One explode +
    * two metadata-light aggregations; each (doc, char) term is quantized
    * to micro-units BEFORE the per-doc sum so the DuckDB oracle compares
    * exact integers (same trick as [[Retrieval.bm25]]). */
  def charEntropy(docs: DataFrame): DataFrame = {
    // per-document — one codegen kernel pass (graft.expr.EntropyKernel):
    // the char explode + (doc, char) count + length join + per-doc sum
    // pipeline is now a pure projection with identical micro-nat values
    import org.apache.spark.sql.GraftColumnBridge
    docs.filter(length(col("text")) > 0)
      .select(col("doc_id"), GraftColumnBridge.column(
        graft.expr.CharEntropyMicro(
          GraftColumnBridge.expression(col("text")))).as("entropy_micro"))
      .orderBy("doc_id")
  }

  /** REPETITION quality signal (the Gopher/C4-style duplicate-n-gram
    * filter): per document, total vs distinct word n-grams and the
    * duplicated fraction `(n_grams - n_distinct) / n_grams` — high
    * ratios flag boilerplate/spam for corpus filtering. One explode +
    * one hash aggregate per doc (map-side combinable; gram strings
    * shuffle once, bounded by corpus token count). */
  def repetitionStats(docs: DataFrame, n: Int = 2): DataFrame = {
    // same per-doc kernel as [[dupNgramChars]] (one pass, no explode, no
    // countDistinct shuffle); short docs come back as all-zero rows and
    // are filtered like the old pre-explode size gate
    import org.apache.spark.sql.GraftColumnBridge
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), GraftColumnBridge.column(
        graft.expr.DupNgramStats(
          GraftColumnBridge.expression(col("text")), n)).as("s"))
      .select(col("doc_id"), col("s.n_grams").as("n_grams"),
        col("s.n_distinct").as("n_distinct"))
      .filter(col("n_grams") > 0)
      .withColumn("n_dup", col("n_grams") - col("n_distinct"))
      .withColumn("dup_ratio",
        round(col("n_dup").cast("double") / col("n_grams"), 6))
      .orderBy("doc_id")
  }

  /** DUPLICATE N-GRAM CHARACTER FRACTION (the Gopher-style repetition
    * filter): per document, the share of gram characters covered by word
    * n-grams occurring more than once within the document. Char-weighted
    * — a repeated long phrase counts for more than a repeated stopword
    * pair — which is the complement of the count-based
    * [[repetitionStats]]. Returns only documents with any duplication,
    * worst first.
    *
    * Scale shape: the whole census is PER-DOCUMENT, so it runs as one
    * codegen kernel pass ([[graft.expr.NgramKernel]] — gram histogram +
    * char mass in a single sweep, chars = code points like Spark
    * `length`); the old gram explode + (doc, gram) aggregate + per-doc
    * re-aggregate (two shuffles) is now a pure projection. Counting is
    * exact integers; the single ratio is integral permille (`DIV`), so
    * the output is engine-exact. */
  def dupNgramChars(docs: DataFrame, n: Int = 3): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), GraftColumnBridge.column(
        graft.expr.DupNgramStats(
          GraftColumnBridge.expression(col("text")), n)).as("s"))
      .select(col("doc_id"), col("s.n_grams").as("n_grams"),
        col("s.gram_chars").as("gram_chars"), col("s.dup_chars").as("dup_chars"))
      .filter(col("dup_chars") > 0)
      .withColumn("dup_permille",
        expr("(dup_chars * 1000) DIV gram_chars"))
      .orderBy(col("dup_permille").desc, col("doc_id"))
  }

  /** PATTERN MASKING (PII scrubbing): replace every match of `pattern`
    * with `mask` and report the per-doc redaction count — the
    * text-sanitization pass a training pipeline runs before tokenizing.
    * Pure codegen'd string expressions (regexp_replace + a length-based
    * match count, no UDF). Patterns should stay in the regex subset
    * common to the engines consuming the output (the oracle uses a
    * digit-run pattern identical under Java regex and RE2). */
  def maskPattern(
      docs: DataFrame, pattern: String, mask: String): DataFrame = {
    val masked = regexp_replace(col("text"), pattern, mask)
    docs.select(
        col("doc_id"),
        masked.as("masked_text"),
        // matches removed = (length delta) / (per-match length delta)
        // is fragile for variable-width matches; count directly instead
        (size(split(col("text"), pattern, -1)) - 1).as("n_masked"))
      .orderBy("doc_id")
  }

  /** BIGRAM FAMILIARITY (a CCNet-style perplexity proxy without the
    * float log): score each document by how typical its character
    * bigrams are of the corpus — `familiarity_milli` = the average
    * corpus-wide occurrence count of the document's bigrams, in
    * milli-counts (Σ corpus-count(bigram) · 1000 div n_bigrams). Low
    * scores flag gibberish/encoding junk the way high LM perplexity
    * does, but the statistic is pure BIGINT arithmetic, so it is exact
    * in any engine and independent of summation order.
    *
    * Scale shape: each document's bigram multiset is computed in ONE
    * pass by the custom codegen kernel [[graft.expr.BigramCounts]] —
    * a (bigram → count) map per row, so the explode fodder is the
    * document's DISTINCT-bigram count, not one row per character
    * position. The corpus count table aggregates those entries
    * (token-keyed, map-side combinable); the bigram alphabet is tiny
    * (≤ charset²), so the table is broadcast and the join is map-side;
    * the per-doc sum is one keyed aggregation of count-weighted rows. */
  def bigramFamiliarity(docs: DataFrame, selection: Column): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    def bigrams(d: DataFrame) = d
      .filter(length(col("text")) >= 2)
      .select(col("doc_id"),
        explode(GraftColumnBridge.column(graft.expr.BigramCounts(
          GraftColumnBridge.expression(lower(col("text")))))).as(Seq("bg", "n")))
    val corpusCounts = bigrams(docs).groupBy("bg").agg(sum(col("n")).as("cnt"))
    bigrams(docs.filter(selection))
      .join(broadcast(corpusCounts), "bg")
      .groupBy("doc_id")
      .agg(sum(col("n")).as("n_bigrams"),
        sum(col("cnt") * col("n")).as("sum_cnt"))
      .withColumn("familiarity_milli", expr("(sum_cnt * 1000) div n_bigrams"))
      .select("doc_id", "n_bigrams", "familiarity_milli")
      .orderBy("doc_id")
  }

  /** Stop words for the Gopher "contains ≥2 stop words" rule (Rae et al.
    * 2021, appendix A1.1 — reference implements no such filter; this is
    * the pipeline-extension surface). */
  val GopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher repetition-free quality rules (Rae et al. 2021, A1.1) as a
    * per-source rule-failure census. Every predicate is integer
    * cross-multiplication (`10*symbols > words`, not
    * `symbols/words > 0.1`), so the flags are bit-identical across
    * engines — no float thresholds anywhere.
    *
    * Rules, each failing independently:
    *   1. word count outside [minWords, maxWords]
    *   2. mean word length outside [3, 10] chars
    *   3. symbol-to-word ratio ('#' or '...') above 10%
    *   4. more than 90% of lines start with a bullet
    *   5. more than 30% of lines end with an ellipsis
    *   6. fewer than 80% of words contain an alphabetic char
    *   7. fewer than 2 distinct stop words present
    *
    * Scale shape: a single projection (all rules are codegen'd `Column`
    * expressions over one row) followed by one map-side-combinable
    * aggregation keyed on `source` — no shuffle of text, no UDFs. */
  def gopherRules(docs: DataFrame, minWords: Int = 50,
      maxWords: Int = 100000): DataFrame = {
    val t = col("text")
    val words  = split(trim(t), "\\s+")
    val nWords = size(words)
    // chars inside words = total minus whitespace
    val wChars = length(regexp_replace(t, "\\s", ""))
    // '...' count: replace() removes non-overlapping matches, so the
    // length delta is an exact multiple of 3 and the division is lossless
    val symbols = (length(t) - length(replace(t, lit("#"), lit("")))) +
      ((length(t) - length(replace(t, lit("..."), lit("")))) / lit(3)).cast("int")
    val lines  = split(t, "\n", -1)
    val nLines = size(lines)
    val bullets = size(filter(lines, l =>
      l.startsWith("- ") || l.startsWith("• ") || l.startsWith("* ")))
    val ellLines = size(filter(lines, _.endsWith("...")))
    val alphaWords = size(filter(words, _.rlike("[A-Za-z]")))
    val stopw = size(array_intersect(
      transform(words, lower(_)), lit(GopherStopWords.toArray)))
    val flags = docs.select(
      col("source"),
      (nWords < minWords || nWords > maxWords).as("f_wordcount"),
      (wChars < nWords * 3 || wChars > nWords * 10).as("f_meanlen"),
      (symbols * 10 > nWords).as("f_symbol"),
      (bullets * 10 > nLines * 9).as("f_bullet"),
      (ellLines * 10 > nLines * 3).as("f_ellipsis"),
      (alphaWords * 5 < nWords * 4).as("f_alpha"),
      (stopw < 2).as("f_stopword"))
    val ruleCols = flags.columns.filter(_.startsWith("f_"))
    val passAll = ruleCols.map(c => !col(c)).reduce(_ && _)
    flags
      .withColumn("f_pass", passAll)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        (ruleCols :+ "f_pass").map(c =>
          sum(col(c).cast("long")).as(c.stripPrefix("f_") match {
            case "pass" => "pass_all"
            case r      => s"fail_$r"
          })): _*)
      .orderBy("source")
  }

  /** Deterministic integer document fingerprint (rolling-hash style over
    * cheap structural features; pure int64 arithmetic). */
  def fingerprint(textCol: String, nChars: Column): Column = {
    val t = col(textCol)
    (nChars * lit(1000003L) +
      (length(t) - length(replace(t, lit(" "), lit("")))) * lit(10007L) +
      ascii(substring(t, 1, 1)) * lit(101L) +
      expr(s"ascii(substr($textCol, length($textCol), 1))")) % lit(1000000007L)
  }
}
