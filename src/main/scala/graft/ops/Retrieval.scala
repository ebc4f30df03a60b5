package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval over a document corpus — the classic BM25
  * ranking a training-data pipeline uses for query-based corpus curation
  * and hard-negative mining (beyond the reference's operator set; part of
  * the LLM-pipeline extension surface).
  *
  * Scale shape: tokenization is a codegen'd split/explode (no UDF); the
  * per-term statistics are two map-side-combinable aggregations over ONLY
  * the rows matching the query terms (the filter prunes before the
  * shuffle); corpus-level scalars (N, avgdl) ride along as a 1-row
  * broadcast cross-join, never a driver collect; the final top-k is a
  * TakeOrdered, not a global sort.
  *
  * Determinism contract: the ONLY floating-point operation is `ln` of
  * exact integers (idf = ln(2N+2) - ln(2(df)+1), both arguments integer),
  * quantized to milli-units with round-half-up — a 1-ulp libm difference
  * between engines flips the result only if idf·1000 sits within ~1e-12
  * of a half-integer. Every other factor (tf saturation) is computed in
  * pure BIGINT arithmetic with integer division, identical in any
  * engine; per-term scores are exact integers BEFORE the per-document
  * sum, so the result is independent of float summation order too.
  */
object Retrieval {

  /** Lowercased alphanumeric word tokens, one row per (doc, token). */
  def tokens(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), explode(split(lower(col("text")), "[^a-z0-9]+")).as("tok"))
      .filter(length(col("tok")) > 0)

  /** Per-doc token HISTOGRAM rows `(doc_id, tok, c)` — the
    * [[graft.expr.AlnumTokenCounts]] kernel pass: one row per DISTINCT
    * (doc, token), with the occurrence count folded in. Docs with no
    * alphanumeric tokens emit no rows (same as [[tokens]]' empty
    * filter). */
  private def tokenHist(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    docs.select(col(idCol),
        explode(GraftColumnBridge.column(graft.expr.AlnumTokenCounts(
          GraftColumnBridge.expression(col("text"))))).as("t"))
      .select(col(idCol), col("t.tok").as("tok"), col("t.c").as("c"))
  }

  /** BM25 top-k: rank documents against `queryTerms`.
    *
    * Emits (doc_id, score_micro, rank) where `score_micro` is the
    * micro-quantized BM25 score Σ_t idf_milli(t) · tfsat_milli(t,d) with
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5)) = ln(2N+2) - ln(2df+1) and
    * tf-sat = tf(k1+1)/(tf + k1(1 - b + b·dl/avgdl)).
    *
    * `k1`/`b` are taken at milli precision (1.2 → 1200, 0.75 → 750) so
    * the saturation term is exact integer arithmetic:
    *   avgdl_milli = 1000·Σdl div N
    *   den_micro   = tf·1e6 + k1m·(1000-bm) + (k1m·bm·dl·1000) div avgdl_milli
    *   tfsat_milli = (tf·(k1m+1000)·1e6) div den_micro
    * (worst-case magnitude tf·2200·1e6 ≈ 2e13 per term — far from
    * BIGINT overflow at any realistic tf). */
  def bm25(
      docs: DataFrame,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val k1m = math.round(k1 * 1000)
    val bm = math.round(b * 1000)
    // per-doc token histograms (kernel pass): doc length is a PROJECTION
    // over each doc's own histogram array — the old groupBy(doc_id)
    // count over exploded tokens is gone, and tf needs no (doc, tok)
    // aggregate. Zero-token docs are excluded like the old empty filter.
    import org.apache.spark.sql.GraftColumnBridge
    val withH = docs.select(col("doc_id"),
        GraftColumnBridge.column(graft.expr.AlnumTokenCounts(
          GraftColumnBridge.expression(col("text")))).as("h"))
      .filter(size(col("h")) > 0)
    val docLen = withH.select(col("doc_id"),
      expr("aggregate(h, CAST(0 AS BIGINT), (a, x) -> a + x.c)").as("dl"))
    // corpus scalars as a 1-row frame (broadcast), not a driver action
    val corpus = docLen.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))

    // dl rides ALONG each histogram row into the query-term filter, so
    // no corpus-sized docLen join is needed on the scoring path (docLen
    // above exists only to fold the corpus scalars)
    val qRows = withH.select(col("doc_id"),
        expr("aggregate(h, CAST(0 AS BIGINT), (a, x) -> a + x.c)").as("dl"),
        explode(col("h")).as("t"))
      .select(col("doc_id"), col("dl"), col("t.tok").as("tok"), col("t.c").as("c"))
      .filter(col("tok").isin(queryTerms: _*))
      // materialized once: df and tf both consume it, and the post-filter
      // frame is term-posting-sized (never the corpus)
      .localCheckpoint()
    val df = qRows.groupBy("tok").agg(count(lit(1)).as("df"))
    val tf = qRows.select(col("doc_id"), col("dl"), col("tok"), col("c").as("tf"))

    val scored = tf
      .join(broadcast(df), "tok")
      .crossJoin(broadcast(corpus))
      // ln of exact integers, milli-quantized round-half-up: the sole
      // float op — everything downstream is engine-exact BIGINT math
      .withColumn("idf_milli",
        floor((log(col("n_docs").cast("double") * 2.0 + 2.0)
          - log(col("df").cast("double") * 2.0 + 1.0)) * lit(1000.0) + lit(0.5)))
      .withColumn("avgdl_milli", expr("(1000 * sum_dl) div n_docs"))
      .withColumn("den_micro", expr(
        s"tf * 1000000 + $k1m * (1000 - $bm) + ($k1m * $bm * dl * 1000) div avgdl_milli"))
      .withColumn("tfsat_milli", expr(s"(tf * ($k1m + 1000) * 1000000) div den_micro"))
      .withColumn("term_micro", col("idf_milli") * col("tfsat_milli"))

    scored.groupBy("doc_id")
      .agg(sum(col("term_micro")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score_micro").desc, col("doc_id"))))
  }

  /** TF-IDF keyword extraction: the top-`k` most characteristic terms of
    * each selected document, scored tf · idf with idf = ln((N+1)/(df+1))
    * over the FULL corpus (document frequency is corpus-global even when
    * `selection` narrows the scored documents — that is what makes the
    * keywords "characteristic" rather than merely frequent).
    *
    * Emits `(doc_id, rn, tok, score_milli)` with `rn` the 1-based rank by
    * (score desc, token) within the document.
    *
    * Determinism contract (same as [[bm25]]): the sole float op is `ln`
    * of exact integers, milli-quantized round-half-up before the integer
    * multiply by tf — per-term scores are exact BIGINTs, so ordering and
    * output are engine-exact.
    *
    * Scale shape: df is a token-keyed aggregation over the whole corpus
    * (map-side combinable) joined broadcast into the per-doc tf rows of
    * ONLY the selected documents; N rides along as a 1-row broadcast
    * cross-join; the final ranking is a window partitioned by doc_id —
    * per-document top-k, never a global sort. */
  def tfidfTopK(docs: DataFrame, selection: Column, k: Int): DataFrame = {
    // N = documents with at least one token (the df universe). A doc has
    // a token iff its lowercased text contains any [a-z0-9] — counted
    // with a cheap scan instead of a second full-corpus tokenize
    val corpus = docs.filter(lower(col("text")).rlike("[a-z0-9]"))
      .agg(count(lit(1)).as("n_docs"))
    // histogram rows are one per DISTINCT (doc, token), so df is a plain
    // count (no countDistinct expansion) and tf is a projection
    val df = tokenHist(docs).groupBy("tok").agg(count(lit(1)).as("df"))
    val tf = tokenHist(docs.filter(selection))
      .select(col("doc_id"), col("tok"), col("c").as("tf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score_milli").desc, col("tok"))
    tf.join(broadcast(df), "tok")
      .crossJoin(broadcast(corpus))
      .withColumn("idf_milli",
        floor((log(col("n_docs").cast("double") + 1.0)
          - log(col("df").cast("double") + 1.0)) * lit(1000.0) + lit(0.5)).cast("long"))
      .withColumn("score_milli", col("tf") * col("idf_milli"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("doc_id", "rn", "tok", "score_milli")
      .orderBy("doc_id", "rn")
  }
}
