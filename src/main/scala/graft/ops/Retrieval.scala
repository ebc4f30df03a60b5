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
  * Determinism contract: per-term scores are quantized to micro-units
  * (`floor(score * 1e6)` as BIGINT) BEFORE the per-document sum, so the
  * cross-engine result is an exact integer regardless of float summation
  * order (same trick as [[Clustering]]'s quantized centroid sums).
  */
object Retrieval {

  /** Lowercased alphanumeric word tokens, one row per (doc, token). */
  def tokens(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), explode(split(lower(col("text")), "[^a-z0-9]+")).as("tok"))
      .filter(length(col("tok")) > 0)

  /** BM25 top-k: rank documents against `queryTerms`.
    *
    * Emits (doc_id, score_micro, rank) where `score_micro` is the
    * micro-quantized BM25 score Σ_t ⌊idf_t · tf-sat_t · 1e6⌋ with
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5)) and
    * tf-sat = tf(k1+1)/(tf + k1(1 - b + b·dl/avgdl)). */
  def bm25(
      docs: DataFrame,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val toks = tokens(docs)
    val docLen = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    // corpus scalars as a 1-row frame (broadcast), not a driver action
    val corpus = docLen.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum(col("dl")).cast("double").as("sum_dl"))

    val qToks = toks.filter(col("tok").isin(queryTerms: _*))
    val df = qToks.groupBy("tok").agg(countDistinct(col("doc_id")).cast("double").as("df"))
    val tf = qToks.groupBy("doc_id", "tok").agg(count(lit(1)).cast("double").as("tf"))

    val scored = tf
      .join(broadcast(df), "tok")
      .join(docLen, "doc_id")
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("tfsat",
        col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / (col("sum_dl") / col("n_docs")))))
      .withColumn("term_micro",
        floor(col("idf") * col("tfsat") * lit(1e6)).cast("long"))

    scored.groupBy("doc_id")
      .agg(sum(col("term_micro")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score_micro").desc, col("doc_id"))))
  }
}
