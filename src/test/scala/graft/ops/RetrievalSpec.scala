package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit semantics of the round-5 pipeline operators: BM25 ranking and
  * train/test n-gram containment (their cross-engine numeric parity is
  * pinned by the q_bm25 / q_decontam oracles; these specs pin the
  * hand-checkable shape). */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  test("bm25 ranks the term-dense doc first, ignores non-matching docs") {
    val docs = Seq(
      (0L, "spark spark spark shuffle"),
      (1L, "spark shuffle partition join"),
      (2L, "cats and dogs entirely off topic words"),
      (3L, "spark")).toDF("doc_id", "text")
    val out = Retrieval.bm25(docs, Seq("spark"), 10).collect()
    // only docs containing the term appear
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(0L, 1L, 3L))
    // rank 1 = highest score; doc 0 (3×tf, short) beats doc 1 (1×tf)
    val byRank = out.sortBy(_.getAs[Int]("rank"))
    assert(byRank.head.getAs[Long]("doc_id") == 0L)
    // scores strictly ordered with doc_id tiebreak
    val scores = byRank.map(_.getAs[Long]("score_micro"))
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("tfidf: corpus-rare term outranks the ubiquitous one, df stays corpus-global") {
    val docs = Seq(
      (0L, "common zebra common common"), // zebra is rare, common is everywhere
      (1L, "common words here"),
      (2L, "common more words"),
      (3L, "common filler")).toDF("doc_id", "text")
    val out = Retrieval.tfidfTopK(docs, col("doc_id") === 0L, 2).collect()
    // only the selected doc is scored
    assert(out.map(_.getAs[Long]("doc_id")).distinct.toSeq == Seq(0L))
    // rank 1 = zebra (df=1) despite tf=3 for common (df=4 → idf 0)
    val byRank = out.sortBy(_.getAs[Int]("rn"))
    assert(byRank.head.getAs[String]("tok") == "zebra")
    // 'common' appears in every doc: ln((N+1)/(df+1)) = ln(5/5) = 0
    assert(byRank.find(_.getAs[String]("tok") == "common")
      .forall(_.getAs[Long]("score_milli") == 0L))
  }

  test("containment: fully-covered test doc = 1.0, disjoint doc = 0.0") {
    val docs = Seq(
      (0L, "a b c d e", "train"),
      (1L, "a b c", "test"),      // its single trigram is in train
      (2L, "x y z w", "test"),    // nothing shared
      (3L, "a b", "test"))        // too short for trigrams -> absent
      .toDF("doc_id", "text", "s")
    val out = Decontam.crossSplitContainment(docs, col("s"), n = 3).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId.keySet == Set(1L, 2L))
    assert(byId(1L).getAs[Double]("containment") == 1.0)
    assert(byId(2L).getAs[Double]("containment") == 0.0)
    assert(byId(2L).getAs[Long]("n_grams") == 2L) // "x y z", "y z w"
  }
}
