package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic byte-pair-encoding MERGE TRAINING (Sennrich et al. 2016)
  * — the tokenizer-side member of the training-data pipeline family:
  * learn the first `nMerges` BPE merges of a corpus, integer-exact.
  *
  * Algorithm (classic `learn_bpe`): words start as character sequences;
  * each round censuses ADJACENT symbol pairs (overlaps counted, like the
  * reference implementation's `get_stats`) weighted by word frequency,
  * picks the top pair — ties broken by (count DESC, left ASC, right ASC),
  * so training is fully deterministic — and rewrites every word by
  * greedily merging non-overlapping occurrences left-to-right.
  *
  * Scale shape: the corpus is touched ONCE (the word-frequency census —
  * one shuffle of tokens); every merge round after that runs over the
  * VOCABULARY (distinct words — bounded by language, not corpus size),
  * with a map-side-combinable pair census and a k-bounded driver collect
  * of exactly one row per round (the argmax pair — same contract as
  * k-means centroids). Round frames are `localCheckpoint`ed so plans
  * don't grow with rounds.
  */
object Bpe {

  /** Learned merge table `(merge_rank, lhs, rhs, pair_count)`, ordered by
    * rank. Stops early (fewer rows) if the vocabulary runs out of pairs. */
  def trainMerges(docs: DataFrame, nMerges: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    // vocabulary census — the ONLY corpus-wide shuffle
    var vocab = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))").as("syms"))
      .localCheckpoint()

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    for (rank <- 1 to nMerges if !exhausted) {
      // single-symbol words contribute no pairs — and must be guarded,
      // because sequence(0, -1) DESCENDS rather than yielding empty
      val best = vocab
        .select(col("cnt"), explode(expr(
          "IF(size(syms) < 2, array(), transform(sequence(0, size(syms) - 2), " +
            "i -> struct(syms[i] AS l, syms[i+1] AS r)))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, pc) =
          (best.head.getString(0), best.head.getString(1), best.head.getLong(2))
        merges += ((rank, l, r, pc))
        // greedy left-to-right merge: fold the tail of the symbol array,
        // fusing `s` into the accumulator's last element when that last
        // element is `l` and `s` is `r`. A fused symbol can never be `l`
        // again (l+r != l), so the fold IS the non-overlapping greedy.
        val lc = lit(l); val rc = lit(r); val lrc = lit(l + r)
        vocab = vocab.select(col("cnt"),
          aggregate(
            slice(col("syms"), lit(2),
              greatest(size(col("syms")) - 1, lit(0))),
            array(element_at(col("syms"), 1)),
            (acc, s) => when(element_at(acc, -1) === lc && s === rc,
                concat(slice(acc, lit(1), size(acc) - 1), array(lrc)))
              .otherwise(concat(acc, array(s))))
            .as("syms"))
          .localCheckpoint()
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "pair_count")
      .orderBy("merge_rank")
  }

  /** Apply a learned merge table to a token column: each word re-segments
    * through the merges in rank order (the ENCODE half — what a tokenizer
    * does at corpus scale). Merges arrive as a driver-side list (k-bounded
    * by construction), so application is a pure projection — no joins, no
    * shuffle, whole-stage codegen. Emits `(doc_id, n_words, n_tokens)`:
    * tokens per doc under the learned segmentation. */
  def encodeStats(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val segmented = merges.foldLeft(expr(
      "transform(filter(split(lower(trim(text)), '\\\\s+'), w -> w <> ''), " +
        "w -> transform(sequence(1, length(w)), i -> substring(w, i, 1)))")) {
      case (wordsCol, (l, r)) =>
        transform(wordsCol, w =>
          aggregate(
            slice(w, lit(2), greatest(size(w) - 1, lit(0))),
            array(element_at(w, 1)),
            (acc, s) => when(element_at(acc, -1) === lit(l) && s === lit(r),
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
              .otherwise(concat(acc, array(s)))))
    }
    docs.select(col("doc_id"), segmented.as("segs"))
      .select(col("doc_id"),
        size(col("segs")).as("n_words"),
        aggregate(col("segs"), lit(0),
          (acc, w) => acc + size(w)).as("n_tokens"))
      .orderBy("doc_id")
  }
}
