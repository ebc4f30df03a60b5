package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  * one shuffle of tokens); the pair census is built once from the
  * vocabulary and then maintained INCREMENTALLY (the classic `learn_bpe`
  * optimization): after merging (l, r), only the pair counts of words
  * that actually contained an adjacent (l, r) change, so each round
  * patches the standing census with the delta from those words instead
  * of re-exploding every word's symbols. Per round that is ONE
  * materializing action (the k-bounded argmax collect — same contract as
  * k-means centroids) whose job folds in the previous round's lazy
  * census patch and vocab rewrite; lazy `localCheckpoint`s keep plans
  * from growing with rounds, which is what makes realistic merge counts
  * (hundreds+) tractable.
  */
object Bpe {

  /** Adjacent-pair structs of a symbol array, each tagged `sign` — the
    * explode fodder for the census (sign=+1) and its per-round deltas
    * (new pairs +1, old pairs -1). The size guard matters: sequence(0,-1)
    * DESCENDS rather than yielding empty. */
  private def signedPairs(symsCol: String, sign: Int): Column =
    expr(s"IF(size($symsCol) < 2, array(), " +
      s"transform(sequence(0, size($symsCol) - 2), " +
      s"i -> struct($symsCol[i] AS l, $symsCol[i+1] AS r, $sign AS sign)))")

  /** Does `syms` contain `r` immediately after `l`? The size guard is a
    * CaseWhen branch, NOT an And conjunct — Spark does not guarantee And
    * operand evaluation order in filters, and for size-1 arrays the
    * unguarded branch would descend sequence(0,-1) into an ANSI
    * element_at(syms, 2) throw. CaseWhen only evaluates the selected
    * branch. Literals go through `lit`, never string-spliced into expr:
    * l/r come from corpus text. */
  private def hasAdjacent(syms: Column, l: String, r: String): Column =
    when(size(syms) >= 2, exists(
      sequence(lit(0), size(syms) - 2),
      i => element_at(syms, i + 1) === lit(l) && element_at(syms, i + 2) === lit(r)))
      .otherwise(lit(false))

  /** Greedy left-to-right merge of (l, r) -> l+r: fold the tail of the
    * symbol array, fusing `s` into the accumulator's last element when
    * that last element is `l` and `s` is `r`. A fused symbol can never be
    * `l` again (l+r != l), so the fold IS the non-overlapping greedy. */
  private def greedyMerge(syms: Column, l: String, r: String): Column =
    aggregate(
      slice(syms, lit(2), greatest(size(syms) - 1, lit(0))),
      array(element_at(syms, 1)),
      (acc, s) => when(element_at(acc, -1) === lit(l) && s === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(s))))

  /** Learned merge table `(merge_rank, lhs, rhs, pair_count)`, ordered by
    * rank. Stops early (fewer rows) if the vocabulary runs out of pairs.
    *
    * ADAPTIVE (same idiom as `Dedup.connectedComponents`): the corpus-wide
    * word census always runs distributed (the one corpus shuffle); the
    * merge-learning loop runs DRIVER-SIDE over the collected census when
    * the vocabulary fits under `driverVocabThreshold` distinct words —
    * the vocabulary is language-bounded, not corpus-bounded, so this is
    * the k-bounded-collect posture (production tokenizer trainers are
    * built exactly this way: distributed count, bounded merge learning).
    * The driver loop maintains a pair→words inverted index, so each merge
    * touches only the words containing the merged pair — 32k merges cost
    * milliseconds, not 32k Spark jobs. Above the threshold (or with the
    * threshold set to 0) the loop runs distributed with an incrementally
    * patched census — one argmax job per round, delta-bounded. Both paths
    * are integer-exact and byte-identical (ties compare in UTF-8 byte
    * order on BOTH paths, matching Spark's UTF8String and the oracle's
    * memcmp). */
  def trainMerges(docs: DataFrame, nMerges: Int = 6,
      driverVocabThreshold: Long = 500000L): DataFrame = {
    val spark = docs.sparkSession
    // vocabulary census — the ONLY corpus-wide shuffle
    var vocab = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))").as("syms"))
      .localCheckpoint()

    if (driverVocabThreshold > 0 && vocab.count() <= driverVocabThreshold)
      return trainMergesDriver(spark, vocab, nMerges)

    // standing pair census, built ONCE — rounds patch it with deltas
    var census = vocab
      .select(col("cnt"), explode(signedPairs("syms", 1)).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("pc"))
      .localCheckpoint(false)

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    for (rank <- 1 to nMerges if !exhausted) {
      // the ONE materializing action per round: TakeOrdered over the
      // lazily-checkpointed census — computing it also folds in the
      // previous round's census patch and (first use) lazy vocab rewrite
      val best = census
        .orderBy(col("pc").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, pc) =
          (best.head.getString(0), best.head.getString(1), best.head.getLong(2))
        merges += ((rank, l, r, pc))
        // INCREMENTAL CENSUS PATCH: only words containing an adjacent
        // (l, r) change any pair count — their old pairs leave, their
        // rewritten pairs enter. Everything else is untouched, so the
        // patch explode is bounded by the merged pair's support, not the
        // vocabulary. The merged pair itself nets to zero (the greedy
        // rewrite removes every adjacent occurrence) and is filtered.
        val deltas = vocab
          .filter(hasAdjacent(col("syms"), l, r))
          .withColumn("new_syms", greedyMerge(col("syms"), l, r))
          .select(col("cnt"), explode(concat(
            signedPairs("new_syms", 1), signedPairs("syms", -1))).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("cnt") * col("p.sign")).as("d"))
        census = census.join(deltas, Seq("l", "r"), "full_outer")
          .select(col("l"), col("r"),
            (coalesce(col("pc"), lit(0L)) + coalesce(col("d"), lit(0L))).as("pc"))
          .filter(col("pc") > 0)
          .localCheckpoint(false)
        // rewrite only affected words (conditional — identity otherwise)
        vocab = vocab.select(col("cnt"),
          when(hasAdjacent(col("syms"), l, r), greedyMerge(col("syms"), l, r))
            .otherwise(col("syms")).as("syms"))
          .localCheckpoint(false)
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "pair_count")
      .orderBy("merge_rank")
  }

  /** UTF-8 byte order — Spark's UTF8String comparison and the oracle's
    * memcmp; java.lang.String compareTo (UTF-16 code units) DIVERGES for
    * supplementary characters, so ties must not use it. */
  private def bytesLt(a: String, b: String): Boolean =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0

  /** Driver-side exact `learn_bpe` over the collected word census: pair
    * counts plus a pair→words inverted index, so each merge round updates
    * only the words that contain the merged pair. Semantics are pinned to
    * the distributed path: overlapping adjacent pairs all count, the
    * rewrite is greedy left-to-right non-overlapping, ties break by
    * (count DESC, lhs byte-ASC, rhs byte-ASC). */
  private def trainMergesDriver(
      spark: org.apache.spark.sql.SparkSession,
      vocab: DataFrame, nMerges: Int): DataFrame = {
    import scala.collection.mutable
    val words: Array[(Long, Array[String])] = vocab.collect().map { r =>
      (r.getLong(0), r.getSeq[String](1).toArray)
    }
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // index/unindex a whole word: pair counts carry multiplicity (each
    // adjacent position counts), the inverted index is a set (dropping a
    // repeated pair's word twice is a harmless no-op)
    def indexWord(wi: Int): Unit = {
      val (cnt, syms) = words(wi)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        pairCounts(p) = pairCounts.getOrElse(p, 0L) + cnt
        pairWords.getOrElseUpdate(p, mutable.Set.empty) += wi
        i += 1
      }
    }
    def unindexWord(wi: Int): Unit = {
      val (cnt, syms) = words(wi)
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val nv = pairCounts.getOrElse(p, 0L) - cnt
        if (nv == 0L) pairCounts.remove(p) else pairCounts(p) = nv
        pairWords.get(p).foreach { s =>
          s -= wi; if (s.isEmpty) { pairWords.remove(p); () } }
        i += 1
      }
    }
    words.indices.foreach(indexWord)

    def greedy(syms: Array[String], l: String, r: String): Array[String] = {
      val out = new mutable.ArrayBuffer[String](syms.length)
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toArray
    }

    val merges = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    while (rank <= nMerges && pairCounts.nonEmpty) {
      var bestP: (String, String) = null
      var bestC = Long.MinValue
      pairCounts.foreach { case (p, c) =>
        if (c > bestC || (c == bestC &&
            (bytesLt(p._1, bestP._1) ||
              (p._1 == bestP._1 && bytesLt(p._2, bestP._2))))) {
          bestP = p; bestC = c
        }
      }
      val (l, r) = bestP
      merges += ((rank, l, r, bestC))
      val affected = pairWords.getOrElse(bestP, mutable.Set.empty).toArray
      affected.foreach { wi =>
        unindexWord(wi)
        words(wi) = (words(wi)._1, greedy(words(wi)._2, l, r))
        indexWord(wi)
      }
      rank += 1
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
  /** Tokenizer FERTILITY census: tokens-per-word under the learned
    * segmentation, by language — the standard tokenizer-equity metric
    * (a high-fertility language pays more sequence length per word, so
    * mixes/budgets must correct for it). Integer permille, built on the
    * same pure-projection encode as [[encodeStats]]: one corpus pass,
    * one lang-keyed partial aggregate. Languages with zero words are
    * absent (their fertility is undefined). */
  def fertilityByLang(docs: DataFrame, merges: Seq[(String, String)]): DataFrame =
    // lang rides the SAME projection as the kernel (no join back to
    // documents); one corpus pass, one lang-keyed partial aggregate
    docs.select(col("lang"), encodeCountsCol(merges).as("s"))
      .groupBy("lang")
      .agg(sum(col("s.n_words").cast("long")).as("n_words"),
        sum(col("s.n_tokens").cast("long")).as("n_tokens"))
      .filter(col("n_words") > 0)
      .select(col("lang"), col("n_words"), col("n_tokens"),
        expr("n_tokens * 1000L div n_words").as("fertility_milli"))
      .orderBy("lang")

  /** The learned segmentation's per-doc counts as ONE kernel call
    * ([[graft.expr.BpeEncodeCounts]]). This replaced an O(merges)-deep
    * nested `transform`/`aggregate` lambda tree: byte-identical output,
    * but the old tree's generated code embedded fresh LambdaVariable ids
    * on every plan, defeating the janino codegen cache — each fresh
    * DataFrame paid a multi-second recompile (8 s/run at sf0.1 under
    * the bench's build-per-pass pattern; the kernel compiles in
    * milliseconds). */
  private def encodeCountsCol(merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expr.BpeEncodeCounts(
      GraftColumnBridge.expression(col("text")), merges))
  }

  def encodeStats(docs: DataFrame, merges: Seq[(String, String)]): DataFrame =
    docs.select(col("doc_id"), encodeCountsCol(merges).as("s"))
      .select(col("doc_id"),
        col("s.n_words").as("n_words"),
        col("s.n_tokens").as("n_tokens"))
      .orderBy("doc_id")
}
