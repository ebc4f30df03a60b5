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

  // per-word operations ride native kernels ([[graft.expr.BpeWordOps]]):
  // the loop builds a fresh plan every round, and higher-order-function
  // lambdas would embed fresh LambdaVariable ids in the generated code —
  // a full janino recompile per round (~0.2 s, dominating the sub-0.1 s
  // jobs). Kernel call sites generate identical text across rounds
  // (merge literals ride the references array), so the codegen cache hits.
  private def kernel(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.GraftColumnBridge.column(e)
  private def symsExpr: org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.GraftColumnBridge.expression(col("syms"))

  private def adjacentAny(merges: Seq[(String, String)]): Column =
    kernel(graft.expr.BpeAdjacentAny(symsExpr, merges))
  private def batchMerge(merges: Seq[(String, String)]): Column =
    kernel(graft.expr.BpeBatchMerge(symsExpr, merges))
  private def pairDeltas(merges: Seq[(String, String)]): Column =
    kernel(graft.expr.BpePairDeltas(symsExpr, merges))
  private def pairStructs: Column = kernel(graft.expr.BpePairStructs(symsExpr))
  private def trigramStructs: Column = kernel(graft.expr.BpeTrigramStructs(symsExpr))

  /** Whether a `limit(lim).collect()` size probe proves the pair census
    * fits the tracked tier. Both clauses are load-bearing: `<= threshold`
    * is the declared budget, and `< lim` proves the collect was NOT
    * exhausted — when `threshold >= Int.MaxValue - 1` the limit clamps to
    * `Int.MaxValue - 1 <= threshold`, so a census LARGER than the clamp
    * would come back exactly `lim` rows, pass the budget check alone, and
    * silently train on a truncated census. */
  private[graft] def trackedTierFits(rowsLen: Int, lim: Int,
      threshold: Long): Boolean =
    rowsLen <= threshold && rowsLen < lim

  /** Learned merge table `(merge_rank, lhs, rhs, pair_count)`, ordered by
    * rank. Stops early (fewer rows) if the vocabulary runs out of pairs.
    *
    * ADAPTIVE, in THREE tiers (same idiom as `Dedup.connectedComponents`):
    * the corpus-wide word census always runs distributed (the one corpus
    * shuffle); where the merge-learning loop runs depends on what fits on
    * the driver —
    *
    *  1. VOCAB fits (`≤ driverVocabThreshold` distinct words): the whole
    *     loop runs driver-side over the collected census with a
    *     pair→words inverted index ([[trainMergesDriver]]) — the
    *     vocabulary is language-bounded, not corpus-bounded, so this is
    *     the k-bounded-collect posture (production tokenizer trainers are
    *     built exactly this way: distributed count, bounded merge
    *     learning); 32k merges cost milliseconds, not 32k Spark jobs.
    *  2. Vocab too big but the PAIR CENSUS fits (`≤ trackedPairThreshold`
    *     distinct adjacent pairs — the census is a far smaller object
    *     than the vocab: pairs of learned symbols vs whole words carrying
    *     their symbol arrays): the vocab stays DISTRIBUTED and the census
    *     is TRACKED on the driver ([[trainMergesTracked]]) — argmax is a
    *     driver-side ordered-set head (zero Spark jobs), each round runs
    *     ONE distributed job (the delta collect over only the words that
    *     contained an accepted pair), and the batch-safety proof checks
    *     every threat against its EXACT count (no uncollected-pair
    *     guard), so batches run maximal. This is the realistic-merge-
    *     count tier: 32k merges never pay a distributed census argmax or
    *     a census patch shuffle.
    *  3. Neither fits: the fully distributed loop with an incrementally
    *     patched census, learning UP TO `batchK` merges per round when
    *     the batch-safety proof allows ([[acceptBatch]] — provably
    *     identical to the serial loop; chain-structured corpora where
    *     each merge feeds the next degrade gracefully to singleton
    *     rounds at one job each).
    *
    * Setting a threshold to 0 disables its tier. All three paths are
    * integer-exact and byte-identical (ties compare in UTF-8 byte order
    * everywhere, matching Spark's UTF8String and the oracle's memcmp). */
  def trainMerges(docs: DataFrame, nMerges: Int = 6,
      driverVocabThreshold: Long = 500000L, batchK: Int = 8,
      trackedPairThreshold: Long = 2000000L): DataFrame = {
    require(batchK >= 1, "batchK must be >= 1")
    val spark = docs.sparkSession
    // vocabulary census — the ONLY corpus-wide shuffle
    var vocab = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))").as("syms"))
      // the word census is LANGUAGE-bounded (millions of rows at any
      // corpus scale), so the per-round loop state lives in a handful of
      // partitions — 32-task stages on a 50k-row frame would pay ~10×
      // the scheduling overhead of the actual work, every round
      .coalesce(8)
      .localCheckpoint()

    // tier probe and census collect FUSED into one job (the literalIds
    // idiom): the driver tier needed the full collect anyway, so the
    // old count()-then-collect paid a whole extra job per train call;
    // a vocab larger than the clamp comes back exactly `lim` rows and
    // falls through to the distributed tiers (one capped collect
    // wasted, bounded by the threshold the caller already declared the
    // driver could hold)
    if (driverVocabThreshold > 0) {
      val lim =
        if (driverVocabThreshold >= Int.MaxValue - 1L) Int.MaxValue - 1
        else (driverVocabThreshold + 1).toInt
      val rows = vocab.limit(lim).collect()
      if (trackedTierFits(rows.length, lim, driverVocabThreshold))
        return trainMergesDriver(spark, rows, nMerges)
    }

    // the initial pair census — collected whole for the tracked tier,
    // kept distributed for tier 3
    val censusPlan = vocab
      .select(col("cnt"), explode(pairStructs).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("pc"))

    if (trackedPairThreshold > 0) {
      // size probe and bootstrap in ONE job: collect at most threshold+1
      // rows — exactly threshold+1 back means the census is too big and
      // tier 3 takes over (one wasted aggregation, paid once)
      val lim =
        if (trackedPairThreshold >= Int.MaxValue - 1L) Int.MaxValue - 1
        else (trackedPairThreshold + 1).toInt
      val rows = censusPlan.limit(lim).collect()
      if (trackedTierFits(rows.length, lim, trackedPairThreshold))
        return trainMergesTracked(spark, vocab,
          rows.map(r => ((r.getString(0), r.getString(1)), r.getLong(2))),
          nMerges, batchK)
    }

    // standing pair census, built ONCE — rounds patch it with deltas
    var census = censusPlan
      .coalesce(8)
      .localCheckpoint(false)

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    while (merges.size < nMerges && !exhausted) {
      val want = math.min(batchK, nMerges - merges.size)
      // materializing action 1: TakeOrdered over the lazily-checkpointed
      // census (folds in the previous round's patch + vocab rewrite).
      // Collecting DEEPER than the batch (4× + guard) costs nothing at
      // this row width but sharpens the safety proof twice over: threats
      // among the extra rows are checked against their EXACT counts, and
      // the uncollected-pair guard drops to the much smaller tail count.
      val depth = want * 4 + 1
      val t0 = System.nanoTime()
      val top = census
        .orderBy(col("pc").desc, col("l"), col("r"))
        .limit(depth).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val tArgmax = System.nanoTime()
      if (top.isEmpty) exhausted = true
      else {
        val considered = top.take(want)
        val guard = if (top.length == depth) Some(top.last._3) else None
        val accepted = acceptBatch(vocab, considered.toSeq,
          top.drop(want).toSeq, guard)
        if (sys.env.contains("GRAFT_BPE_DEBUG"))
          System.err.println(f"[bpe] argmax ${(tArgmax - t0) / 1e9}%.2fs " +
            f"accept ${(System.nanoTime() - tArgmax) / 1e9}%.2fs " +
            s"accepted ${accepted.size}/$want: " +
            accepted.map(p => s"${p._1}+${p._2}").mkString(" "))
        accepted.foreach { case (l, r, pc) =>
          merges += ((merges.size + 1, l, r, pc))
        }
        // BATCHED INCREMENTAL CENSUS PATCH: only words containing an
        // adjacent occurrence of SOME accepted pair change any count —
        // their old pairs leave, their rewritten pairs enter (one
        // kernel pass emits both signed sets). Accepted pairs are
        // pairwise symbol-disjoint (incl. merged symbols), so per-word
        // rewrites compose in any order and each merged pair nets to
        // zero (filtered by pc > 0 below).
        val pairs = accepted.map(p => (p._1, p._2))
        val deltas = vocab
          .filter(adjacentAny(pairs))
          .select(col("cnt"), explode(pairDeltas(pairs)).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("cnt") * col("p.sign")).as("d"))
        census = census.join(deltas, Seq("l", "r"), "full_outer")
          .select(col("l"), col("r"),
            (coalesce(col("pc"), lit(0L)) + coalesce(col("d"), lit(0L))).as("pc"))
          .filter(col("pc") > 0)
          .coalesce(8)
          .localCheckpoint(false)
        vocab = vocab.select(col("cnt"), batchMerge(pairs).as("syms"))
          .localCheckpoint(false)
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "pair_count")
      .orderBy("merge_rank")
  }

  /** BATCH SAFETY — the longest prefix of the collected census order that
    * provably replays the serial `learn_bpe` loop exactly. Serial picks
    * the census argmax, patches, repeats; a later candidate `c_j` may be
    * applied in the same round iff nothing an earlier accepted merge
    * changes could out-rank it at its serial step:
    *
    *  1. SYMBOL-DISJOINTNESS: `{l_j, r_j, l_j+r_j}` must not intersect
    *     any accepted `{l_i, r_i, l_i+r_i}` — then c_j's own count is
    *     untouched (merging (l,r)→lr only perturbs pairs adjacent to l,
    *     r, or lr), per-word rewrites commute, and no two merges can
    *     manufacture the same symbol.
    *  2. CREATED/BOOSTED THREATS: merge i creates pairs `(x, lr_i)` /
    *     `(lr_i, y)`, each bounded by the max single-context trigram
    *     support of (l_i, r_i) — `maxCreated_i`, measured in ONE vocab
    *     pass ([[trigramMaxes]]; every created adjacency maps injectively
    *     to a pre-merge trigram occurrence, so the bound survives batch
    *     composition). A pair holds two symbols, so it can gain from at
    *     most TWO accepted merges — its exact gain bound when its
    *     symbols are known, the two largest accepted maxCreated values
    *     when not. c_j stays the serial argmax if its count strictly
    *     exceeds (threat's old count + its gain bound) for every
    *     possible threat: collected pairs (the batch window plus a 4×
    *     tail) use their exact counts; everything deeper is bounded by
    *     the last collected row. Pairs sharing l_i/r_i only LOSE
    *     occurrences and sit after c_j in tie order — never threats.
    *
    * Acceptance stops at the FIRST failure (serial picks strictly in
    * census order, so a skipped candidate would fork history). A
    * singleton prefix skips the trigram pass entirely — that round costs
    * exactly the serial loop's one job. */
  private def acceptBatch(
      vocab: DataFrame,
      considered: Seq[(String, String, Long)],
      tail: Seq[(String, String, Long)],
      guardCount: Option[Long]): Seq[(String, String, Long)] = {
    // longest symbol-disjoint prefix (driver-side, no job)
    var symbols = Set.empty[String]
    val disjoint = considered.takeWhile { case (l, r, _) =>
      val mine = Set(l, r, l + r)
      val ok = mine.intersect(symbols).isEmpty
      if (ok) symbols ++= mine
      ok
    }
    if (disjoint.size <= 1) return considered.take(1)

    // the ONE extra job of a multi-merge round — skipped entirely when
    // the chain structure forces a singleton batch
    val maxCreated = trigramMaxes(vocab, disjoint.map(p => (p._1, p._2)))
    // pairs outside the collect: an EXISTING uncollected pair's old
    // count is ≤ guard, and a merge-CREATED pair starts from old count
    // 0 — so even when the whole census fit the collect (guardCount
    // None) created pairs remain threats and the check must run with
    // guard 0, never vacuously pass. Every COLLECTED pair checks
    // against its exact count + its exact possible gain.
    acceptBatchLoop(disjoint, maxCreated, guardCount.getOrElse(0L),
      (idx, pc, boosts) =>
        (considered.drop(idx + 1) ++ tail).forall { case (pl, pr, ppc) =>
          val gain = boosts.getOrElse(pl, 0L) + boosts.getOrElse(pr, 0L)
          gain == 0L || pc > ppc + gain
        })
  }

  /** The ACCEPTANCE half of the batch-safety proof, shared verbatim by
    * both distributed tiers (the proof must never fork between them):
    * walk the symbol-disjoint candidate prefix in census order, accept
    * while (a) a merge-CREATED pair — old count at most `createdBase`
    * (the uncollected guard; 0 when the census is fully known) — cannot
    * out-rank the candidate even with the two largest accepted trigram
    * boosts, and (b) the tier's EXISTING-pair threat clause
    * `existingOk(idx, pc, boosts)` holds (tier 3: the collected window +
    * tail at exact counts; tracked tier: every indexed pair carrying an
    * accepted merged symbol at exact counts). Acceptance stops at the
    * FIRST failure — serial picks strictly in census order, so a skipped
    * candidate would fork history.
    *
    * `boosts` maps each accepted MERGED symbol to its trigram bound —
    * the gain of a known pair is the sum over the (≤ 2) accepted merged
    * symbols it contains, and a zero-gain pair is never a threat (its
    * count and tie rank are unchanged by disjointness). */
  private def acceptBatchLoop(
      candidates: Seq[(String, String, Long)],
      maxCreated: Map[(String, String), Long],
      createdBase: Long,
      existingOk: (Int, Long, scala.collection.Map[String, Long]) => Boolean)
      : Seq[(String, String, Long)] = {
    val boosts = scala.collection.mutable.Map.empty[String, Long]
    def top2Boost: Long = boosts.values.toSeq.sorted.takeRight(2).sum
    val acc = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var stopped = false
    candidates.zipWithIndex.foreach { case (cand @ (l, r, pc), idx) =>
      if (!stopped) {
        val ok = acc.isEmpty ||
          (pc > createdBase + top2Boost && existingOk(idx, pc, boosts))
        if (ok) {
          acc += cand
          boosts(l + r) = maxCreated.getOrElse((l, r), 0L)
        } else stopped = true
      }
    }
    acc.toSeq
  }

  /** Per-pair upper bound on any single created pair's count after a
    * greedy merge of (l, r): the max weighted support of one trigram
    * context — `max_x Σ cnt·#(x,l,r)` for left neighbors, `max_y` of
    * `(l,r,y)` for right (self-junctions `…l r l r…` land in the left
    * group via x = r). One vocab pass for the whole candidate set,
    * collect is ≤ 2·|pairs| rows. */
  private def trigramMaxes(
      vocab: DataFrame, pairs: Seq[(String, String)]): Map[(String, String), Long] = {
    val plit = typedLit(pairs)
    // each trigram contributes to at most two (pair, context) cells —
    // emitted in ONE pass and aggregated in two exchanges (sum per
    // context, max per pair) instead of a union of two agg chains. The
    // side tag inside ctx keeps left and right context classes distinct.
    val tri = vocab
      .select(col("cnt"), explode(trigramStructs).as("t"))
      .select(col("cnt"), col("t.a").as("a"), col("t.b").as("b"), col("t.c").as("c"))
    tri.select(col("cnt"), explode(array(
        struct(col("b").as("l"), col("c").as("r"),
          concat(lit("L "), col("a")).as("ctx")),
        struct(col("a").as("l"), col("b").as("r"),
          concat(lit("R "), col("c")).as("ctx")))).as("x"))
      .filter(array_contains(plit,
        struct(col("x.l").as("_1"), col("x.r").as("_2"))))
      .groupBy(col("x.l").as("l"), col("x.r").as("r"), col("x.ctx").as("ctx"))
      .agg(sum(col("cnt")).as("s"))
      .groupBy("l", "r").agg(max(col("s")).as("m"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
  }

  /** UTF-8 byte order — Spark's UTF8String comparison and the oracle's
    * memcmp; java.lang.String compareTo (UTF-16 code units) DIVERGES for
    * supplementary characters, so ties must not use it. */
  private def bytesCompare(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def bytesLt(a: String, b: String): Boolean = bytesCompare(a, b) < 0

  /** The serial census order — (count DESC, lhs byte-ASC, rhs byte-ASC) —
    * as an ordering over `(count, lhs, rhs)` tuples, shared by the
    * tracked tier's standing ordered set. */
  private val censusOrder: Ordering[(Long, String, String)] =
    new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(y._1, x._1)
        if (c != 0) c
        else {
          val cl = bytesCompare(x._2, y._2)
          if (cl != 0) cl else bytesCompare(x._3, y._3)
        }
      }
    }

  /** TIER 2 — DRIVER-TRACKED census over a DISTRIBUTED vocab: the merge
    * loop for realistic merge counts (32k+) when the vocabulary is too
    * big to collect but its pair census is not.
    *
    * The exact pair census lives in driver memory as a count map plus an
    * ordered set in serial census order, so the per-round argmax is an
    * ordered-set head — ZERO Spark jobs — and the only distributed work
    * per round is the DELTA job: one pass over the (kernel-filtered)
    * words that contained an accepted pair, whose signed pair deltas
    * collect back and patch the tracked census (delta size is bounded by
    * the affected words' adjacent-pair variety, census-scale at worst,
    * typically tiny). The vocab itself is rewritten lazily
    * (`localCheckpoint(false)`) and materializes as a side effect of the
    * NEXT round's delta job, so plans stay constant-size across
    * thousands of rounds; dropped rounds' checkpoint blocks are
    * reclaimed by Spark's ContextCleaner once unreferenced, the same
    * contract as the tier-3 loop.
    *
    * Batching replays the serial loop under the SAME proof obligations
    * as [[acceptBatch]], but with the census fully known every threat
    * class sharpens to exactness: candidate prefixes come off the exact
    * global order (never a collect window), existing pairs that could
    * gain occurrences (their lhs/rhs equals an accepted merged symbol —
    * possible when a merge re-creates a string that already exists as a
    * symbol) are checked against their EXACT counts, and the only
    * bounded class left is merge-CREATED pairs, which start from count 0
    * and are bounded by the accepted trigram maxes ([[trigramMaxes]], the
    * one extra job of a multi-merge round). No uncollected-pair guard
    * exists, so acceptance is maximal given the trigram bounds — never
    * fewer merges per round than tier 3 can prove safe. */
  private def trainMergesTracked(
      spark: org.apache.spark.sql.SparkSession,
      vocab0: DataFrame,
      census0: Array[((String, String), Long)],
      nMerges: Int, batchK: Int): DataFrame = {
    import scala.collection.mutable
    var vocab = vocab0
    val counts = mutable.HashMap.empty[(String, String), Long]
    val order = mutable.TreeSet.empty[(Long, String, String)](censusOrder)
    // symbol → pairs containing it, maintained INCREMENTALLY with the
    // census (not rebuilt per round — a per-round census scan would make
    // driver CPU O(rounds × census) at the tier's own scale): the
    // acceptance loop's exact existing-threat lookups read only the
    // accepted merged symbols' buckets
    val bySym = mutable.HashMap.empty[String, mutable.HashSet[(String, String)]]
    def indexPair(p: (String, String)): Unit = {
      bySym.getOrElseUpdate(p._1, mutable.HashSet.empty) += p
      if (p._2 != p._1)
        bySym.getOrElseUpdate(p._2, mutable.HashSet.empty) += p
    }
    def unindexPair(p: (String, String)): Unit =
      Seq(p._1, p._2).distinct.foreach { s =>
        bySym.get(s).foreach { set =>
          set -= p; if (set.isEmpty) { bySym.remove(s); () }
        }
      }
    census0.foreach { case (p, c) =>
      counts(p) = c
      order += ((c, p._1, p._2))
      indexPair(p)
    }

    val merges = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    while (merges.size < nMerges && order.nonEmpty && !exhausted) {
      val want = math.min(batchK, nMerges - merges.size)
      // candidate prefix straight off the EXACT census order: contiguous
      // (serial picks strictly in census order — a skipped pair would
      // fork history), stopping at the first symbol-non-disjoint pair
      val prefix = mutable.ArrayBuffer.empty[(String, String, Long)]
      var symbols = Set.empty[String]
      val it = order.iterator
      var open = true
      while (open && prefix.size < want && it.hasNext) {
        val (c, l, r) = it.next()
        val mine = Set(l, r, l + r)
        if (mine.intersect(symbols).isEmpty) {
          prefix += ((l, r, c)); symbols ++= mine
        } else open = false
      }
      val t0 = System.nanoTime()
      val accepted: Seq[(String, String, Long)] =
        if (prefix.size <= 1) prefix.toSeq
        else {
          // the ONE extra job of a multi-merge round
          val maxCreated = trigramMaxes(vocab, prefix.map(p => (p._1, p._2)).toSeq)
          // the SHARED acceptance loop with the census fully known:
          // createdBase 0 (no uncollected existing pairs), and the
          // existing-threat clause reads exact counts through the
          // incrementally maintained symbol index — only pairs carrying
          // an accepted merged symbol can gain, everything else keeps
          // its count and serial rank by disjointness
          acceptBatchLoop(prefix.toSeq, maxCreated, 0L,
            (_, pc, boosts) => boosts.keysIterator.forall(s =>
              bySym.get(s).forall(_.forall { p =>
                val gain = boosts.getOrElse(p._1, 0L) + boosts.getOrElse(p._2, 0L)
                gain == 0L || pc > counts(p) + gain
              })))
        }
      if (accepted.isEmpty) exhausted = true
      else {
        accepted.foreach { case (l, r, pc) =>
          merges += ((merges.size + 1, l, r, pc))
        }
        // the round's ONE materializing job: signed pair deltas from the
        // words that contained an accepted pair (folds in the previous
        // round's lazy vocab rewrite), collected and patched into the
        // tracked census
        val pairs = accepted.map(p => (p._1, p._2))
        val deltas = vocab
          .filter(adjacentAny(pairs))
          .select(col("cnt"), explode(pairDeltas(pairs)).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("cnt") * col("p.sign")).as("d"))
          .collect()
        if (sys.env.contains("GRAFT_BPE_DEBUG"))
          System.err.println(
            f"[bpe] tracked round ${(System.nanoTime() - t0) / 1e9}%.2fs " +
              s"accepted ${accepted.size}/$want deltas ${deltas.length}: " +
              accepted.map(p => s"${p._1}+${p._2}").mkString(" "))
        deltas.foreach { row =>
          val p = (row.getString(0), row.getString(1))
          val d = row.getLong(2)
          if (d != 0L) {
            val old = counts.getOrElse(p, 0L)
            if (old != 0L) order.remove((old, p._1, p._2))
            val nv = old + d
            if (nv > 0L) {
              counts(p) = nv; order += ((nv, p._1, p._2))
              if (old == 0L) indexPair(p)
            } else {
              counts.remove(p)
              if (old != 0L) unindexPair(p)
            }
          }
        }
        vocab = vocab.select(col("cnt"), batchMerge(pairs).as("syms"))
          .localCheckpoint(false)
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "pair_count")
      .orderBy("merge_rank")
  }

  /** Driver-side exact `learn_bpe` over the collected word census: pair
    * counts plus a pair→words inverted index, so each merge round updates
    * only the words that contain the merged pair. Semantics are pinned to
    * the distributed path: overlapping adjacent pairs all count, the
    * rewrite is greedy left-to-right non-overlapping, ties break by
    * (count DESC, lhs byte-ASC, rhs byte-ASC). */
  private def trainMergesDriver(
      spark: org.apache.spark.sql.SparkSession,
      vocabRows: Array[org.apache.spark.sql.Row], nMerges: Int): DataFrame = {
    import scala.collection.mutable
    val words: Array[(Long, Array[String])] = vocabRows.map { r =>
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
