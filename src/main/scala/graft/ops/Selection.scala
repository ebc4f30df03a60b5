package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.PortableHash

/** Data selection for training pipelines: rank raw documents by how much
  * they resemble a target distribution, in the style of DSIR (Xie et al.
  * 2023, "Data Selection for Language Models via Importance Resampling").
  *
  * DSIR scores a raw document by the likelihood ratio
  * p_target(x)/p_raw(x) under hashed n-gram bag models. The statistic
  * here is the same ratio over a document's hashed-bigram bag, computed
  * with pure integer arithmetic (wide products go through DECIMAL(38,0) —
  * exact, and bit-identical to DuckDB's HUGEINT — and one integral
  * division per document), so scores reproduce exactly on any engine and
  * under any row order: no log-space float accumulation.
  */
object Selection {

  /** Distributed QUALITY-CLASSIFIER training — the fastText-style linear
    * quality filter of CCNet/LLaMA-class pipelines (label a seed of
    * "good" documents, train a linear model over hashed n-gram features,
    * score the corpus), made INTEGER-EXACT so it reproduces bit-for-bit
    * on any engine: batch perceptron instead of logistic SGD. Per round,
    * every misclassified document contributes `y·c_b` to each of its
    * feature buckets; weights are integers, margins exact DECIMAL sums —
    * no learning rate, no float accumulation, no row-order sensitivity.
    *
    * Returns the confusion census after `rounds` updates:
    * `(label, predicted, n_docs)` — the end-to-end proof that the
    * trained weights separate the seed; callers score a fresh corpus by
    * reusing the weight map ([[perceptronWeights]]).
    *
    * Scale shape: the feature bag is one codegen kernel pass per doc
    * (distinct-bucket rows, text never shuffles); each round is one
    * corpus pass — the weight vector (≤ `buckets` longs) rides into the
    * margin projection as a LITERAL map (no join for scoring), the
    * misclassified-doc join is keyed on doc_id, and the per-bucket
    * update collect is `buckets`-bounded. Driver state: `buckets` longs.
    * Rounds are bounded (3-10 in practice: batch perceptron converges or
    * cycles quickly on separable-ish data). */
  def trainQualityPerceptron(docs: DataFrame, positive: Column,
      buckets: Int = 256, rounds: Int = 3,
      driverRowLimit: Int = 2000000): DataFrame = {
    val (w, feats) = perceptronWeights(docs, positive, buckets, rounds,
      driverRowLimit)
    marginFrame(w, feats)
      .select(col("y").as("label"),
        when(col("margin") > 0, 1L).otherwise(-1L).as("predicted"))
      .groupBy("label", "predicted")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("label", "predicted")
  }

  /** The APPLY half of the quality filter: per-document margin and
    * predicted label under the trained weights — what a pipeline
    * actually gates on (keep `predicted = 1`, or threshold on the
    * margin for precision/recall control). Same one-pass literal-map
    * scoring projection as the trainer's rounds; docs without features
    * (< 2 tokens) are absent. */
  def scoreQuality(docs: DataFrame, positive: Column,
      buckets: Int = 256, rounds: Int = 3,
      driverRowLimit: Int = 2000000): DataFrame = {
    val (w, feats) = perceptronWeights(docs, positive, buckets, rounds,
      driverRowLimit)
    // the DECIMAL margin SATURATES into the long output instead of an
    // ANSI CAST_OVERFLOW — sign (the gate) is always preserved, and the
    // oracle replays the same clamp
    val maxL = lit(Long.MaxValue).cast("decimal(38,0)")
    val minL = lit(Long.MinValue).cast("decimal(38,0)")
    marginFrame(w, feats)
      .select(col("doc_id"),
        when(col("margin") > maxL, maxL)
          .when(col("margin") < minL, minL)
          .otherwise(col("margin")).cast("long").as("margin"))
      .select(col("doc_id"), col("margin"),
        when(col("margin") > 0, 1L).otherwise(-1L).as("predicted"))
      .orderBy("doc_id")
  }

  /** Shared per-doc margin frame `(doc_id, y, margin)` under frozen
    * weights — one literal-map projection + one per-doc aggregate,
    * consumed by the confusion census and the per-doc scores. */
  private def marginFrame(w: Map[Long, Long], feats: DataFrame): DataFrame =
    feats
      .withColumn("wc", weightExpr(w) * col("c"))
      .groupBy("doc_id", "y")
      .agg(sum("wc").as("margin"))

  /** The trained per-bucket weights after `rounds` batch-perceptron
    * updates, plus the feature frame (doc_id, y, b, c) they were fit on.
    * w₀ = 0, so round 1's update is the class-difference count
    * Σ y·c_b over ALL docs; later rounds update on misclassified docs
    * only (margin·y ≤ 0).
    *
    * ADAPTIVE (the [[Bpe.trainMerges]] / connected-components pattern):
    * when the sparse feature census fits under `driverRowLimit` rows it
    * collects ONCE and every round is an exact driver loop — one Spark
    * job total instead of one per round. Above the limit, each round is
    * one distributed corpus pass (per-doc margin via a whole-partition
    * window, misclassified rows fall through into the bucket update
    * aggregate — the collect stays `buckets`-bounded either way). Both
    * paths produce identical integer weights. */
  def perceptronWeights(docs: DataFrame, positive: Column,
      buckets: Int = 256, rounds: Int = 3,
      driverRowLimit: Int = 2000000)
      : (Map[Long, Long], DataFrame) = {
    require(buckets > 0, "buckets must be positive")
    require(rounds >= 1, "rounds must be >= 1")
    import org.apache.spark.sql.GraftColumnBridge
    // recomputed per distributed round (kernel recompute beats caching
    // corpus × distinct-buckets rows at scale — same as the gram frames)
    def feats = docs
      .select(col("doc_id"), when(positive, 1L).otherwise(-1L).as("y"),
        explode(GraftColumnBridge.column(graft.expr.HashedBigramBuckets(
          GraftColumnBridge.expression(col("text")), buckets))).as("f"))
      .select(col("doc_id"), col("y"), col("f.b").as("b"), col("f.c").as("c"))

    val head =
      if (driverRowLimit <= 0) Array.empty[org.apache.spark.sql.Row]
      else feats.limit(driverRowLimit + 1).collect()
    // margin-overflow guard: |w(b)| ≤ rounds·M and |margin| ≤ rounds·M²
    // where M = Σ|c| over the census — the ROW limit bounds rows, not
    // count mass, so a few pathological documents with huge bucket
    // counts could wrap Long (Scala Long does not trap) and flip margin
    // signs. M ≤ √(Long.Max/rounds) keeps every product exact; above
    // it, fall through to the distributed path's DECIMAL(38,0) margins.
    val safeMass = math.sqrt(Long.MaxValue.toDouble / rounds).toLong
    val massSafe = driverRowLimit > 0 && head.length <= driverRowLimit && {
      var m = 0L
      var i = 0
      while (i < head.length && m >= 0 && m <= safeMass) {
        m += math.abs(head(i).getLong(3)); i += 1
      }
      m >= 0 && m <= safeMass
    }
    if (massSafe) {
      // ---- driver path: exact integer loops over the collected census.
      // Margins stay in Long: the mass guard above makes every
      // intermediate product and sum provably inside 2^63; the
      // distributed path's DECIMAL covers the unbounded case.
      val docsArr = head.groupBy(_.getLong(0)).toArray.sortBy(_._1).map {
        case (_, rows) =>
          (rows.head.getLong(1),
            rows.map(r => (r.getLong(2), r.getLong(3))))
      }
      val w = new scala.collection.mutable.LongMap[Long]()
      var r = 0
      while (r < rounds) {
        val delta = new scala.collection.mutable.LongMap[Long]()
        docsArr.foreach { case (y, fs) =>
          var margin = 0L
          fs.foreach { case (b, c) => margin += w.getOrElse(b, 0L) * c }
          if (y * margin <= 0L)
            fs.foreach { case (b, c) =>
              delta(b) = delta.getOrElse(b, 0L) + y * c }
        }
        delta.foreach { case (b, dw) => w(b) = w.getOrElse(b, 0L) + dw }
        r += 1
      }
      (w.toMap, feats)
    } else {
      var w = Map.empty[Long, Long]
      var r = 0
      while (r < rounds) {
        // ONE corpus pass per round: the per-doc margin rides a whole-
        // partition window over the feature rows (no second kernel pass,
        // no doc_id re-shuffle for a semi-join), misclassified rows fall
        // through the filter into the per-bucket update aggregate
        val withMargin =
          if (w.isEmpty) feats.withColumn("margin", lit(0L)) // w₀ = 0
          else feats.withColumn("margin",
            sum(weightExpr(w) * col("c")).over(
              org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
        val delta = withMargin
          .filter(col("y") * col("margin") <= 0)
          .groupBy("b")
          .agg(sum(col("y") * col("c")).as("dw"))
          .collect()
          .map(row => row.getAs[Long]("b") -> row.getAs[Long]("dw"))
        w = delta.foldLeft(w) { case (acc, (b, dw)) =>
          acc + (b -> (acc.getOrElse(b, 0L) + dw)) }
        r += 1
      }
      (w, feats)
    }
  }

  /** The trained classifier's margin for a `text` column as ONE pure
    * projection (kernel feature bag → literal-map weight fold) — no
    * aggregate, no join, no state, so it drops into ANY plan including
    * a STREAMING one ([[graft.streaming.EventStreams.qualityGateStream]]):
    * train offline with [[perceptronWeights]], gate the ingest stream
    * with the frozen weights. Docs under 2 tokens score 0. */
  def marginColumn(w: Map[Long, Long], textCol: Column,
      buckets: Int = 256): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    val bag = GraftColumnBridge.column(graft.expr.HashedBigramBuckets(
      GraftColumnBridge.expression(textCol), buckets))
    aggregate(bag,
      lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)"),
      (acc, f) => acc + weightExprOn(w, f.getField("b")) * f.getField("c"))
  }

  /** The weight vector as a literal-map lookup column over `b` —
    * scoring is a pure projection, no join. ONE map `Literal` (not a
    * buckets-wide CreateMap expression tree, which costs a fresh codegen
    * compile per round); the looked-up weight is cast to DECIMAL(38,0)
    * so margins cannot overflow under ANSI at corpus scale. */
  private def weightExpr(w: Map[Long, Long]): Column = weightExprOn(w, col("b"))

  private def weightExprOn(w: Map[Long, Long], bucket: Column): Column = {
    // try_element_at, not element_at: under ANSI a bucket absent from
    // the weight map (scoring a fresh corpus, or a non-deterministic
    // training frame growing a bucket between rounds) must score 0, not
    // throw MAP_KEY_DOES_NOT_EXIST
    if (w.isEmpty) lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")
    else coalesce(try_element_at(typedlit(w), bucket), lit(0L))
      .cast("decimal(38,0)")
  }

  /** Hashed-bigram target affinity: for each doc,
    * `affinity_milli = 1000 · (Σ_b c_b·n_t(b)) · R / ((Σ_b c_b·n_r(b)) · T)`
    * where `c_b` is the doc's count of feature bucket `b`, `n_t`/`n_r`
    * the target/raw corpus counts of that bucket, and `T`/`R` their
    * totals — the doc's mean target-vs-raw likelihood ratio in permille.
    * 1000 ≈ typical; above = target-like, below = off-target.
    *
    * Scale shape: each document's feature bag is ONE codegen kernel pass
    * ([[graft.expr.BucketBagKernel]] — hashed-bigram bucket histogram),
    * so the explode fodder is distinct buckets per doc, not one row per
    * bigram occurrence. The bucket count table is bounded by `buckets`,
    * so it BROADCASTS into the count-weighted per-doc scoring join — no
    * shuffle of the corpus by feature; the totals are a 1-row broadcast,
    * and the per-doc aggregation is map-side combinable. The text never
    * shuffles; the wide rows are `(doc_id, bucket, count)` triples.
    *
    * @param target a boolean Column over `docs` rows marking the target
    *               distribution (must select ≥1 bigram, or the
    *               ratio's denominator is zero and ANSI mode throws) */
  def targetAffinity(docs: DataFrame, target: Column,
      buckets: Int = 4096): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    import org.apache.spark.sql.GraftColumnBridge
    val feats = docs
      .select(col("doc_id"), target.as("is_t"),
        explode(GraftColumnBridge.column(graft.expr.HashedBigramBuckets(
          GraftColumnBridge.expression(col("text")), buckets))).as("f"))
      .select(col("doc_id"), col("is_t"),
        col("f.b").as("b"), col("f.c").as("c"))
    val table = feats.groupBy("b").agg(
      sum(col("c")).as("n_r"),
      sum(when(col("is_t"), col("c")).otherwise(0L)).as("n_t"))
    val totals = table.agg(sum("n_r").as("tot_r"), sum("n_t").as("tot_t"))
    feats.join(broadcast(table), "b")
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_feats"),
        sum(col("n_t") * col("c")).as("s_t"),
        sum(col("n_r") * col("c")).as("s_r"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("n_feats"), expr(
        "CAST(s_t AS DECIMAL(38,0)) * CAST(tot_r AS DECIMAL(38,0)) * 1000 div " +
          "(CAST(s_r AS DECIMAL(38,0)) * CAST(tot_t AS DECIMAL(38,0)))")
        .as("affinity_milli"))
      .orderBy("doc_id")
  }
}
