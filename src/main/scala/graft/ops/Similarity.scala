package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.{HashPlaneDot, VecDot}

/** Embedding similarity search over `array<float>` columns.
  *
  * Baseline: brute-force cosine top-k — the query side is a 1-row (or
  * few-row) broadcast, so the candidate table is scanned once, never
  * shuffled, and the top-k is a TakeOrdered (no global sort).
  *
  * Scale path: IVF-style pruning — candidates are joined only within a
  * coarse partition (here the `label` column stands in for a centroid
  * assignment), cutting the candidate set by the number of partitions.
  * At 100 TB the same shape holds: partition the vector table by centroid
  * id, broadcast the probes, and the per-probe work is one partition.
  */
object Similarity {

  /** Sequential double dot product (deterministic summation order) via the
    * native codegen kernel [[graft.expr.VecDot]] — same value, bit for bit,
    * as the `aggregate(zip_with(...))` fold it replaces, but the loop is
    * compiled primitive access instead of an interpreted per-element
    * lambda. */
  private def dot(x: String, y: String): Column =
    GraftColumnBridge.column(VecDot(
      GraftColumnBridge.expression(col(x)), GraftColumnBridge.expression(col(y))))

  /** L2 norm of an `array<float>` column. */
  def norm(vecCol: String): Column = sqrt(dot(vecCol, vecCol))

  /** Cosine similarity between two `array<float>` columns, computed as a
    * sequential double fold (deterministic), rounded to 6 dp so the value
    * is stable across engines/summation orders. */
  def cosine(aCol: String, bCol: String): Column =
    round(dot(aCol, bCol) / (norm(aCol) * norm(bCol)), 6)

  /** Cosine from precomputed per-vector norms: one dot per pair instead of
    * three. Norms are per-vector properties — computing them inside the
    * pair join redoes O(dim) work |pairs| times; hoisting them to the scan
    * side is the difference between O(pairs·dim) and O(3·pairs·dim). */
  private[ops] def cosineFromNorms(
      aCol: String, bCol: String, aNorm: String, bNorm: String): Column =
    round(dot(aCol, bCol) / (col(aNorm) * col(bNorm)), 6)

  private def cosineN(aCol: String, bCol: String, aNorm: String, bNorm: String): Column =
    cosineFromNorms(aCol, bCol, aNorm, bNorm)

  /** HARD-NEGATIVE mining for contrastive training: for each probe
    * vector, the `k` most-similar vectors carrying a DIFFERENT label —
    * the near-miss negatives that make contrastive/embedding training
    * informative (easy random negatives teach nothing; hard negatives
    * sit just across the decision boundary).
    *
    * EXACT by default, adaptive by OPT-IN (the two paths differ in
    * RECALL, not determinism — so the default must never flip behavior
    * as the corpus grows; a caller whose corpus outgrows the all-pairs
    * scan opts into routing by passing a finite `exactPairBudget`):
    * when |probes|·|corpus| fits under the budget, the mining is the
    * exact broadcast scan ([[hardNegativesExact]]); above it — the
    * 100 TB posture, where an all-pairs scan is compute-infeasible — it
    * routes through the learned IVF index ([[hardNegativesIvf]]): one
    * kmeans coarse quantizer, each probe searched only against its
    * `nProbe` nearest clusters' inverted lists. Both paths are
    * deterministic and oracle-reproducible; `exactPairBudget = 0`
    * forces the IVF route, the default `Long.MaxValue` PINS the exact
    * route (skips the routing counts entirely). A budget-driven flip to
    * the routed path logs a warning, so the recall change is never
    * silent. */
  def hardNegatives(emb: DataFrame, probe: Column, k: Int = 3,
      kClusters: Int = 4, iters: Int = 2, nProbe: Int = 2,
      exactPairBudget: Long = Long.MaxValue): DataFrame = {
    if (exactPairBudget == Long.MaxValue) return hardNegativesExact(emb, probe, k)
    val route =
      exactPairBudget > 0 && {
        // two metadata-cheap counts decide the route (parquet counts are
        // footer-served; the filter count is one column-pruned pass).
        // Division, not multiplication: probeN·corpusN overflows Long at
        // real scale, and a wrapped-negative product would silently pick
        // the all-pairs path on exactly the corpora that can't afford it
        val corpusN = emb.count()
        val probeN = emb.filter(probe).count()
        probeN == 0L || corpusN <= exactPairBudget / probeN
      }
    if (route) hardNegativesExact(emb, probe, k)
    else {
      if (exactPairBudget > 0)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"hardNegatives: pair count exceeds exactPairBudget=$exactPairBudget" +
            " — routing through the IVF index (approximate recall)")
      hardNegativesIvf(emb, probe, k, kClusters, iters, nProbe)
    }
  }

  /** Exact mining: the probe set BROADCASTS into one pass over the
    * corpus (the [[knn]] posture); label inequality is a residual filter
    * on the broadcast pair stream, per-vector norms are hoisted to the
    * scan side, and the top-k is a per-probe row_number window — corpus
    * rows shuffle once, keyed by probe. */
  def hardNegativesExact(emb: DataFrame, probe: Column, k: Int = 3): DataFrame = {
    val withNorm = emb.withColumn("v_norm", norm("embedding"))
    val p = withNorm.filter(probe).select(
      col("vec_id").as("q_id"), col("label").as("q_label"),
      col("embedding").as("q_emb"), col("v_norm").as("q_norm"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id"))
    withNorm.crossJoin(broadcast(p))
      .filter(col("label") =!= col("q_label"))
      .select(col("q_id"), col("q_label"), col("vec_id").as("c_id"),
        col("label").as("c_label"),
        cosineN("embedding", "q_emb", "v_norm", "q_norm").as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .orderBy("q_id", "rn")
  }

  /** Per-row array of the `nProbe` nearest centroid ids, by the same
    * `-2·v⋅c + |c|²` score and (score, id) tie order as
    * [[Clustering.assign]] — `array_sort` over (score, id) structs is
    * the multi-probe generalization of assign's `array_min`. */
  private[ops] def probedClusters(centroids: Seq[Seq[Double]], nProbe: Int): Column = {
    val scored = centroids.zipWithIndex.map { case (cv, j) =>
      val normSq = cv.foldLeft(0.0)((a, x) => a + x * x)
      struct(
        (lit(-2.0) * GraftColumnBridge.column(VecDot(
          GraftColumnBridge.expression(col("embedding")),
          GraftColumnBridge.expression(typedLit(cv)))) + lit(normSq)).as("d"),
        lit(j).as("c"))
    }
    slice(array_sort(array(scored: _*)), 1, nProbe).getField("c")
  }

  /** IVF-ROUTED hard-negative mining — the scale path: the corpus is
    * assigned once to a learned kmeans coarse quantizer (map-side argmin
    * over broadcast centroid literals, [[Clustering.assign]]); each
    * probe explodes to its `nProbe` nearest clusters and candidates come
    * from an EQUI-JOIN on the cluster key — never an all-pairs product —
    * with the label filter and per-probe top-k window on the joined
    * stream. At 100 TB the corpus side is the persisted ANN index table
    * ([[AnnIndex]]) bucketed on the cluster id, so a probe batch reads
    * only the probed lists' files. Recall tunes with kClusters/nProbe;
    * a candidate belongs to exactly one cluster, so no pair ever
    * duplicates across probed lists. */
  def hardNegativesIvf(emb: DataFrame, probe: Column, k: Int = 3,
      kClusters: Int = 4, iters: Int = 2, nProbe: Int = 2): DataFrame = {
    val cents = Clustering.kmeans(
      emb.select(col("vec_id"), col("embedding")), kClusters, iters).centroids
    val assigned = Clustering.assign(emb, cents)
      .withColumn("v_norm", norm("embedding"))
    hardNegativesRouted(assigned.filter(probe), assigned, cents, k, nProbe)
  }

  /** The join half of [[hardNegativesIvf]] over ALREADY-ASSIGNED rows
    * (`cluster` + `v_norm` columns present) — what the persisted
    * [[AnnIndex]] serves without re-running kmeans, with the candidate
    * side pruned to the probed lists' files. */
  private[ops] def hardNegativesRouted(probeRows: DataFrame, corpus: DataFrame,
      centroids: Seq[Seq[Double]], k: Int, nProbe: Int): DataFrame = {
    val probes = probeRows
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"), col("v_norm").as("q_norm"),
        explode(probedClusters(centroids, nProbe)).as("cluster"))
    val cands = corpus.select(col("cluster"), col("vec_id").as("c_id"),
      col("label").as("c_label"), col("embedding").as("c_emb"),
      col("v_norm").as("c_norm"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id"))
    probes.join(cands, Seq("cluster"))
      .filter(col("c_label") =!= col("q_label"))
      .select(col("q_id"), col("q_label"), col("c_id"), col("c_label"),
        cosineN("c_emb", "q_emb", "c_norm", "q_norm").as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .orderBy("q_id", "rn")
  }

  /** Brute-force cosine top-k neighbors of one query vector. */
  def knn(emb: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val withNorm = emb.withColumn("v_norm", norm("embedding"))
    val q = withNorm.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_emb"), col("v_norm").as("q_norm"))
    withNorm.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        cosineN("embedding", "q_emb", "v_norm", "q_norm").as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF-style top-1 neighbor per probe vector, searching only the probe's
    * coarse partition (`label`). */
  def ivfTop1(emb: DataFrame, probePred: Column): DataFrame = {
    val withNorm = emb.withColumn("v_norm", norm("embedding"))
    val probes = withNorm.filter(probePred)
      .select(col("vec_id").as("q_id"), col("label"),
        col("embedding").as("q_emb"), col("v_norm").as("q_norm"))
    val cands = withNorm
      .select(col("vec_id").as("c_id"), col("label"),
        col("embedding").as("c_emb"), col("v_norm").as("c_norm"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id"))
    probes.join(cands, Seq("label"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("label"), col("c_id"),
        cosineN("c_emb", "q_emb", "c_norm", "q_norm").as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("q_id", "label", "c_id", "sim")
      .orderBy("q_id")
  }

  /** IVF ANN with a LEARNED coarse quantizer: every vector is assigned to
    * its nearest [[Clustering.kmeans]] centroid (map-side argmin over the
    * broadcast centroid literals — no shuffle), then each probe searches
    * only its own cluster's inverted list. This is the genuine IVF-Flat
    * shape: at 100 TB, partition/bucket the vector table by the stored
    * `cluster` id so a probe touches one partition; recall tunes with k
    * (number of centroids) and multi-probe.
    *
    * Top-1 per probe (rows: q_id, cluster, c_id, sim). */
  def ivfSearch(emb: DataFrame, centroids: Seq[Seq[Double]], probePred: Column): DataFrame = {
    val assigned = Clustering.assign(emb, centroids).withColumn("v_norm", norm("embedding"))
    val probes = assigned.filter(probePred)
      .select(col("vec_id").as("q_id"), col("cluster"),
        col("embedding").as("q_emb"), col("v_norm").as("q_norm"))
    val cands = assigned
      .select(col("vec_id").as("c_id"), col("cluster"),
        col("embedding").as("c_emb"), col("v_norm").as("c_norm"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id"))
    probes.join(cands, Seq("cluster"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("cluster"), col("c_id"),
        cosineN("c_emb", "q_emb", "c_norm", "q_norm").as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("q_id", "cluster", "c_id", "sim")
      .orderBy("q_id")
  }

  /** Random-hyperplane LSH top-k ANN — the scale path: each vector gets a
    * sign-bit signature over `nPlanes` fixed pseudo-random hyperplanes
    * (deterministic: plane p component i = hash-derived in [-1,1]), probes
    * join candidates only within the same signature bucket, and top-k is
    * per-bucket. At 100 TB: one shuffle on the 1-int bucket key instead of
    * a cross join; recall tunes with nPlanes/multi-probe. */
  /** LSH bucket + norm columns: signature = sum over planes of
    * 2^p · (dot(v, plane_p) > 0); plane weights are an engine-portable
    * integer mix computed on the fly in the native kernel (see
    * VecOps.hashPlaneDot — the DuckDB oracle reproduces the sign, and
    * hence the bucket, bit for bit). */
  private def withBucket(emb: DataFrame, nPlanes: Int): DataFrame = {
    val sigExpr = (0 until nPlanes).map { p =>
      val dot = GraftColumnBridge.column(HashPlaneDot(
        GraftColumnBridge.expression(col("embedding")),
        GraftColumnBridge.expression(lit(p))))
      when(dot > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
    emb.withColumn("bucket", sigExpr).withColumn("v_norm", norm("embedding"))
  }

  def lshAnn(emb: DataFrame, probePred: Column, k: Int = 3, nPlanes: Int = 6): DataFrame = {
    val signed = withBucket(emb, nPlanes)
    val probes = signed.filter(probePred)
      .select(col("vec_id").as("q_id"), col("bucket"),
        col("embedding").as("q_emb"), col("v_norm").as("q_norm"))
    val cands = signed
      .select(col("vec_id").as("c_id"), col("bucket"),
        col("embedding").as("c_emb"), col("v_norm").as("c_norm"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id"))
    probes.join(cands, Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("bucket"), col("c_id"),
        cosineN("c_emb", "q_emb", "c_norm", "q_norm").as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("q_id", "bucket", "c_id", "sim", "rn")
      .orderBy("q_id", "rn")
  }

  /** PRODUCT-QUANTIZATION ANN (the ADC scan of an IVF-PQ index): train
    * `m` per-subspace codebooks with the deterministic Lloyd kmeans
    * ([[Clustering.kmeans]]), encode every corpus vector as `m` small
    * codes in ONE map-side pass (argmin over broadcast centroid
    * literals, no shuffle, no join), and answer probes by asymmetric
    * distance computation: per-probe lookup tables (`m`×`k` quantized
    * `-2·q⋅c + |c|²` entries, computed on the driver from the
    * benchmark-sized probe set — the same driver-state shape as the
    * centroids themselves) summed per candidate via `element_at` on
    * literal arrays.
    *
    * Scale shape: the scored stream carries only `(q_id, c_id,
    * adc_micro)` longs — codes and LUTs never shuffle, payload vectors
    * never leave the scan. The per-probe top-k window shuffles id
    * triples, not vectors. At 100 TB this is the rerank half of IVF-PQ:
    * bound the candidate stream first with [[ivfSearch]]'s coarse
    * partition pruning, then ADC-scan only the probed lists.
    *
    * Determinism (oracle-reproducible): subspace training is the
    * integer-quantized Lloyd; code assignment ties break to the lower
    * code id (struct `array_min`); LUT entries are `floor(score·1e6)`
    * longs computed with the same sequential fold as the SQL twin; the
    * ADC sum is exact integer addition. */
  def pqSearch(emb: DataFrame, probePred: Column, m: Int = 4, k: Int = 8,
      iters: Int = 2, topK: Int = 5): DataFrame = {
    def emptyResult: DataFrame = {
      import org.apache.spark.sql.types._
      emb.sparkSession.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(Seq(
          StructField("q_id", LongType), StructField("c_id", LongType),
          StructField("adc_micro", LongType), StructField("rn", IntegerType))))
    }
    val firstDim = emb.select(size(col("embedding"))).head(1)
    if (firstDim.isEmpty) return emptyResult // empty corpus: nothing to index
    val dim = firstDim.head.getInt(0)
    require(dim % m == 0, s"embedding dim $dim not divisible by m=$m")
    val subDim = dim / m

    val codebooks = trainCodebooks(emb, m, k, iters, knownDim = dim)
    val codes = emb.select(col("vec_id").as("c_id"),
      pqCodes(codebooks, "embedding").as("codes"))

    // per-probe LUTs on the driver: same fold order as the SQL twin
    def partMicro(vec: Seq[Float], j: Int, cv: Seq[Double]): Long = {
      var s = 0.0
      var i = 0
      while (i < subDim) { s += vec(j * subDim + i).toDouble * cv(i); i += 1 }
      val normSq = cv.foldLeft(0.0)((a, x) => a + x * x)
      math.floor((-2.0 * s + normSq) * 1e6).toLong
    }
    val probeLuts: Seq[(Long, Seq[Seq[Long]])] = emb.filter(probePred)
      .select(col("vec_id"), col("embedding")).collect().toSeq
      .map { r =>
        val vec = r.getSeq[Float](1)
        val luts = (0 until m).map { j =>
          codebooks(j).map(cv => partMicro(vec, j, cv))
        }
        (r.getLong(0), luts)
      }.sortBy(_._1)

    if (probeLuts.isEmpty) return emptyResult // legal data-dependent input

    // ADC: explode per-probe (q_id, sum of LUT lookups) structs map-side
    val perProbe = probeLuts.map { case (qid, luts) =>
      val adc = (0 until m).map { j =>
        element_at(typedLit(luts(j)), col("codes").getItem(j) + 1)
      }.reduce(_ + _)
      struct(lit(qid).as("q_id"), adc.as("adc_micro"))
    }
    val w = Window.partitionBy("q_id").orderBy(col("adc_micro"), col("c_id"))
    codes
      .select(col("c_id"), explode(array(perProbe: _*)).as("s"))
      .select(col("s.q_id").as("q_id"), col("c_id"),
        col("s.adc_micro").as("adc_micro"))
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select("q_id", "c_id", "adc_micro", "rn")
      .orderBy("q_id", "rn")
  }

  /** Train `m` per-subspace PQ codebooks (k centroids each) with the
    * deterministic Lloyd kmeans — m independent runs over sliced
    * columns whose driver-blocking actions (init collect + one
    * sums-collect per update) run CONCURRENTLY; Spark schedules jobs
    * from multiple threads freely and each result is identical to the
    * sequential run. Returns `codebooks(j)(c)` = centroid `c` of
    * subspace `j`. */
  private[ops] def trainCodebooks(
      emb: DataFrame, m: Int, k: Int, iters: Int,
      knownDim: Int = -1): Seq[Seq[Seq[Double]]] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    // callers that already probed the dimension pass it — no second
    // driver-blocking head() job per training call
    val dim =
      if (knownDim > 0) knownDim
      else emb.select(size(col("embedding"))).head.getInt(0)
    require(dim % m == 0, s"embedding dim $dim not divisible by m=$m")
    val subDim = dim / m
    Await.result(
      Future.traverse((0 until m).toList) { j =>
        Future(Clustering.kmeans(
          emb.select(col("vec_id"),
            slice(col("embedding"), j * subDim + 1, subDim).as("embedding")),
          k, iters).centroids)
      }, scala.concurrent.duration.Duration.Inf)
  }

  /** PQ ENCODE as one map-side projection: array of `m` per-subspace
    * argmin codes over the broadcast codebook literals — same
    * `-2·v⋅c + |c|²` score and (score, id) tie order as
    * [[Clustering.assign]], no shuffle, no join. */
  private[ops] def pqCodes(
      codebooks: Seq[Seq[Seq[Double]]], vecCol: String): Column = {
    val subDim = codebooks.head.head.length
    array(codebooks.zipWithIndex.map { case (cb, j) =>
      val sub = slice(col(vecCol), j * subDim + 1, subDim)
      val scored = cb.zipWithIndex.map { case (cv, c) =>
        val normSq = cv.foldLeft(0.0)((a, x) => a + x * x)
        struct(
          (lit(-2.0) * GraftColumnBridge.column(VecDot(
            GraftColumnBridge.expression(sub),
            GraftColumnBridge.expression(typedLit(cv)))) + lit(normSq)).as("d"),
          lit(c).as("c"))
      }
      array_min(array(scored: _*)).getField("c")
    }: _*)
  }

  /** Per-probe ADC lookup table as one map-side projection on the PROBE
    * rows (the distributed twin of [[pqSearch]]'s driver LUTs, for probe
    * sets that are DataFrames rather than driver collections):
    * `lut(j)(c) = floor((-2·q_j⋅c + |c|²)·1e6)` longs — the same
    * sequential-fold arithmetic as the driver version, so ADC sums stay
    * integer-exact and oracle-reproducible. m×k longs per probe row. */
  private[ops] def pqLut(
      codebooks: Seq[Seq[Seq[Double]]], vecCol: String): Column = {
    val subDim = codebooks.head.head.length
    array(codebooks.zipWithIndex.map { case (cb, j) =>
      val sub = slice(col(vecCol), j * subDim + 1, subDim)
      array(cb.map { cv =>
        val normSq = cv.foldLeft(0.0)((a, x) => a + x * x)
        floor((lit(-2.0) * GraftColumnBridge.column(VecDot(
          GraftColumnBridge.expression(sub),
          GraftColumnBridge.expression(typedLit(cv)))) + lit(normSq)) * lit(1e6))
          .cast("long")
      }: _*)
    }: _*)
  }

  /** The ADC-scan + exact-rerank core of IVF-PQ search over
    * ALREADY-ROUTED probes and ALREADY-ENCODED candidates — what the
    * persisted [[AnnIndex]] serves off its pruned lists.
    *
    * Scale shape (the FAISS IVF-PQ serving posture): the candidate
    * SCORING stream carries `(cluster, c_id, codes)` only — full
    * vectors never enter the ADC join, so list IO during scoring is the
    * m-byte code column, not the 4·dim-byte payload (a 16-32× cut at
    * 100 TB). Each probe's m×k LUT is one map-side projection; the ADC
    * sum is m `element_at` lookups per pair, exact integer addition.
    * Only the top-`rerank` shortlist per probe (by ADC asc, id) joins
    * back to the inline vectors for the EXACT cosine rerank, and the
    * final top-`k` orders by (sim DESC, id) — with `rerank` covering
    * the probed lists, the result is identical to the flat scan.
    *
    * Inputs: `probes` = (q_id, q_emb, q_norm, cluster) one row per
    * routed list; `candCodes` = (cluster, c_id, codes);
    * `candVecs` = (c_id, c_emb, c_norm). */
  private[ops] def ivfPqRouted(
      probes: DataFrame, candCodes: DataFrame, candVecs: DataFrame,
      codebooks: Seq[Seq[Seq[Double]]], k: Int, rerank: Int,
      excludeSelf: Boolean): DataFrame = {
    val m = codebooks.length
    val pLut = probes.select(col("q_id"), col("cluster"),
      pqLut(codebooks, "q_emb").as("__lut"))
    val adc = (0 until m).map(j =>
      element_at(col("__lut").getItem(j), col("codes").getItem(j) + 1))
      .reduce(_ + _)
    // ONE cheap count (every caller hands probes off a localCheckpoint)
    // powers every probe-side broadcast gate below: the LUT rows, the
    // rerank probe vectors, and the shortlist product budget. The probe
    // side is usually query-batch-sized and broadcasting it keeps the
    // big pruned code scan map-side — but a corpus-sized probe file
    // (decontamination against a 20M-row test set) must fall back to a
    // shuffle join instead of OOMing the driver. Gates are BYTE-aware
    // ([[gatedProbeBroadcast]]): a LUT row weighs m·k longs and a
    // vector row dim floats, so a row budget alone would still pass
    // driver-fatal broadcasts at FAISS-typical m=16/k=256 or dim=768.
    val probeRows = probes.count().max(1L) // ≥ distinct q_ids (rows are per list)
    val dim = codebooks.map(_.head.length).sum.toLong
    val wAdc = Window.partitionBy("q_id").orderBy(col("adc_micro"), col("c_id"))
    val shortlist = candCodes.join(
        gatedProbeBroadcast(pLut, probeRows,
          m.toLong * codebooks.head.length * 8 + 32),
        Seq("cluster"))
      .filter(if (excludeSelf) col("q_id") =!= col("c_id") else lit(true))
      .select(col("q_id"), col("cluster"), col("c_id"), adc.as("adc_micro"))
      .withColumn("arn", row_number().over(wAdc))
      .filter(col("arn") <= rerank)
      .drop("arn")
    // q_emb/q_norm are functional on q_id (the routing explode copied
    // them per list) — one row per probe for the rerank join
    val qVecs = probes.select(col("q_id"), col("q_emb"), col("q_norm"))
      .dropDuplicates("q_id")
    // the |probes|·rerank ID-TRIPLE shortlist and the |probes|-sized
    // probe vectors broadcast SEPARATELY against the streaming vector
    // scan — joining them first would duplicate every probe's 4·dim-byte
    // vector onto each of its shortlist rows, unbounded in the
    // large-rerank (flat-parity) mode; apart, both stay metadata-small
    // and the big pruned lists never shuffle for the rerank either.
    // The shortlist hint itself is GATED on its worst-case SIZE —
    // probe rows × rerank, the PRODUCT, not rerank alone (a 100k-probe
    // batch at a modest rerank is as driver-fatal as one probe at
    // Int.MaxValue): above the row budget the rerank join falls back to
    // shuffle (AQE may still pick a broadcast from the OBSERVED size).
    val shortlistBudget = probes.sparkSession.conf
      .get("spark.graft.ann.shortlistBroadcastMaxRows", "4194304").toLong
    // divide, don't multiply — rerank may be Int.MaxValue
    val bcastShortlist = rerank.toLong <= shortlistBudget &&
      probeRows <= shortlistBudget / rerank.toLong.max(1L)
    val wSim = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id"))
    candVecs.join(if (bcastShortlist) broadcast(shortlist) else shortlist,
        Seq("c_id"))
      .join(gatedProbeBroadcast(qVecs, probeRows, dim * 4 + 48), Seq("q_id"))
      .select(col("q_id"), col("cluster"), col("c_id"), col("adc_micro"),
        cosineN("c_emb", "q_emb", "c_norm", "q_norm").as("sim"))
      .withColumn("rn", row_number().over(wSim))
      .filter(col("rn") <= k)
      .select("q_id", "cluster", "c_id", "adc_micro", "sim", "rn")
      .orderBy("q_id", "rn")
  }

  /** Train the coarse IVF quantizer and (for `pqM > 0`) the per-subspace
    * PQ codebooks CONCURRENTLY — independent trainings, so wall-clock is
    * the slower one, not the sum; each result identical to its
    * sequential run. The ONE concurrency site shared by [[ivfPqSearch]]
    * and [[graft.ops.AnnIndex.bootstrap]] — error-handling or timeout
    * changes land in both paths. */
  private[ops] def trainCoarseAndCodebooks(
      emb: DataFrame, kClusters: Int, iters: Int, pqM: Int,
      pqK: Int): (Clustering.KmeansModel, Option[Seq[Seq[Seq[Double]]]]) = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val coarseF = Future(Clustering.kmeans(
      emb.select(col("vec_id"), col("embedding")), kClusters, iters))
    val cbF = Future(
      if (pqM <= 0) None else Some(trainCodebooks(emb, pqM, pqK, iters)))
    (Await.result(coarseF, scala.concurrent.duration.Duration.Inf),
      Await.result(cbF, scala.concurrent.duration.Duration.Inf))
  }

  /** From-scratch IVF-PQ top-k search (the oracle-facing twin of
    * [[graft.ops.AnnIndex]]'s persisted PQ serving path): coarse kmeans
    * quantizer, per-subspace PQ codebooks, probes routed to their
    * `nProbe` nearest lists, ADC shortlist of `rerank` candidates per
    * probe, exact cosine rerank to `topK`. Deterministic end to end —
    * integer LUT sums, (adc, id) then (sim DESC, id) tie orders. */
  def ivfPqSearch(emb: DataFrame, probePred: Column, kClusters: Int = 4,
      iters: Int = 2, m: Int = 4, pqK: Int = 8, nProbe: Int = 2,
      rerank: Int = 10, topK: Int = 5): DataFrame = {
    val (coarse, cbsOpt) = trainCoarseAndCodebooks(emb, kClusters, iters, m, pqK)
    val codebooks = cbsOpt.get // pqM > 0 here by construction
    // both join sides and the probe filter consume the assignment — the
    // k-dot-products-per-row argmin is paid once
    val assigned = coarse.assignments
      .withColumn("v_norm", norm("embedding")).localCheckpoint()
    val probes = assigned.filter(probePred)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("v_norm").as("q_norm"),
        explode(probedClusters(coarse.centroids, nProbe)).as("cluster"))
    val candCodes = assigned.select(col("cluster"), col("vec_id").as("c_id"),
      pqCodes(codebooks, "embedding").as("codes"))
    val candVecs = assigned.select(col("vec_id").as("c_id"),
      col("embedding").as("c_emb"), col("v_norm").as("c_norm"))
    ivfPqRouted(probes, candCodes, candVecs, codebooks, topK, rerank,
      excludeSelf = true)
  }

  /** INT8 QUANTIZATION stats for embedding export (the serving/ANN-index
    * prep step): per vector, symmetric absmax quantization — `scale` =
    * max |x_i|, `q_i = round_half_up(x_i / scale · 127)` ∈ [-127, 127].
    * Returns one row per vector with the quantized checksum
    * (`q_sum`/`q_min`/`q_max`) and `scale_micro` (the scale, micro-
    * quantized to an exact integer) — engine-exact: float→double widening
    * is exact, the divide/multiply order is fixed, and rounding is
    * `floor(x + 0.5)` in both engines. All-zero vectors quantize to all
    * zeros (scale stays 0). Pure codegen (`transform`/`aggregate` array
    * ops) — one map-side pass, no shuffle, no UDF. */
  def quantizeStats(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val scale = expr(
      s"aggregate($vecCol, CAST(0.0 AS DOUBLE), (m, x) -> greatest(m, abs(CAST(x AS DOUBLE))))")
    val q = expr(
      s"""transform($vecCol, x -> CAST(
         |  CASE WHEN __scale = 0.0 THEN 0.0
         |       ELSE floor(CAST(x AS DOUBLE) / __scale * 127.0 + 0.5) END
         |  AS BIGINT))""".stripMargin)
    emb.withColumn("__scale", scale)
      .withColumn("__q", q)
      .select(col(idCol),
        expr("aggregate(__q, CAST(0 AS BIGINT), (a, x) -> a + x)").as("q_sum"),
        expr("array_min(__q)").as("q_min"),
        expr("array_max(__q)").as("q_max"),
        expr("CAST(floor(__scale * 1000000.0 + 0.5) AS BIGINT)").as("scale_micro"))
      .orderBy(idCol)
  }

  /** EMBEDDING-SPACE DECONTAMINATION — the semantic twin of the n-gram
    * `Decontam.crossSplitContainment`: flag corpus ("train") vectors
    * whose cosine similarity to any probe (benchmark/test) vector
    * reaches `threshold`, so they can be dropped before training.
    *
    * Scale shape: candidates come from an equi-join on the portable LSH
    * hyperplane bucket (identical signature to [[lshAnn]]; the oracle
    * reproduces buckets bit for bit), never an all-pairs product, and
    * the probe side of a decontamination run is benchmark-sized so it
    * is broadcast — the corpus side streams map-side with no shuffle.
    * Single-signature LSH trades recall for candidate volume exactly
    * like [[lshAnn]]: lower `nPlanes` (or union several plane sets) for
    * higher recall.
    *
    * Output: one row per contaminated corpus vector — hit count, best
    * similarity, lowest matching probe id — ordered by vector id. */
  def semanticDecontam(emb: DataFrame, probePred: Column,
      threshold: Double, nPlanes: Int = 6): DataFrame = {
    val signed = withBucket(emb, nPlanes)
    val probes = signed.filter(probePred)
      .select(col("vec_id").as("q_id"), col("bucket"),
        col("embedding").as("q_emb"), col("v_norm").as("q_norm"))
    val corpus = signed.filter(!probePred)
      .select(col("vec_id").as("c_id"), col("bucket"),
        col("embedding").as("c_emb"), col("v_norm").as("c_norm"))
    corpus.join(broadcast(probes), Seq("bucket"))
      .select(col("c_id"), col("q_id"),
        cosineN("c_emb", "q_emb", "c_norm", "q_norm").as("sim"))
      .filter(col("sim") >= threshold)
      .groupBy("c_id")
      .agg(count(lit(1)).as("n_probe_hits"),
        max(col("sim")).as("top_sim"),
        min(col("q_id")).as("first_probe"))
      .orderBy("c_id")
  }

  /** IVF-ROUTED semantic decontamination — the from-scratch twin of
    * [[graft.ops.AnnIndex.decontam]] (the oracle-facing reference for
    * the persisted-index route): the coarse quantizer trains on the
    * CORPUS (the rows a decontamination run protects — probes are
    * external to the index), each probe routes to its `nProbe` nearest
    * lists, and the exact cosine gate runs over the cluster equi-join —
    * never an all-pairs product. Same output contract as
    * [[semanticDecontam]]; recall tunes with kClusters/nProbe instead
    * of LSH planes. At 100 TB the corpus side is the persisted
    * [[graft.ops.AnnIndex]], so the scan reads only the probed lists'
    * files. */
  def semanticDecontamIvf(emb: DataFrame, probePred: Column,
      threshold: Double, kClusters: Int = 4, iters: Int = 2,
      nProbe: Int = 2): DataFrame = {
    val model = Clustering.kmeans(
      emb.filter(!probePred).select(col("vec_id"), col("embedding")),
      kClusters, iters)
    val cands = model.assignments
      .withColumn("v_norm", norm("embedding"))
      .select(col("cluster"), col("vec_id").as("c_id"),
        col("embedding").as("c_emb"), col("v_norm").as("c_norm"))
    // checkpointed like AnnIndex.routedProbes: the broadcast gate's
    // stats pass and the cluster join read ONE materialization instead
    // of re-evaluating the probe lineage (a corpus scan) twice
    val probes = emb.filter(probePred)
      .withColumn("q_norm", norm("embedding"))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("q_norm"),
        explode(probedClusters(model.centroids, nProbe)).as("cluster"))
      .localCheckpoint()
    routedDecontamHits(cands, probes, threshold)
  }

  /** The decontamination OUTPUT CONTRACT, shared by the from-scratch IVF
    * route and the persisted-index route ([[graft.ops.AnnIndex.decontam]])
    * so the twins cannot silently diverge: the routed probe rows join
    * into the candidate stream on the cluster key, exact cosine gate,
    * one row per flagged corpus vector — hit count, best similarity,
    * lowest matching probe id — ordered by vector id. The probe
    * broadcast runs through the SAME byte-aware gate as the PQ serving
    * path ([[gatedProbeBroadcast]]): benchmark-sized probe sets stream
    * the corpus scan map-side, a corpus-sized probe file falls back to
    * a shuffle join instead of OOMing the driver. Row count and vector
    * width come from ONE stats pass over the (caller-checkpointed)
    * probe frame. */
  private[ops] def routedDecontamHits(cands: DataFrame, probes: DataFrame,
      threshold: Double): DataFrame = {
    val stats = probes
      .agg(count(lit(1)).as("n"), max(size(col("q_emb"))).as("d")).head
    val probeRows = stats.getLong(0)
    val dim = if (stats.isNullAt(1)) 0L else stats.getInt(1).toLong
    val probeSide = gatedProbeBroadcast(probes, probeRows, dim * 4 + 48)
    cands.join(probeSide, Seq("cluster"))
      .select(col("c_id"), col("q_id"),
        cosineN("c_emb", "q_emb", "c_norm", "q_norm").as("sim"))
      .filter(col("sim") >= threshold)
      .groupBy("c_id")
      .agg(count(lit(1)).as("n_probe_hits"),
        max(col("sim")).as("top_sim"),
        min(col("q_id")).as("first_probe"))
      .orderBy("c_id")
  }

  /** The ONE probe-side broadcast gate (PQ LUT join, rerank vector join,
    * decontamination probe join all route here — a budget edit cannot
    * diverge the twins): hint a broadcast only when the probe side's
    * ESTIMATED bytes (`rows × bytesPerRow`, payload-aware — a LUT row
    * weighs m·k longs, a vector row dim floats) fit
    * `spark.graft.ann.probeBroadcastMaxBytes` (default 128 MiB). Above
    * the budget the join falls back to shuffle (AQE may still elect a
    * broadcast from the OBSERVED size); 0 forces every hint off. */
  private def gatedProbeBroadcast(df: DataFrame, rows: Long,
      bytesPerRow: Long): DataFrame = {
    val budget = df.sparkSession.conf
      .get("spark.graft.ann.probeBroadcastMaxBytes", "134217728").toLong
    if (rows <= budget / bytesPerRow.max(1L)) broadcast(df) else df
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, searched
    * within coarse partitions (LSH-bucket/IVF shape: no full cross join). */
  def nearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val withNorm = emb.withColumn("v_norm", norm("embedding"))
    val a = withNorm.select(col("vec_id").as("a_id"), col("label"),
      col("embedding").as("a_emb"), col("v_norm").as("a_norm"))
    val b = withNorm.select(col("vec_id").as("b_id"), col("label"),
      col("embedding").as("b_emb"), col("v_norm").as("b_norm"))
    a.join(b, Seq("label"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        cosineN("a_emb", "b_emb", "a_norm", "b_norm").as("sim"))
      .filter(col("sim") >= threshold)
      .orderBy("a_id", "b_id")
  }

  /** SEMDEDUP (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication by clustering the embedding space with deterministic
    * k-means ([[Clustering.kmeans]]) and searching for cosine
    * near-duplicates ONLY within each cluster — the clustering bounds
    * the otherwise-quadratic pair search, which is the paper's whole
    * trick.
    *
    * Returns the DROPPED rows (keep = everything not returned): for each
    * vector with a lower-id in-cluster neighbor at `sim >= threshold`,
    * one row `(vec_id, cluster, dup_of, max_sim)` where `dup_of` is the
    * lowest such neighbor — the same deterministic min-id survivor rule
    * as the text-dedup keep pipeline ([[graft.ops.Dedup]]).
    *
    * Scale shape: the only all-pairs work is within a cluster, and k
    * grows with the corpus so per-cluster membership stays bounded (the
    * paper runs k≈100k at web scale — the cluster-id join key is then
    * high-cardinality and shuffle-balanced, not skewed). Assignment is
    * the map-side broadcast-centroid argmin of [[Clustering.assign]];
    * norms are computed once per row before the join. */
  def semDeDup(emb: DataFrame, k: Int, iters: Int, threshold: Double): DataFrame = {
    // materialize the assignment ONCE: both sides of the in-cluster
    // self-join consume it, and the argmin projection costs k dot
    // products per row (k ≈ 100k at web scale) — recomputing it per
    // join side would double the most expensive map pass
    val assigned = Clustering.kmeans(emb.select("vec_id", "embedding"), k, iters)
      .assignments.withColumn("v_norm", norm("embedding"))
      .localCheckpoint()
    semDeDupAssigned(assigned, threshold)
  }

  /** The pair-search half of [[semDeDup]] over ALREADY-ASSIGNED rows
    * (`cluster` + `v_norm` present) — what the persisted [[AnnIndex]]
    * serves without re-running kmeans. */
  private[ops] def semDeDupAssigned(assigned: DataFrame, threshold: Double): DataFrame = {
    val a = assigned.select(col("cluster"), col("vec_id").as("a_id"),
      col("embedding").as("a_emb"), col("v_norm").as("a_norm"))
    val b = assigned.select(col("cluster"), col("vec_id").as("b_id"),
      col("embedding").as("b_emb"), col("v_norm").as("b_norm"))
    a.join(b, Seq("cluster"))
      .filter(col("a_id") < col("b_id"))
      .select(col("cluster"), col("a_id"), col("b_id"),
        cosineN("a_emb", "b_emb", "a_norm", "b_norm").as("sim"))
      .filter(col("sim") >= threshold)
      .groupBy("cluster", "b_id")
      .agg(min(col("a_id")).as("dup_of"), max(col("sim")).as("max_sim"))
      .select(col("b_id").as("vec_id"), col("cluster"), col("dup_of"), col("max_sim"))
      .orderBy("vec_id")
  }
}
