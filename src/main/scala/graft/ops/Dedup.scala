package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines: exact, MinHash+LSH,
  * and SimHash near-duplicate candidate generation.
  *
  * Scale design:
  *   - Exact dedup is a hash aggregate on a digest of the normalized text
  *     (shuffle the 16-byte digest, not the document body).
  *   - MinHash/LSH: shingle → hash → k permutations → band signatures →
  *     candidates join only within (band, signature) buckets. Shuffles move
  *     (doc_id, small ints) — never the text — and the final bucket join is
  *     data-size-independent per bucket.
  *   - SimHash: 64 conditional-sum aggregates in ONE pass (map-side partial
  *     aggregation), then Hamming-distance pairing within a bounded probe
  *     set. At 100 TB, pair within LSH buckets of the simhash prefix
  *     instead of a global self-join.
  */
object Dedup {

  /** Exact-duplicate clusters on normalized text: digest-based, so the
    * shuffle key is 32 hex chars regardless of document size. */
  def exactClusters(docs: DataFrame): DataFrame =
    docs.select(md5(lower(trim(col("text")))).as("digest"), col("doc_id"))
      .groupBy("digest")
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_id"))
      .filter(col("n_dups") > 1)
      .orderBy("digest")

  /** Word 3-shingles of the lower-cased text (deduped downstream on the
    * shingle hash, so no string-keyed distinct here). */
  private def shingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        split(lower(trim(col("text"))), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 3), " +
          "i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))")).as("shingle"))

  /** MinHash + LSH near-duplicate candidate pairs.
    *
    * @param numPerm      number of hash permutations (signature length)
    * @param rowsPerBand  LSH rows per band; bands = numPerm / rowsPerBand
    */
  def minhashCandidates(
      spark: SparkSession,
      docs: DataFrame,
      numPerm: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    // Fixed multiplier/offset permutation family. Coefficients and the
    // masked 31-bit hash keep `pa*h + pb` well under 2^63 (ANSI mode —
    // overflow would throw). All numPerm mins are computed in ONE
    // map-side-combinable aggregate over the shingle hashes: min() is
    // duplicate-insensitive, so no distinct is needed, and the only wide
    // shuffle moves (doc_id, numPerm longs) partials — not the numPerm×
    // row blowup a permutation cross-join would produce.
    val mersenne = 2147483647L
    val minCols = (0 until numPerm).map { j =>
      val pa = 2L * j + 1L
      val pb = (j * 2654435761L + 104729L) % mersenne
      min(col("h") * lit(pa) + lit(pb)).as(s"mh$j")
    }
    val sigRows = shingles(docs)
      .select(col("doc_id"), xxhash64(col("shingle")).bitwiseAND(0x7FFFFFFFL).as("h"))
      .groupBy("doc_id")
      .agg(minCols.head, minCols.tail: _*)

    // band signature = hash of the band's sorted min values (sorted: band
    // membership is a set, keeping the signature stable under permutation
    // reordering)
    val nBands = numPerm / rowsPerBand
    val bandStructs = (0 until nBands).map { b =>
      val members = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), hash(sort_array(array(members: _*))).as("band_sig"))
    }
    val sigs = sigRows
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.band_sig").as("band_sig"))

    val a = sigs.select(col("doc_id").as("a_id"), col("band"), col("band_sig"))
    val b = sigs.select(col("doc_id").as("b_id"), col("band"), col("band_sig"))
    a.join(b, Seq("band", "band_sig"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct()
      .orderBy("a_id", "b_id")
  }

  /** 64-bit SimHash per document: per token-hash, ±1 contributions per bit
    * (unpivoted to (doc_id, bit) rows — a 64-wide single-pass aggregate
    * generates pathological whole-stage codegen, so the narrow explode +
    * two map-side-combinable aggregates is both faster to compile and
    * scales: the (doc_id, bit) partial sums combine before the shuffle). */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val bits = toks.select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, 63), i -> " +
          "CASE WHEN (shiftright(h, i) & 1) = 1 THEN 1 ELSE -1 END)"))
        .as(Seq("bit", "pm")))
    bits.groupBy("doc_id", "bit").agg(sum(col("pm")).as("s"))
      .groupBy("doc_id")
      .agg(sum(expr(
        "CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), bit) ELSE CAST(0 AS BIGINT) END"))
        .as("simhash"))
  }

  /** SimHash near-duplicate candidate pairs within a probe set, by Hamming
    * distance on the 64-bit signatures. */
  def simhashCandidates(docs: DataFrame, maxHamming: Int = 12): DataFrame = {
    val sig = simhash(docs)
    val a = sig.select(col("doc_id").as("a_id"), col("simhash").as("a_sig"))
    val b = sig.select(col("doc_id").as("b_id"), col("simhash").as("b_sig"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("hamming", bit_count(col("a_sig").bitwiseXOR(col("b_sig"))))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
      .orderBy("a_id", "b_id")
  }

  /** Character n-gram sets per document (distinct), for Jaccard dedup. */
  def charNgrams(docs: DataFrame, n: Int): DataFrame =
    docs.filter(length(col("text")) >= n)
      .select(col("doc_id"), col("lang"), explode(expr(
        s"transform(sequence(1, length(text) - ${n - 1}), i -> substring(text, i, $n))"))
        .as("gram"))
      .distinct()

  /** N-gram Jaccard similarity for same-language doc pairs (pairs with at
    * least one shared gram; gram join is the only wide shuffle). */
  def ngramJaccard(docs: DataFrame, n: Int): DataFrame = {
    val grams = charNgrams(docs, n)
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val a = grams.select(col("doc_id").as("a_id"), col("lang"), col("gram"))
    val b = grams.select(col("doc_id").as("b_id"), col("lang").as("lang_b"), col("gram").as("gram_b"))
    val inter = a.join(b,
        col("gram") === col("gram_b") && col("lang") === col("lang_b") &&
          col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("a_id"), col("n_grams").as("na")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n_grams").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"),
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 6)
          .as("jaccard"))
      .orderBy("a_id", "b_id")
  }
}
