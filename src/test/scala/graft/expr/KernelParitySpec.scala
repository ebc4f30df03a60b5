package graft.expr

import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Adversarial parity pins for the per-document text kernels: each
  * kernel must equal the LEGACY explode/aggregate formulation it
  * replaced (re-built here verbatim as an in-spec oracle) on strings
  * chosen to stress the tokenization contract — tabs and newlines
  * (Spark `trim` strips spaces ONLY), repeated separators, leading/
  * trailing whitespace, unicode with multi-byte code points, surrogate
  * pairs (UTF-16 vs code-point counting), and degenerate empties. The
  * corpus-scale guard is the DuckDB oracle; this pins the corners no
  * real corpus reliably covers.
  *
  * Every check runs TWICE: once over the hand-picked corpus above, and
  * once over a seeded ScalaCheck corpus (fixed `Seed` → deterministic,
  * replayable) drawing from a token alphabet biased toward the same
  * hazards — so the pins also sweep combinations nobody thought to
  * hand-write. */
class KernelParitySpec extends SparkSpec {

  private def trickyDocs: DataFrame = {
    val s2 = spark
    import s2.implicits._
    Seq(
      (1L, ""),
      (2L, "   "),
      (3L, "one"),
      (4L, "tab\tseparated words tab\tseparated words tab\tseparated"),
      (5L, "new\nline broken text new\nline broken text new\nline"),
      (6L, "multi   space   gaps multi   space   gaps multi   space"),
      (7L, "  leading and trailing spaces in this doc here  "),
      (8L, "héllo wörld née naïve héllo wörld née naïve héllo wörld"),
      (9L, "你好 世界 你好 世界 你好 世界 你好 世界"),
      (10L, "𝕊𝕡𝕒𝕣𝕜 runs 𝕊𝕡𝕒𝕣𝕜 fast 𝕊𝕡𝕒𝕣𝕜 runs 𝕊𝕡𝕒𝕣𝕜 fast 𝕊𝕡𝕒𝕣𝕜"),
      (11L, "MIXED Case TOKENS mixed case tokens MiXeD cAsE tOkEnS"),
      (12L, "a a a a a a a a a a"),
      (13L, "punct.mid,token!kept? punct.mid,token!kept? punct.mid"),
      (14L, "\tstarts with tab and ends with newline\n"))
      .toDF("doc_id", "text")
  }

  /** 60 ScalaCheck-generated docs from a FIXED seed: random mixes of
    * hazard tokens (multi-byte, surrogate-pair, punctuated, digit,
    * single-char) joined by random separator runs (space, tab, newline,
    * multi-space), plus whitespace-only and empty edge draws. */
  private def randomDocs: DataFrame = {
    val s2 = spark
    import s2.implicits._
    val token = Gen.oneOf(
      "a", "ab", "héllo", "née", "你好", "𝕊𝕡𝕒𝕣𝕜", "x1", "punct.mid,tok!",
      "UPPER", "MiXeD", "0042", "naïve", "€uro", "éclair", "ß")
    val sep = Gen.oneOf(" ", "  ", "   ", "\t", "\n", " \t ")
    val doc = for {
      n <- Gen.choose(0, 24)
      toks <- Gen.listOfN(n, token)
      seps <- Gen.listOfN(math.max(n - 1, 0), sep)
      lead <- Gen.oneOf("", " ", "\t")
      trail <- Gen.oneOf("", " ", "\n")
    } yield lead + toks.lazyZip(seps :+ "").map(_ + _).mkString + trail
    val docs = (0 until 60).map { i =>
      // one deterministic draw per index — reseeding per doc keeps the
      // corpus stable under ScalaCheck's internal iteration-order changes
      val text = doc(Gen.Parameters.default, Seed(0xCAFE + i.toLong))
        .getOrElse("fallback doc text")
      (i + 100L, text)
    }
    docs.toDF("doc_id", "text")
  }

  // row MULTISET, not set: a kernel that regressed to emit a duplicate
  // row of a correct value (e.g. a gram twice for one doc from the
  // in-kernel dedup paths) must fail parity, not have toSet mask it
  private def rows(df: DataFrame): Map[Seq[Any], Int] =
    df.collect().map(_.toSeq).groupBy(identity).map { case (r, g) => r -> g.length }

  private def checkMinhash(docs: DataFrame): Unit = {
    val numPerm = 16; val rowsPerBand = 4
    // legacy: shingle explode -> portable hash -> groupBy(doc) mins ->
    // sorted-member polynomial band fold (the pre-round-9 pipeline)
    val mersenne = 2147483647L
    val minCols = (0 until numPerm).map { j =>
      val pa = 2L * j + 1L
      val pb = (j * 2654435761L + 104729L) % mersenne
      min(col("h") * lit(pa) + lit(pb)).as(s"mh$j")
    }
    val shingled = docs.select(col("doc_id"),
        split(lower(trim(col("text"))), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 3), " +
          "i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))")).as("shingle"))
      .select(col("doc_id"), PortableHash.md5Hash32(col("shingle")).as("h"))
      .groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    val nBands = numPerm / rowsPerBand
    val bandStructs = (0 until nBands).map { b =>
      val members = (0 until rowsPerBand)
        .map(r => s"mh${b * rowsPerBand + r}").mkString(", ")
      struct(lit(b).as("band"), expr(
        s"aggregate(sort_array(array($members)), CAST(0 AS BIGINT), " +
          "(a, x) -> (a * 31 + x) % 1000000007)").as("band_sig"))
    }
    val legacy = shingled
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band"), col("bs.band_sig"))
    assert(rows(graft.ops.Dedup.bandSignatures(docs, numPerm, rowsPerBand)) ==
      rows(legacy))
  }

  private def checkSimhash(docs: DataFrame): Unit = {
    val bits = graft.ops.Dedup.SimhashBits
    val toks = docs.select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), PortableHash.md5Hash60(col("tok")).as("h"), col("cnt"))
    val bitSums = (0 until bits).map(i =>
      sum(expr(s"cnt * (shiftright(h, $i) & 1)")).as(s"s$i"))
    val sigExpr = (0 until bits).map(i =>
      s"CASE WHEN 2 * s$i > t THEN shiftleft(CAST(1 AS BIGINT), $i) " +
        "ELSE CAST(0 AS BIGINT) END").mkString(" + ")
    val legacy = toks.groupBy("doc_id")
      .agg(sum(col("cnt")).as("t"), bitSums: _*)
      .select(col("doc_id"), expr(sigExpr).as("simhash"))
    assert(rows(graft.ops.Dedup.simhash(docs)) == rows(legacy))
  }

  private def checkWinnow(docs: DataFrame): Unit = {
    val k = 5; val window = 4
    val big = 1073741824L
    val grams = docs.select(col("doc_id"),
        split(lower(trim(col("text"))), "\\s+").as("toks"))
      .filter(size(col("toks")) >= k + window - 1)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(toks) - $k), " +
          s"i -> concat_ws(' ', slice(toks, i + 1, $k)))")).as(Seq("pos", "gram")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos").rowsBetween(-(window - 1), 0)
    val legacy = grams
      .select(col("doc_id"), col("pos"),
        (PortableHash.md5Hash32(col("gram")) * lit(big) +
          (lit(big - 1) - col("pos"))).as("v"))
      .withColumn("minv", min(col("v")).over(w))
      .filter(col("pos") >= window - 1)
      .select(col("doc_id"),
        expr(s"minv div ${big}L").as("fp"),
        (lit(big - 1) - pmod(col("minv"), lit(big))).as("gpos"))
      .distinct()
    assert(rows(graft.ops.Dedup.winnowedFps(docs, k, window)) == rows(legacy))
  }

  private def checkDupNgrams(docs: DataFrame): Unit = {
    val n = 3
    val legacy = docs.select(col("doc_id"),
        split(lower(trim(col("text"))), "\\s+").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(toks) - ${n - 1}), " +
          s"i -> concat_ws(' ', slice(toks, i, $n)))")).as("gram"))
      .groupBy("doc_id", "gram")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("gc", length(col("gram")).cast("long"))
      .groupBy("doc_id")
      .agg(
        sum(col("cnt")).as("n_grams"),
        countDistinct(col("gram")).as("n_distinct"),
        sum(col("cnt") * col("gc")).as("gram_chars"),
        sum(when(col("cnt") > 1, col("cnt") * col("gc"))
          .otherwise(lit(0L))).as("dup_chars"))
    val kernel = docs
      .select(col("doc_id"), GraftColumnBridge.column(
        DupNgramStats(GraftColumnBridge.expression(col("text")), n)).as("s"))
      .filter(col("s.n_grams") > 0) // legacy frame excludes short docs
      .select(col("doc_id"), col("s.n_grams"), col("s.n_distinct"),
        col("s.gram_chars"), col("s.dup_chars"))
    assert(rows(kernel) == rows(legacy))
  }

  private def checkAlnumTokens(docs: DataFrame): Unit = {
    val legacy = docs.select(col("doc_id"),
        explode(split(lower(col("text")), "[^a-z0-9]+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val kernel = docs.select(col("doc_id"),
        explode(GraftColumnBridge.column(AlnumTokenCounts(
          GraftColumnBridge.expression(col("text"))))).as("t"))
      .select(col("doc_id"), col("t.tok").as("tok"), col("t.c").as("c"))
    assert(rows(kernel) == rows(legacy))
  }

  private def checkHashedBigrams(docs: DataFrame): Unit = {
    val buckets = 64 // small modulus to force collisions
    val legacy = docs.select(col("doc_id"),
        split(lower(trim(col("text"))), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> concat(toks[i], ' ', toks[i+1]))")).as("bg"))
      .select(col("doc_id"),
        pmod(PortableHash.md5Hash32(col("bg")), lit(buckets.toLong)).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
    val kernel = docs.select(col("doc_id"),
        explode(GraftColumnBridge.column(HashedBigramBuckets(
          GraftColumnBridge.expression(col("text")), buckets))).as("f"))
      .select(col("doc_id"), col("f.b").as("b"), col("f.c").as("c"))
    assert(rows(kernel) == rows(legacy))
  }

  private def checkCharNgrams(docs0: DataFrame): Unit = {
    val docs = docs0.withColumn("lang", lit("xx"))
    val n = 4
    val legacy = docs.filter(length(col("text")) >= n)
      .select(col("doc_id"), col("lang"), explode(expr(
        s"transform(sequence(1, length(text) - ${n - 1}), i -> substring(text, i, $n))"))
        .as("gram"))
      .distinct()
    assert(rows(graft.ops.Dedup.charNgrams(docs, n)) == rows(legacy))
  }

  private def checkWordNgrams(docs: DataFrame): Unit = {
    val n = 3
    val legacy = docs.select(col("doc_id"), lit("train").as("split"),
        split(lower(trim(col("text"))), "\\s+").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), col("split"), explode(expr(
        s"transform(sequence(1, size(toks) - ${n - 1}), " +
          s"i -> concat_ws(' ', slice(toks, i, $n)))")).as("gram"))
      .distinct()
    assert(rows(graft.ops.Decontam.wordNgrams(docs, lit("train"), n)) ==
      rows(legacy))
  }

  private def checkCharEntropy(docs: DataFrame): Unit = {
    val chars = docs.filter(length(col("text")) > 0)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(text)), i -> substring(text, i, 1))")).as("ch"))
    val counts = chars.groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
    val lens = docs.select(col("doc_id"), length(col("text")).cast("double").as("n"))
    val legacy = counts.join(lens, "doc_id")
      .withColumn("p", col("c").cast("double") / col("n"))
      .withColumn("tm", floor(col("p") * log(col("p")) * lit(1e6)).cast("long"))
      .groupBy("doc_id")
      .agg((-sum(col("tm"))).as("entropy_micro"))
    assert(rows(graft.ops.TextStats.charEntropy(docs)) == rows(legacy))
  }

  private def checkBigramCounts(docs: DataFrame): Unit = {
    val legacy = docs
      .filter(length(col("text")) >= 2)
      .withColumn("__t", lower(col("text")))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(__t) - 1), i -> substring(__t, i, 2))")).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("n"))
    val kernel = docs
      .filter(length(col("text")) >= 2)
      .select(col("doc_id"),
        explode(GraftColumnBridge.column(BigramCounts(
          GraftColumnBridge.expression(lower(col("text")))))).as(Seq("bg", "n")))
    assert(rows(kernel) == rows(legacy))
  }

  private val checks: Seq[(String, DataFrame => Unit)] = Seq(
    "MinhashBands == legacy explode + min-aggregate formulation" -> checkMinhash _,
    "Simhash60 == legacy term-frequency + bit-majority formulation" -> checkSimhash _,
    "WinnowFps == legacy posexplode + window-min formulation" -> checkWinnow _,
    "DupNgramStats == legacy gram explode + two-aggregate formulation" -> checkDupNgrams _,
    "AlnumTokenCounts == legacy tokenize + (doc, tok) count formulation" -> checkAlnumTokens _,
    "HashedBigramBuckets == legacy bigram explode + pmod formulation" -> checkHashedBigrams _,
    "CharNgramSet == legacy char-ngram explode + distinct formulation" -> checkCharNgrams _,
    "WordNgramSet == legacy word-ngram explode + distinct formulation" -> checkWordNgrams _,
    "CharEntropyMicro == legacy char explode + float-term formulation" -> checkCharEntropy _,
    "BigramCounts == legacy char-bigram explode formulation" -> checkBigramCounts _)

  checks.foreach { case (name, check) =>
    test(name)(check(trickyDocs))
    test(s"[scalacheck corpus] $name")(check(randomDocs))
  }
}
