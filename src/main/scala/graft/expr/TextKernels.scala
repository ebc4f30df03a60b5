package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static text kernels behind custom codegen expressions — per-row loops
  * that a built-in-function formulation would have to express as an
  * explode (row blowup) or an O(n²) immutable-collection fold.
  *
  * Memory bound: each kernel's transient state is O(distinct grams of
  * ONE document) — the same per-document cardinality the legacy explode
  * plan held in its per-partition aggregation hash map, concentrated
  * into one row evaluation and released to the GC immediately. Executor
  * footprint is therefore tasks × largest-doc-distinct-grams, not
  * corpus-proportional; a pathological multi-GB single document would
  * pressure either formulation equally. */
object TextKernelOps {

  /** Character-bigram histogram of a string in ONE pass: the same
    * multiset as `transform(sequence(1, length(s) - 1), i ->
    * substring(s, i, 2))` (code-point pairing, like Spark `substring`
    * and DuckDB `substr`), but materialized as a count map instead of
    * one row per position — the explode fodder shrinks from `chars-1`
    * rows per document to its distinct-bigram count, and the per-bigram
    * UTF8String allocations happen only once per DISTINCT bigram. */
  def bigramCounts(s: UTF8String): MapData = {
    val str = s.toString
    val n = str.length
    val counts = new java.util.LinkedHashMap[String, java.lang.Long]()
    var i = 0
    while (i < n) {
      val next = i + Character.charCount(str.codePointAt(i))
      if (next < n) {
        val end = next + Character.charCount(str.codePointAt(next))
        val bg = str.substring(i, end)
        val prev = counts.get(bg)
        counts.put(bg, if (prev == null) 1L else prev.longValue() + 1L)
      }
      i = next
    }
    val keys = new Array[Any](counts.size)
    val vals = new Array[Any](counts.size)
    var k = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(k) = UTF8String.fromString(e.getKey)
      vals(k) = e.getValue.longValue()
      k += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}

object TokenizeKernel {
  /** Tokens exactly as `split(lower(trim(text)), "\\s+")` computes them:
    * UTF8String lowercase (locale-independent, = Spark `lower`),
    * space-only trim (Spark `trim` strips ' ' only, not \t/\n), Java
    * regex split with limit -1 (Spark `split` keeps trailing empties). */
  def sparkTokens(s: UTF8String): Array[String] = {
    val lowered = s.toLowerCase.toString
    var b = 0; var e = lowered.length
    while (b < e && lowered.charAt(b) == ' ') b += 1
    while (e > b && lowered.charAt(e - 1) == ' ') e -= 1
    if (e <= b) Array("") else lowered.substring(b, e).split("\\s+", -1)
  }
}

object WinnowKernel {
  private val Big = 1073741824L // 2^30 — the fp/gpos packing base

  /** Winnowed fingerprint selection for ONE document, single pass — the
    * kernel behind [[WinnowFps]]. Exactly the rows
    * `graft.ops.Dedup.winnowedFps` used to produce via posexplode +
    * doc-keyed window + distinct: tokens are `split(lower(trim(text)),
    * "\\s+")` (space-only trim and UTF8String lowercase, mirroring the
    * Spark functions), each k-token gram hashes with the same md5-prefix
    * kernel, the tie-break packing `hash * 2^30 + (2^30-1-pos)` makes one
    * integer min pick the rightmost minimal gram per window, and the
    * sliding window min runs as an O(n) monotonic deque instead of a
    * sort-based window operator. Emits DISTINCT (fp, gpos) structs. */
  def winnowFps(s: UTF8String, k: Int, window: Int): ArrayData = {
    val toks = TokenizeKernel.sparkTokens(s)
    val n = toks.length
    if (n < k + window - 1) return new GenericArrayData(Array.empty[Any])
    val nGrams = n - k + 1
    val vs = new Array[Long](nGrams)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
      val h = Md5Ops.md5Prefix(UTF8String.fromString(sb.toString), 8)
      vs(i) = h * Big + (Big - 1L - i)
      i += 1
    }
    // monotonic deque sliding min over the last `window` gram positions
    val seen = new java.util.LinkedHashSet[Long]()
    val dq = new Array[Int](nGrams); var head = 0; var tail = 0
    i = 0
    while (i < nGrams) {
      while (tail > head && vs(dq(tail - 1)) >= vs(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - window) head += 1
      if (i >= window - 1) { seen.add(vs(dq(head))); () }
      i += 1
    }
    val rows = new Array[Any](seen.size)
    var r = 0
    val it = seen.iterator()
    while (it.hasNext) {
      val m = it.next()
      rows(r) = org.apache.spark.sql.catalyst.InternalRow(
        m / Big, Big - 1L - (m % Big))
      r += 1
    }
    new GenericArrayData(rows)
  }
}

/** `winnow_fps(text, k, w) -> array<struct<fp, gpos>>`: per-document
  * winnowed fingerprint occurrences as ONE codegen pass (tokenize → gram
  * hash → deque sliding min → distinct), replacing the
  * posexplode + window + distinct pipeline — no per-token row blowup and
  * no sort, while producing byte-identical fingerprints (same md5-prefix
  * hash and packing, so the DuckDB oracle replay is unchanged). */
case class WinnowFps(child: Expression, k: Int, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("fp", LongType, nullable = false),
    StructField("gpos", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnow_fps"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1 || window < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k and window must be positive")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName input must be string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    WinnowKernel.winnowFps(input.asInstanceOf[UTF8String], k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.WinnowKernel.winnowFps($c, $k, $window)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object MinhashKernel {
  private val Mersenne = 2147483647L
  private val Mod = 1000000007L

  /** MinHash LSH band signatures for ONE document, single pass — the
    * kernel behind [[MinhashBands]], producing exactly the
    * `(band, band_sig)` values of `graft.ops.Dedup.bandSignatures`'s old
    * explode + groupBy formulation: word 3-shingles of the Spark-
    * tokenized text, the md5-prefix shingle hash, the fixed
    * `h*(2j+1) + (j*2654435761 + 104729) % 2^31-1` permutation family
    * folded to per-band signatures over the SORTED member minima with
    * the `(a*31 + x) % 1e9+7` polynomial. min() is duplicate-insensitive,
    * so no shingle distinct is needed; docs under 3 tokens emit no
    * bands (the old shingle filter). All arithmetic stays under 2^63. */
  def bandSignatures(s: UTF8String, numPerm: Int, rowsPerBand: Int): ArrayData = {
    val toks = TokenizeKernel.sparkTokens(s)
    val n = toks.length
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val mins = Array.fill(numPerm)(Long.MaxValue)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= n - 3) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ').append(toks(i + 2))
      val h = Md5Ops.md5Prefix(UTF8String.fromString(sb.toString), 8)
      var j = 0
      while (j < numPerm) {
        val v = h * (2L * j + 1L) + ((j * 2654435761L + 104729L) % Mersenne)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val nBands = numPerm / rowsPerBand
    val rows = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      val members = java.util.Arrays.copyOfRange(
        mins, b * rowsPerBand, (b + 1) * rowsPerBand)
      java.util.Arrays.sort(members)
      var acc = 0L
      var r = 0
      while (r < rowsPerBand) { acc = (acc * 31L + members(r)) % Mod; r += 1 }
      rows(b) = org.apache.spark.sql.catalyst.InternalRow(b, acc)
      b += 1
    }
    new GenericArrayData(rows)
  }
}

/** `minhash_bands(text, numPerm, rowsPerBand) -> array<struct<band,
  * band_sig>>`: per-document MinHash LSH band signatures as one codegen
  * pass — a pure projection (no shuffle, no aggregation state), so the
  * same expression serves batch signature builds, incremental gates, AND
  * streaming queries, and the corpus-wide groupBy that used to build
  * signatures disappears entirely. */
case class MinhashBands(child: Expression, numPerm: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("band_sig", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_bands"

  override def checkInputDataTypes(): TypeCheckResult =
    if (numPerm < 1 || rowsPerBand < 1 || numPerm % rowsPerBand != 0)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs numPerm a positive multiple of rowsPerBand")
    else if (numPerm > 32)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName permutation family is sized for numPerm <= 32")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName input must be string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    MinhashKernel.bandSignatures(input.asInstanceOf[UTF8String], numPerm, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.MinhashKernel.bandSignatures($c, $numPerm, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): MinhashBands =
    copy(child = newChild)
}

object SimhashKernel {
  private val Bits = 60

  /** 60-bit SimHash for ONE document, single pass — the kernel behind
    * [[Simhash60]], value-identical to the old explode + two-aggregate
    * pipeline: term frequency over the Spark-tokenized text (each
    * DISTINCT token hashes once with the md5-prefix 60-bit hash,
    * weighted by its count), per-bit set-weights S_i, and bit i set iff
    * 2·S_i > Σcnt (the classic ±1 majority in integer form). */
  def simhash60(s: UTF8String): Long = {
    val toks = TokenizeKernel.sparkTokens(s)
    val tf = new java.util.HashMap[String, Long]()
    var t = 0
    while (t < toks.length) {
      val prev = tf.get(toks(t))
      tf.put(toks(t), if (prev == null) 1L else prev + 1L)
      t += 1
    }
    var total = 0L
    val sums = new Array[Long](Bits)
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cnt = e.getValue.longValue()
      val h = Md5Ops.md5Prefix(UTF8String.fromString(e.getKey), 15)
      total += cnt
      var i = 0
      while (i < Bits) {
        if (((h >>> i) & 1L) == 1L) sums(i) += cnt
        i += 1
      }
    }
    var sig = 0L
    var i = 0
    while (i < Bits) {
      if (2L * sums(i) > total) sig |= 1L << i
      i += 1
    }
    sig
  }
}

/** `simhash60(text) -> long`: per-document 60-bit SimHash as one codegen
  * pass — a pure projection replacing the token explode + per-(doc,tok)
  * count + 60-bit-sum aggregate (two shuffles) with zero shuffles. */
case class Simhash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName input must be string, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SimhashKernel.simhash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SimhashKernel.simhash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Simhash60 =
    copy(child = newChild)
}

object NgramKernel {
  /** Word n-gram repetition census for ONE document, single pass — the
    * kernel behind [[DupNgramStats]]: gram histogram over the
    * Spark-tokenized text, then (n_grams, n_distinct, gram_chars,
    * dup_chars) where chars count CODE POINTS (= Spark `length`) and dup
    * weight is the full char mass of every gram occurring more than
    * once. Docs with fewer than n tokens return (0, 0, 0, 0) — they can
    * never carry dup mass, so downstream `dup_chars > 0` /
    * `n_grams > 0` filters drop them exactly like the old pre-explode
    * size filter did. */
  def dupNgramStats(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = TokenizeKernel.sparkTokens(s)
    if (toks.length < n)
      return org.apache.spark.sql.catalyst.InternalRow(0L, 0L, 0L, 0L)
    val counts = new java.util.HashMap[String, Long]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
      val g = sb.toString
      val prev = counts.get(g)
      counts.put(g, if (prev == null) 1L else prev + 1L)
      i += 1
    }
    var nGrams = 0L; var gramChars = 0L; var dupChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.longValue()
      val g = e.getKey
      val gc = g.codePointCount(0, g.length).toLong
      nGrams += c
      gramChars += c * gc
      if (c > 1L) dupChars += c * gc
    }
    org.apache.spark.sql.catalyst.InternalRow(
      nGrams, counts.size.toLong, gramChars, dupChars)
  }
}

/** `dup_ngram_stats(text, n) -> struct<n_grams, n_distinct, gram_chars,
  * dup_chars>`: per-document word-n-gram repetition census as one
  * codegen pass — a pure projection replacing the gram explode +
  * per-(doc, gram) count + per-doc re-aggregate (two shuffles) with
  * zero shuffles. Serves both the count-based repetition ratio
  * (n_grams/n_distinct) and the Gopher char-weighted fraction
  * (gram_chars/dup_chars). */
case class DupNgramStats(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("gram_chars", LongType, nullable = false),
    StructField("dup_chars", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "dup_ngram_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName n must be positive")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName input must be string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    NgramKernel.dupNgramStats(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.NgramKernel.dupNgramStats($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): DupNgramStats =
    copy(child = newChild)
}

object BucketBagKernel {
  /** Hashed word-bigram bucket histogram for ONE document — the kernel
    * behind [[HashedBigramBuckets]]: word bigrams of the Spark-tokenized
    * text, each hashed with the md5-prefix 32-bit hash mod `buckets`,
    * counted into (bucket, count) structs. The DSIR-style feature bag as
    * distinct-bucket rows instead of one exploded row per bigram
    * occurrence. Docs under 2 tokens emit no buckets (the old size
    * filter). */
  def bigramBuckets(s: UTF8String, buckets: Int): ArrayData = {
    val toks = TokenizeKernel.sparkTokens(s)
    if (toks.length < 2) return new GenericArrayData(Array.empty[Any])
    val counts = new java.util.LinkedHashMap[Long, Long]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < toks.length - 1) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1))
      val b = Md5Ops.md5Prefix(UTF8String.fromString(sb.toString), 8) % buckets
      val prev = counts.get(b)
      counts.put(b, if (prev == null) 1L else prev + 1L)
      i += 1
    }
    val rows = new Array[Any](counts.size)
    var r = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      rows(r) = org.apache.spark.sql.catalyst.InternalRow(
        e.getKey.longValue(), e.getValue.longValue())
      r += 1
    }
    new GenericArrayData(rows)
  }
}

/** `bigram_buckets(text, N) -> array<struct<b, c>>`: per-document hashed
  * word-bigram bucket histogram as one codegen pass — the explode fodder
  * for DSIR-style affinity scoring shrinks from one row per bigram
  * occurrence to the document's distinct-bucket count. */
case class HashedBigramBuckets(child: Expression, buckets: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("b", LongType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bigram_buckets"

  override def checkInputDataTypes(): TypeCheckResult =
    if (buckets < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName buckets must be positive")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName input must be string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    BucketBagKernel.bigramBuckets(input.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.BucketBagKernel.bigramBuckets($c, $buckets)")

  override protected def withNewChildInternal(newChild: Expression): HashedBigramBuckets =
    copy(child = newChild)
}

object AlnumTokenKernel {
  /** Lowercased alphanumeric token histogram for ONE document — the
    * kernel behind [[AlnumTokenCounts]]: `split(lower(text),
    * "[^a-z0-9]+")` tokens (empties dropped, exactly the retrieval
    * tokenizer) counted into (tok, c) structs — one row per DISTINCT
    * (doc, token) downstream instead of one per occurrence, which turns
    * df censuses into plain counts and tf extraction into a projection. */
  def tokenCounts(s: UTF8String): ArrayData = {
    val parts = s.toLowerCase.toString.split("[^a-z0-9]+", -1)
    val counts = new java.util.LinkedHashMap[String, Long]()
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p.nonEmpty) {
        val prev = counts.get(p)
        counts.put(p, if (prev == null) 1L else prev + 1L)
      }
      i += 1
    }
    val rows = new Array[Any](counts.size)
    var r = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      rows(r) = org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(e.getKey), e.getValue.longValue())
      r += 1
    }
    new GenericArrayData(rows)
  }
}

/** `alnum_token_counts(text) -> array<struct<tok, c>>`: per-document
  * lowercased-alphanumeric token histogram as one codegen pass — the
  * shared tokenizer of the BM25 / TF-IDF retrieval surface with the
  * per-(doc, token) aggregation already folded in. */
case class AlnumTokenCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tok", StringType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "alnum_token_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName input must be string, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    AlnumTokenKernel.tokenCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.AlnumTokenKernel.tokenCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): AlnumTokenCounts =
    copy(child = newChild)
}

object CharNgramKernel {
  /** DISTINCT character n-grams of ONE document, single pass — the
    * kernel behind [[CharNgramSet]]: code-point sliding window of width
    * n over the RAW text (same as `substring(text, i, n)` over
    * `sequence(1, length(text)-n+1)`), deduplicated in-kernel — the
    * per-doc distinct that used to be a corpus-wide (doc, gram) string
    * shuffle. Docs under n code points return an empty array. */
  def charNgramSet(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val len = str.length
    // code-point start offsets (cp count + 1 entries, last = len)
    var cp = 0
    var i = 0
    while (i < len) { i = str.offsetByCodePoints(i, 1); cp += 1 }
    if (cp < n) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](cp + 1)
    i = 0; var c = 0
    while (c < cp) { offs(c) = i; i = str.offsetByCodePoints(i, 1); c += 1 }
    offs(cp) = len
    val seen = new java.util.LinkedHashSet[String]()
    var g = 0
    while (g + n <= cp) {
      seen.add(str.substring(offs(g), offs(g + n)))
      g += 1
    }
    val rows = new Array[Any](seen.size)
    var r = 0
    val it = seen.iterator()
    while (it.hasNext) { rows(r) = UTF8String.fromString(it.next()); r += 1 }
    new GenericArrayData(rows)
  }
}

/** `char_ngram_set(text, n) -> array<string>`: per-document DISTINCT
  * character n-grams as one codegen pass — the Jaccard gram sets without
  * the corpus-wide distinct shuffle (dedup happens inside each row). */
case class CharNgramSet(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "char_ngram_set"

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName n must be positive")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName input must be string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    CharNgramKernel.charNgramSet(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.CharNgramKernel.charNgramSet($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharNgramSet =
    copy(child = newChild)
}

object WordNgramKernel {
  /** DISTINCT word n-grams of ONE document, single pass — the kernel
    * behind [[WordNgramSet]]: Spark-tokenized text, n-token grams joined
    * with ' ' (same as `concat_ws(' ', slice(toks, i, n))`),
    * deduplicated in-kernel. Docs under n tokens return an empty
    * array. */
  def wordNgramSet(s: UTF8String, n: Int): ArrayData = {
    val toks = TokenizeKernel.sparkTokens(s)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val rows = new Array[Any](seen.size)
    var r = 0
    val it = seen.iterator()
    while (it.hasNext) { rows(r) = UTF8String.fromString(it.next()); r += 1 }
    new GenericArrayData(rows)
  }
}

/** `word_ngram_set(text, n) -> array<string>`: per-document DISTINCT
  * word n-grams as one codegen pass — decontamination's gram sets
  * without the corpus-wide distinct shuffle. */
case class WordNgramSet(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "word_ngram_set"

  override def checkInputDataTypes(): TypeCheckResult =
    if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName n must be positive")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName input must be string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    WordNgramKernel.wordNgramSet(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.WordNgramKernel.wordNgramSet($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgramSet =
    copy(child = newChild)
}

object EntropyKernel {
  /** Shannon character entropy of ONE document in micro-nats, single
    * pass — the kernel behind [[CharEntropyMicro]], value-identical to
    * the old explode + (doc, char) count + join + sum pipeline: counts
    * per code point, per-class term `floor(p·ln(p)·1e6)` as a long
    * (p = count/total over code points, ln = java.lang.Math.log — the
    * same libm call Spark's `log` makes), entropy = −Σ terms. Long
    * summation is order-independent, so the result is engine-exact.
    * Caller must exclude empty strings (the old length > 0 filter). */
  def charEntropyMicro(s: UTF8String): Long = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1L else prev + 1L)
      i += Character.charCount(cp)
      n += 1
    }
    var sum = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().longValue()
      val p = c.toDouble / n.toDouble
      sum += math.floor(p * math.log(p) * 1e6).toLong
    }
    -sum
  }
}

/** `char_entropy_micro(text) -> long`: per-document character entropy in
  * micro-nats as one codegen pass — a pure projection replacing the
  * char explode + per-(doc, char) count + length join + per-doc sum
  * (two shuffles and a join) with zero shuffles. */
case class CharEntropyMicro(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "char_entropy_micro"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName input must be string, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    EntropyKernel.charEntropyMicro(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.EntropyKernel.charEntropyMicro($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyMicro =
    copy(child = newChild)
}

/** `bigram_counts(string) -> map<string, long>`: per-row character-bigram
  * histogram as a native codegen expression — the no-row-blowup half of
  * [[graft.ops.TextStats.bigramFamiliarity]]'s census (the corpus count
  * table then aggregates map ENTRIES, bounded by distinct bigrams per
  * document, instead of one exploded row per character position). */
case class BigramCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bigram_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName input must be string, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernelOps.bigramCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextKernelOps.bigramCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): BigramCounts =
    copy(child = newChild)
}

object BpeEncodeKernel {
  /** Per-document BPE segmentation counts under a learned merge list —
    * the kernel behind [[BpeEncodeCounts]]. Byte-identical to the old
    * nested `transform`/`aggregate` array-rewrite projection it
    * replaces (same tokenization, same per-merge greedy left fold over
    * the word's code-point symbols), but a bounded imperative loop
    * instead of an O(merges)-deep lambda tree whose generated code
    * defeated the janino cache (fresh LambdaVariable ids → full
    * recompile on every fresh plan). */
  def encodeCounts(s: UTF8String, ls: Array[String], rs: Array[String])
      : org.apache.spark.sql.catalyst.InternalRow = {
    val toks = TokenizeKernel.sparkTokens(s)
    var nw = 0; var nt = 0
    var ti = 0
    while (ti < toks.length) {
      val w = toks(ti)
      if (w.nonEmpty) {
        nw += 1
        // symbols start as single code points (Spark substring semantics)
        var syms = new java.util.ArrayList[String](w.length)
        var ci = 0
        while (ci < w.length) {
          val cp = w.codePointAt(ci)
          val n = Character.charCount(cp)
          syms.add(w.substring(ci, ci + n))
          ci += n
        }
        var mi = 0
        while (mi < ls.length) {
          val l = ls(mi); val r = rs(mi)
          val next = new java.util.ArrayList[String](syms.size)
          var si = 0
          while (si < syms.size) {
            val sym = syms.get(si)
            if (si > 0 && !next.isEmpty && next.get(next.size - 1) == l
                && sym == r)
              next.set(next.size - 1, l + r)
            else next.add(sym)
            si += 1
          }
          syms = next
          mi += 1
        }
        nt += syms.size
      }
      ti += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nw, nt))
  }
}

/** `bpe_encode_counts(text) -> struct<n_words:int, n_tokens:int>`: apply
  * a learned BPE merge list to every word of a document in one kernel
  * pass, emitting word/token counts — the corpus-scale tokenizer-apply
  * step as a pure projection ([[graft.ops.Bpe.encodeStats]]). */
case class BpeEncodeCounts(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_encode_counts"

  private lazy val ls: Array[String] = merges.map(_._1).toArray
  private lazy val rs: Array[String] = merges.map(_._2).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName input must be string, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    BpeEncodeKernel.encodeCounts(input.asInstanceOf[UTF8String], ls, rs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lsRef = ctx.addReferenceObj("bpeLs", ls, "java.lang.String[]")
    val rsRef = ctx.addReferenceObj("bpeRs", rs, "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.BpeEncodeKernel.encodeCounts($c, $lsRef, $rsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeCounts =
    copy(child = newChild)
}
