package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-surface registration of graft's native expressions, so the engine's
  * custom functions are usable from `spark.sql(...)` alongside the Column
  * API (SURVEY §2.9).
  *
  * ONE table of builders feeds both registration paths —
  * [[register]] (an already-built session) and
  * [[GraftSparkExtensions]] (the `spark.sql.extensions` injection point) —
  * so the two surfaces cannot drift apart.
  */
object GraftFunctions {

  /** A SQL-registrable native function: name, defining class (for
    * `DESCRIBE FUNCTION`), and the expression builder. Integer
    * parameters are FOLDED AT RESOLUTION (the kernels take literal
    * ints, mirroring their Column-API constructors). */
  final case class FnSpec(
      name: String,
      clazz: Class[_],
      build: Seq[Expression] => Expression)

  private def intArg(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()

  /** Every SQL-callable native function: the decode/vector/transform
    * expressions plus the full text-kernel family, under the same names
    * as their `prettyName`s (what plan audits and EXPLAIN show). */
  val all: Seq[FnSpec] = Seq(
    FnSpec("iceberg_decode_numeric", classOf[DecodeNumericExpr],
      es => DecodeNumericExpr(es.head, es(1))),
    FnSpec("vec_dot", classOf[VecDot],
      es => VecDot(es.head, es(1))),
    FnSpec("hash_plane_dot", classOf[HashPlaneDot],
      es => HashPlaneDot(es.head, es(1))),
    // iceberg_bucket(col, N): the spec-murmur3 partition transform as a
    // SQL function — lets users pre-compute/debug bucket assignments
    // (`WHERE iceberg_bucket(id, 16) = 3`) with the exact write-path
    // semantics (spec Appendix-B vectors pinned in TransformsSpec)
    FnSpec("iceberg_bucket", classOf[IcebergBucket],
      es => IcebergBucket(es.head, intArg(es(1)))),
    // the text-kernel family (SURVEY §2.9): per-document single-pass
    // codegen kernels, SQL-callable for ad-hoc corpus forensics with
    // byte-identical semantics to the operator pipelines
    FnSpec("minhash_bands", classOf[MinhashBands],
      es => MinhashBands(es.head, intArg(es(1)), intArg(es(2)))),
    FnSpec("simhash60", classOf[Simhash60],
      es => Simhash60(es.head)),
    FnSpec("winnow_fps", classOf[WinnowFps],
      es => WinnowFps(es.head, intArg(es(1)), intArg(es(2)))),
    FnSpec("dup_ngram_stats", classOf[DupNgramStats],
      es => DupNgramStats(es.head, intArg(es(1)))),
    FnSpec("char_ngrams", classOf[CharNgramSet],
      es => CharNgramSet(es.head, intArg(es(1)))),
    FnSpec("word_ngrams", classOf[WordNgramSet],
      es => WordNgramSet(es.head, intArg(es(1)))),
    FnSpec("char_entropy_micro", classOf[CharEntropyMicro],
      es => CharEntropyMicro(es.head)),
    FnSpec("bigram_counts", classOf[BigramCounts],
      es => BigramCounts(es.head)),
    FnSpec("alnum_token_counts", classOf[AlnumTokenCounts],
      es => AlnumTokenCounts(es.head)),
    FnSpec("hashed_bigram_buckets", classOf[HashedBigramBuckets],
      es => HashedBigramBuckets(es.head, intArg(es(1)))),
    FnSpec("md5_prefix", classOf[Md5Prefix],
      es => Md5Prefix(es.head, intArg(es(1)))))

  /** Register every native function on an already-built session. */
  def register(spark: SparkSession): Unit =
    all.foreach { fn =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        fn.name, fn.build, "built-in")
    }
}
