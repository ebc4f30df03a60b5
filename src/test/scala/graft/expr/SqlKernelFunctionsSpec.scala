package graft.expr

import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The SQL registration surface: every text kernel callable from
  * `spark.sql(...)` must produce byte-identical results to its
  * Column-API constructor (they build the SAME expression through
  * [[GraftFunctions.all]]), and literal int parameters must fold. */
class SqlKernelFunctionsSpec extends SparkSpec {

  private val text =
    "the quick brown fox jumps over the lazy dog the quick brown fox again"

  private def viaSql(expr: String): Seq[Any] = {
    GraftFunctions.register(spark)
    spark.sql(s"SELECT $expr AS v FROM VALUES ('$text') AS t(txt)")
      .collect().toSeq.map(_.get(0))
  }

  private def viaColumn(e: org.apache.spark.sql.catalyst.expressions.Expression): Seq[Any] = {
    val s2 = spark
    import s2.implicits._
    Seq(text).toDF("txt")
      .select(GraftColumnBridge.column(e).as("v"))
      .collect().toSeq.map(_.get(0))
  }

  private def txtExpr = {
    val s2 = spark
    import s2.implicits._
    GraftColumnBridge.expression(col("txt"))
  }

  test("simhash60 and char_entropy_micro: SQL equals Column API") {
    assert(viaSql("simhash60(txt)") == viaColumn(Simhash60(txtExpr)))
    assert(viaSql("char_entropy_micro(txt)") == viaColumn(CharEntropyMicro(txtExpr)))
  }

  test("parameterized kernels: SQL int literals fold into the constructors") {
    assert(viaSql("minhash_bands(txt, 16, 4)") ==
      viaColumn(MinhashBands(txtExpr, 16, 4)))
    assert(viaSql("winnow_fps(txt, 5, 4)") ==
      viaColumn(WinnowFps(txtExpr, 5, 4)))
    assert(viaSql("dup_ngram_stats(txt, 3)") ==
      viaColumn(DupNgramStats(txtExpr, 3)))
    assert(viaSql("md5_prefix(txt, 8)") ==
      viaColumn(Md5Prefix(txtExpr, 8)))
    assert(viaSql("hashed_bigram_buckets(txt, 64)") ==
      viaColumn(HashedBigramBuckets(txtExpr, 64)))
  }

  test("set and count kernels: SQL equals Column API") {
    assert(viaSql("char_ngrams(txt, 5)") == viaColumn(CharNgramSet(txtExpr, 5)))
    assert(viaSql("word_ngrams(txt, 3)") == viaColumn(WordNgramSet(txtExpr, 3)))
    assert(viaSql("bigram_counts(txt)") == viaColumn(BigramCounts(txtExpr)))
    assert(viaSql("alnum_token_counts(txt)") == viaColumn(AlnumTokenCounts(txtExpr)))
  }

  test("invalid kernel parameters surface as analysis errors, not task failures") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_bands('x', 7, 4)").collect()
    }
    assert(e.getMessage.contains("multiple") || e.getMessage.contains("minhash"),
      e.getMessage)
  }
}
