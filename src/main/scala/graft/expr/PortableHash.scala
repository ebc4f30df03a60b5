package graft.expr

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.functions._

/** Engine-portable deterministic string hashes.
  *
  * The dedup / LSH operators need a hash any ANSI-ish SQL engine can
  * reproduce bit-for-bit, so the driver's DuckDB oracle can verify the
  * candidate-pair output exactly (xxhash64/murmur3 have no DuckDB twin).
  * Both engines agree on `md5(string)`: it hashes the UTF-8 bytes and
  * renders lowercase hex, which also makes it safe for multi-byte text.
  * A hex prefix of the digest is then folded to an integer — Spark uses
  * `conv(hex, 16, 10)`, DuckDB (no `conv`) uses the unrolled
  * digit-position sum emitted by [[duckDbMd5Number]] — and the two
  * formulations are the same polynomial, so the values match.
  *
  * Scale note: md5-per-token is heavier than xxhash64 but stays inside
  * whole-stage codegen (built-in expression), and the hash cost is linear
  * in input bytes — the shuffle profile of the operators is unchanged.
  */
object PortableHash {

  /** First `nHex` md5 hex digits as a long, via the native codegen kernel
    * [[Md5Prefix]] (no hex-string round trip in the hot path). */
  private def md5Hash(c: Column, nHex: Int): Column =
    GraftColumnBridge.column(Md5Prefix(GraftColumnBridge.expression(c), nHex))

  /** First 8 md5 hex digits as a long in [0, 2^32). */
  def md5Hash32(c: Column): Column = md5Hash(c, 8)

  /** First 15 md5 hex digits as a long in [0, 2^60) — a 60-bit hash that
    * still fits signed-64 arithmetic under ANSI mode. */
  def md5Hash60(c: Column): Column = md5Hash(c, 15)

  /** The composed built-in formulation — the documented Spark-SQL twin of
    * [[md5Hash32]]/[[md5Hash60]]; kept for cross-checking the native
    * kernel in specs. */
  def md5HashSql(c: Column, nHex: Int): Column =
    conv(substring(md5(c), 1, nHex), 16, 10).cast("long")

  /** DuckDB SQL computing the same integer as [[md5Hash32]]/[[md5Hash60]]:
    * positional hex-digit fold over the first `nHex` md5 digits of
    * `sqlExpr`. Powers of 16 up to 16^14 are exact powers of two, so the
    * emitted literals are exact. */
  def duckDbMd5Number(sqlExpr: String, nHex: Int): String = {
    require(nHex >= 1 && nHex <= 15, "nHex must be in [1, 15] to fit a signed long")
    (1 to nHex).map { k =>
      val weight = math.pow(16, nHex - k).toLong
      s"(strpos('0123456789abcdef', substr(md5($sqlExpr), $k, 1)) - 1) * $weight"
    }.mkString("(", " + ", ")")
  }
}
