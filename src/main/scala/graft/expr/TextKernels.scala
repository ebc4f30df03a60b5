package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static text kernels behind custom codegen expressions — per-row loops
  * that a built-in-function formulation would have to express as an
  * explode (row blowup) or an O(n²) immutable-collection fold. */
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
