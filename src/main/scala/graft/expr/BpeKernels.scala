package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word-level BPE training kernels — the per-round operations of
  * [[graft.ops.Bpe.trainMerges]]'s distributed loop as static codegen
  * calls.
  *
  * Why kernels and not `transform`/`aggregate`/`exists` folds: the loop
  * builds a FRESH plan every merge round, and higher-order-function
  * lambdas embed fresh `LambdaVariable` ids in their generated code, so
  * every round paid a full janino recompile of every per-word
  * expression (~0.2 s/round — dominating the actual sub-0.1 s Spark
  * jobs). A static kernel call's generated text is identical across
  * rounds (merge literals ride the references array), so the codegen
  * cache hits and round cost collapses to the job itself. Semantics are
  * pinned to the previous fold formulation: greedy left-to-right
  * non-overlapping rewrite, overlapping adjacent pairs all counted. */
object BpeWordOps {

  // null-element-safe: the type check admits array<string> with nullable
  // elements (Spark array builders default to containsNull = true), so a
  // null element must read back as null — not as whatever an unchecked
  // getUTF8String returns for an unset slot — and every symbol compare
  // below null-guards its receiver (a null symbol matches nothing)
  private def toArr(a: ArrayData): Array[UTF8String] = {
    val n = a.numElements()
    val out = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      out(i) = if (a.isNullAt(i)) null else a.getUTF8String(i)
      i += 1
    }
    out
  }

  /** One greedy left-to-right non-overlapping pass of (l, r) → m. */
  private def greedy(
      syms: Array[UTF8String], l: UTF8String, r: UTF8String,
      m: UTF8String): Array[UTF8String] = {
    val n = syms.length
    val out = new Array[UTF8String](n)
    var o = 0
    var i = 0
    while (i < n) {
      if (i + 1 < n && syms(i) != null && syms(i).equals(l) &&
          syms(i + 1) != null && syms(i + 1).equals(r)) {
        out(o) = m; o += 1; i += 2
      } else { out(o) = syms(i); o += 1; i += 1 }
    }
    if (o == n) out else java.util.Arrays.copyOf(out, o)
  }

  private def applyAll(
      syms: Array[UTF8String], lhs: Array[UTF8String],
      rhs: Array[UTF8String], merged: Array[UTF8String]): Array[UTF8String] = {
    var cur = syms
    var j = 0
    while (j < lhs.length) { cur = greedy(cur, lhs(j), rhs(j), merged(j)); j += 1 }
    cur
  }

  /** The accepted merges applied in rank order (greedy per pass). */
  def batchMerge(arr: ArrayData, lhs: Array[UTF8String],
      rhs: Array[UTF8String], merged: Array[UTF8String]): ArrayData =
    new GenericArrayData(
      applyAll(toArr(arr), lhs, rhs, merged).asInstanceOf[Array[Any]])

  /** Does the word contain ANY (lhs_j, rhs_j) adjacency? — the
    * affected-words filter. */
  def adjacentAny(arr: ArrayData, lhs: Array[UTF8String],
      rhs: Array[UTF8String]): Boolean = {
    val syms = toArr(arr)
    var i = 0
    while (i < syms.length - 1) {
      var j = 0
      while (j < lhs.length) {
        if (syms(i) != null && syms(i).equals(lhs(j)) &&
            syms(i + 1) != null && syms(i + 1).equals(rhs(j))) return true
        j += 1
      }
      i += 1
    }
    false
  }

  /** Census patch fodder for one word: the rewritten word's adjacent
    * pairs with sign +1 and the original's with sign -1, in one call —
    * replaces greedyMerge + two signed-pair transforms + concat. */
  def pairDeltas(arr: ArrayData, lhs: Array[UTF8String],
      rhs: Array[UTF8String], merged: Array[UTF8String]): ArrayData = {
    val before = toArr(arr)
    val after = applyAll(before, lhs, rhs, merged)
    val nb = math.max(before.length - 1, 0)
    val na = math.max(after.length - 1, 0)
    val rows = new Array[Any](na + nb)
    var k = 0
    var i = 0
    while (i < na) { rows(k) = InternalRow(after(i), after(i + 1), 1); k += 1; i += 1 }
    i = 0
    while (i < nb) { rows(k) = InternalRow(before(i), before(i + 1), -1); k += 1; i += 1 }
    new GenericArrayData(rows)
  }

  /** All adjacent pairs of a word (overlaps counted) — the initial
    * census fodder. */
  def pairStructs(arr: ArrayData): ArrayData = {
    val syms = toArr(arr)
    val n = math.max(syms.length - 1, 0)
    val rows = new Array[Any](n)
    var i = 0
    while (i < n) { rows(i) = InternalRow(syms(i), syms(i + 1)); i += 1 }
    new GenericArrayData(rows)
  }

  /** All adjacent symbol trigrams of a word — the created-pair context
    * census behind the batch-safety bound. */
  def trigramStructs(arr: ArrayData): ArrayData = {
    val syms = toArr(arr)
    val n = math.max(syms.length - 2, 0)
    val rows = new Array[Any](n)
    var i = 0
    while (i < n) { rows(i) = InternalRow(syms(i), syms(i + 1), syms(i + 2)); i += 1 }
    new GenericArrayData(rows)
  }
}

/** Shared plumbing: an array<string> → kernel expression over a frozen
  * merge list; the merge literals ride `references`, so generated code
  * is identical across training rounds (janino cache hits). */
sealed trait BpeMergeListExpression extends UnaryExpression {
  def merges: Seq[(String, String)]

  @transient protected lazy val lhsArr: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._1)).toArray
  @transient protected lazy val rhsArr: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._2)).toArray
  @transient protected lazy val mergedArr: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._1 + m._2)).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName input must be array<string>, got ${other.sql}")
  }

  protected def refs(ctx: CodegenContext): (String, String, String) = (
    ctx.addReferenceObj("lhs", lhsArr, "org.apache.spark.unsafe.types.UTF8String[]"),
    ctx.addReferenceObj("rhs", rhsArr, "org.apache.spark.unsafe.types.UTF8String[]"),
    ctx.addReferenceObj("merged", mergedArr, "org.apache.spark.unsafe.types.UTF8String[]"))
}

/** `bpe_batch_merge(syms) -> array<string>`: the accepted merges applied
  * greedily in rank order. */
case class BpeBatchMerge(child: Expression, merges: Seq[(String, String)])
    extends BpeMergeListExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_batch_merge"
  override def nullSafeEval(input: Any): Any =
    BpeWordOps.batchMerge(input.asInstanceOf[ArrayData], lhsArr, rhsArr, mergedArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (l, r, m) = refs(ctx)
    defineCodeGen(ctx, ev, c => s"graft.expr.BpeWordOps.batchMerge($c, $l, $r, $m)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeBatchMerge =
    copy(child = newChild)
}

/** `bpe_adjacent_any(syms) -> boolean`: affected-words filter. */
case class BpeAdjacentAny(child: Expression, merges: Seq[(String, String)])
    extends BpeMergeListExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bpe_adjacent_any"
  override def nullSafeEval(input: Any): Any =
    BpeWordOps.adjacentAny(input.asInstanceOf[ArrayData], lhsArr, rhsArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (l, r, _) = refs(ctx)
    defineCodeGen(ctx, ev, c => s"graft.expr.BpeWordOps.adjacentAny($c, $l, $r)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeAdjacentAny =
    copy(child = newChild)
}

/** `bpe_pair_deltas(syms) -> array<struct<l,r,sign>>`: post-rewrite
  * pairs (+1) and pre-rewrite pairs (-1) in one pass. */
case class BpePairDeltas(child: Expression, merges: Seq[(String, String)])
    extends BpeMergeListExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("l", StringType, nullable = false),
    StructField("r", StringType, nullable = false),
    StructField("sign", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "bpe_pair_deltas"
  override def nullSafeEval(input: Any): Any =
    BpeWordOps.pairDeltas(input.asInstanceOf[ArrayData], lhsArr, rhsArr, mergedArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (l, r, m) = refs(ctx)
    defineCodeGen(ctx, ev, c => s"graft.expr.BpeWordOps.pairDeltas($c, $l, $r, $m)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpePairDeltas =
    copy(child = newChild)
}

/** `bpe_pairs(syms) -> array<struct<l,r>>`: adjacent pairs (overlaps
  * counted) — initial census fodder. */
case class BpePairStructs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("l", StringType, nullable = false),
    StructField("r", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "bpe_pairs"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName input must be array<string>, got ${other.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    BpeWordOps.pairStructs(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.BpeWordOps.pairStructs($c)")
  override protected def withNewChildInternal(newChild: Expression): BpePairStructs =
    copy(child = newChild)
}

/** `bpe_trigrams(syms) -> array<struct<a,b,c>>`: adjacent symbol
  * trigrams — batch-safety context census. */
case class BpeTrigramStructs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", StringType, nullable = false),
    StructField("b", StringType, nullable = false),
    StructField("c", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "bpe_trigrams"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName input must be array<string>, got ${other.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    BpeWordOps.trigramStructs(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.BpeWordOps.trigramStructs($c)")
  override protected def withNewChildInternal(newChild: Expression): BpeTrigramStructs =
    copy(child = newChild)
}
