package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native lower-bound over a SORTED array<long>: the count of elements
  * strictly below `value` — equivalently, the partition id `value` lands
  * in when the array holds ascending range-split boundaries. This is the
  * inner loop of range partitioning, histogram bucketing, and percentile
  * assignment.
  *
  * The composable spelling — `aggregate(bs, 0L, (acc, b) ->
  * acc + IF(v > b, 1, 0))` — walks the whole array with two interpreted
  * lambdas per element per row (HigherOrderFunction is CodegenFallback):
  * O(len) interpreted work on the corpus-wide hot path. This primitive
  * is a branch-free-ish O(log len) binary search inside whole-stage
  * codegen, zero allocation.
  *
  * Contract: the array must be sorted ascending (callers use
  * `sort_array(collect_list(...))`); duplicate elements are fine (the
  * strict `<` counts them all, matching the linear-scan spelling). Null
  * array or null value → null; null ELEMENTS are rejected at runtime —
  * the function is registered session-wide for arbitrary user SQL, and
  * `ArrayData.getLong` on a null slot silently reads garbage, so a
  * probed null slot throws instead of returning a wrong partition id.
  * (Only slots the search probes are checked — O(log n) stays O(log n);
  * a sorted-ascending array with nulls anywhere is already malformed.)
  *
  * Registered as `graft_lower_bound` (GraftExtensions + ensureRegistered).
  */
case class LowerBound(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lower_bound"

  override def nullSafeEval(arr: Any, v: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val x = v.asInstanceOf[Long]
    var lo = 0
    var hi = a.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a.isNullAt(mid)) throw LowerBound.nullElement()
      if (a.getLong(mid) < x) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, v) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $a.numElements();
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($a.isNullAt($mid)) throw graft.functions.expressions.LowerBound.nullElement();
         |  if ($a.getLong($mid) < $v) { $lo = $mid + 1; } else { $hi = $mid; }
         |}
         |${ev.value} = (long) $lo;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LowerBound =
    copy(left = newLeft, right = newRight)
}

object LowerBound {
  /** Shared by eval and generated code (codegen can only call into
    * stable public entry points). */
  def nullElement(): IllegalArgumentException =
    new IllegalArgumentException(
      "graft_lower_bound: boundary array contains a null element; " +
        "boundaries must be a sorted array of non-null longs")
}
