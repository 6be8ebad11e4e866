package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact distinct count of BOUNDED non-negative integer ids as a mergeable
  * bitmap aggregate — the third sketch-shaped TypedImperativeAggregate next
  * to MisraGries (frequency) and BloomFilterAggregate (membership), but
  * EXACT: a set bit per observed id.
  *
  * Why it earns its place against the built-ins at 100 TB:
  *  - count(DISTINCT x) plans an Expand + a second shuffle keyed on
  *    (group, x) — the distinct shuffle is corpus-sized for high-frequency
  *    ids even when the ID SPACE is small.
  *  - approx_count_distinct is one pass but approximate.
  *  - This is one pass, map-side combined, exact, and each partial is at
  *    most maxId/8 bytes (lazily sized to the highest id actually seen) —
  *    the standard roaring-bitmap pattern for dictionary-encoded ids
  *    (user ids, station ids, enum keys), minus the run-length compression
  *    a bounded dense id space doesn't need.
  *
  * Contract: values must lie in [0, maxId); negatives or overflows throw —
  * a silent drop would report a wrong exact count. Nulls are skipped like
  * every SQL aggregate. SQL: graft_bitmap_distinct(id, maxId).
  */
case class BitmapDistinct(
    child: Expression,
    maxId: Long,
    emitBitmap: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.BitSet] with UnaryLike[Expression] {

  override def prettyName: String =
    if (emitBitmap) "graft_bitmap_agg" else "graft_bitmap_distinct"
  override def nullable: Boolean = false
  override def dataType: DataType = if (emitBitmap) BinaryType else LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if ((child.dataType == LongType || child.dataType == IntegerType) &&
        maxId >= 1 && maxId <= Int.MaxValue.toLong)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_bitmap_distinct expects (int/bigint id, 1 <= maxId <= 2^31-1), " +
          s"got ${child.dataType}, maxId=$maxId")

  override def createAggregationBuffer(): java.util.BitSet = new java.util.BitSet()

  override def update(b: java.util.BitSet, input: InternalRow): java.util.BitSet = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Number].longValue()
      require(id >= 0 && id < maxId,
        s"graft_bitmap_distinct: id $id outside [0, $maxId)")
      b.set(id.toInt)
    }
    b
  }

  override def merge(b: java.util.BitSet, o: java.util.BitSet): java.util.BitSet = {
    b.or(o); b
  }

  override def eval(b: java.util.BitSet): Any =
    if (emitBitmap) b.toByteArray else b.cardinality().toLong

  override def serialize(b: java.util.BitSet): Array[Byte] = b.toByteArray

  override def deserialize(bytes: Array[Byte]): java.util.BitSet =
    java.util.BitSet.valueOf(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapDistinct =
    copy(child = newChild)
}

/** |A ∩ B| of two serialized bitmaps (the eval output of graft_bitmap_agg)
  * — the exact audience-overlap primitive: segment bitmaps are built in
  * one corpus pass each, and every pairwise (or k-way, by folding)
  * intersection is then a byte-sized driver/exchange-free operation on
  * the aggregated rows. Interpreted eval (CodegenFallback) is fine here:
  * the expression runs on segment-count-sized data, never per corpus row.
  * SQL: graft_bitmap_and_count(b1, b2). */
case class BitmapAndCount(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def prettyName: String = "graft_bitmap_and_count"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_bitmap_and_count expects (binary, binary), got " +
          s"(${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = java.util.BitSet.valueOf(l.asInstanceOf[Array[Byte]])
    a.and(java.util.BitSet.valueOf(r.asInstanceOf[Array[Byte]]))
    a.cardinality().toLong
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapAndCount =
    copy(left = newLeft, right = newRight)
}
