package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Morton/Z-value bit interleave of two 8-bit grid coordinates —
  * the clustering key behind multi-dimensional data layout (OPTIMIZE
  * ZORDER): `z = Σᵢ bit(x,i)·2^(2i) + bit(y,i)·2^(2i+1)` for i ∈ [0,8).
  *
  * The composable spelling — `aggregate(sequence(0,7), 0L, (acc,i) ->
  * acc + ...)`, see rel_zorder_layout's oracle — allocates a sequence
  * array and interprets two lambdas per element per row (HigherOrderFunction
  * is CodegenFallback); this primitive is a fused 8-iteration integer loop
  * inside whole-stage codegen, zero allocation. Inputs beyond 8 bits keep
  * only their low byte (callers pre-scale to the 0..255 grid).
  *
  * Registered as `graft_zvalue` (GraftExtensions + ensureRegistered).
  */
case class MortonZ(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zvalue"

  private def interleave(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 8) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < 8; $i++) {
         |  $z |= (($a >> $i) & 1L) << (2 * $i);
         |  $z |= (($b >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonZ =
    copy(left = newLeft, right = newRight)
}
