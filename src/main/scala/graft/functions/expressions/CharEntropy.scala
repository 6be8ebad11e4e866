package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row character-histogram entropy accumulator for txt_char_entropy.
  *
  * Returns `array<bigint> [n_chars, n_distinct, s_micro]` where `s_micro =
  * Σ_ch cnt·⌊ln(cnt/n)·1e6 + 0.5⌋` — the integer micro-unit log-sum the
  * query divides into the final entropy. The composable form exploded one
  * row PER CHARACTER (`explode(split(text, ''))`) before the (doc, char)
  * combine, shuffling ~text-length rows per document; this expression folds
  * the whole histogram row-locally, so nothing leaves the scan but three
  * longs per document (measured 2.9x-vs-DuckDB -> at-parity on the calm
  * floor). Characters are iterated per CODE POINT, matching the oracle's
  * `regexp_extract_all(text, '[\s\S]')` unit exactly.
  *
  * The histogram loop lives in [[CharEntropyMicro.compute]], a static
  * helper the generated code calls directly — one non-virtual call per row
  * keeps the expression inside whole-stage codegen (the [[DotProduct]] /
  * [[LowerBound]] discipline; the map build itself can't be inlined as
  * straight-line Janino).
  */
case class CharEntropyMicro(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_char_entropy"

  override def nullSafeEval(v: Any): Any =
    CharEntropyMicro.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.CharEntropyMicro.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyMicro =
    copy(child = newChild)
}

object CharEntropyMicro {
  /** One pass over the string: code-point histogram, then the micro-unit
    * log fold. Long addition is commutative, so map iteration order can't
    * perturb the result — bit-identical to the oracle's per-(doc,char)
    * GROUP BY + SUM. Empty input returns [0, 0, 0]; callers filter
    * `length(text) > 0` so the undefined-entropy case never reaches the
    * divide (the oracle's unnest-of-empty-list produces no row).
    */
  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val hist = new java.util.HashMap[Integer, java.lang.Long]()
    val len = str.length
    var i = 0
    var n = 0L
    while (i < len) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      val k = Integer.valueOf(cp)
      val prev = hist.get(k)
      hist.put(k, if (prev == null) 1L else prev.longValue() + 1L)
    }
    var sMicro = 0L
    val it = hist.values().iterator()
    while (it.hasNext) {
      val cnt = it.next().longValue()
      sMicro += cnt * math.floor(math.log(cnt.toDouble / n) * 1e6 + 0.5).toLong
    }
    new GenericArrayData(Array(n, hist.size.toLong, sMicro))
  }
}
