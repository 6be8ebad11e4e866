package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local n-gram repetition census: (total n-grams, distinct n-grams,
  * top n-gram count) of a text column in ONE pass over the row.
  *
  * A document is one row, so the C4/Gopher repetition signal needs no
  * cross-row state at all — yet the composable spelling (explode shingles →
  * groupBy(doc, gram) → groupBy(doc)) pays TWO corpus-wide shuffles keyed on
  * gram strings for what is per-row arithmetic. This generator folds the
  * whole census where the data already sits: split once, count into a
  * per-row hash map, emit one 3-long row. Zero exchanges at any corpus
  * size; the census twin of [[ShingleGenerator]]'s `unique` mode.
  *
  * A GENERATOR (emitting exactly one row, or none) rather than a
  * struct-valued scalar expression deliberately: a CodegenFallback scalar
  * drops its projection out of whole-stage codegen AND out of codegen's
  * subexpression elimination, so every field reference in the consuming
  * projection re-runs the full census (measured 2.3× SLOWER than the
  * two-shuffle plan it replaced). Generate evaluates the census exactly
  * once per input row, like every other generator.
  *
  * Tokenization mirrors ShingleGenerator exactly (`split(' ', -1)`, empty
  * tokens kept, tokens joined with one space) so results stay bit-identical
  * to the DuckDB oracle's list-comprehension spelling. Emits NO row when
  * the text is null or has fewer than n tokens (no n-grams — both engines
  * drop such docs).
  */
case class RepetitionStats(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = new StructType()
    .add("n_grams", LongType, nullable = false)
    .add("n_uniq", LongType, nullable = false)
    .add("top_n", LongType, nullable = false)

  override def prettyName: String = "graft_repetition_stats"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType && n >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_repetition_stats expects (string, positive n), got ${child.dataType}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (toks.length < n) Nil
      else {
        val total = toks.length - n + 1
        val counts = new java.util.HashMap[String, Long](total * 2)
        var top = 0L
        var i = 0
        while (i <= toks.length - n) {
          val sb = new java.lang.StringBuilder(toks(i))
          var k = 1
          while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
          val c = counts.merge(sb.toString, 1L, _ + _)
          if (c > top) top = c
          i += 1
        }
        InternalRow(total.toLong, counts.size.toLong, top) :: Nil
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}
