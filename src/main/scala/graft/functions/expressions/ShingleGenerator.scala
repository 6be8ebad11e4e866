package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating expression producing n-token shingles of a text column.
  *
  * The composable form — `explode(transform(sequence(...), i =>
  * concat_ws(' ', element_at(toks, i), ...)))` — evaluates interpreted
  * higher-order lambdas per element (HigherOrderFunction is CodegenFallback)
  * and allocates an intermediate array per row; profiled at ~5s for 5k docs
  * at sf0.1. This generator is one native pass per document: split once,
  * emit shingles — same output, ~10x less per-row overhead.
  *
  * Semantics mirror `split(lower(text), ' ')` + the 1..len-n+1 window join
  * exactly (including empty tokens from repeated spaces, limit = -1), so
  * results stay bit-identical to the DuckDB oracle's list comprehension.
  * Callers pass already-lowercased text so case normalization stays in
  * Catalyst (`lower(text)`).
  */
case class ShingleGenerator(child: Expression, n: Int, unique: Boolean = false)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = new StructType().add("sh", StringType)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType && n >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_shingles expects (string, positive n), got ${child.dataType}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (toks.length < n) Nil
      else {
        val out = new scala.collection.mutable.ArrayBuffer[InternalRow](
          toks.length - n + 1)
        // `unique` emits each doc's DISTINCT shingles (first-occurrence
        // order): `generator.distinct()` downstream would be a corpus-wide
        // shuffle on (doc_id, shingle) strings, but the set is per-document
        // by construction — dedup belongs HERE, row-local and shuffle-free.
        val seen = if (unique) new java.util.HashSet[String]() else null
        var i = 0
        while (i <= toks.length - n) {
          val sb = new java.lang.StringBuilder(toks(i))
          var k = 1
          while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
          val sh = sb.toString
          if (seen == null || seen.add(sh))
            out += InternalRow(UTF8String.fromString(sh))
          i += 1
        }
        out
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGenerator =
    copy(child = newChild)
}
