package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable element-wise vector sum — the aggregation primitive behind
  * distributed centroid updates (k-means) and any "mean embedding" rollup.
  *
  * Why not posexplode + groupBy(pos)? That fans every vector into `dim`
  * shuffle rows (a 64-dim corpus shuffles 64× its cardinality) and needs a
  * second aggregation to reassemble the array. This Aggregator keeps the
  * whole vector as ONE buffer that partially aggregates map-side, so the
  * shuffle carries one row per group per partition — at 100 TB the
  * difference between a metadata-sized shuffle and re-shuffling the corpus
  * dimension-times over.
  *
  * The empty buffer doubles as the zero element (vector width is learned
  * from the first row), so the same instance serves any dimensionality.
  */
object VectorSumAgg extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
  def zero: Array[Double] = Array.emptyDoubleArray

  def reduce(b: Array[Double], a: Seq[Double]): Array[Double] =
    if (a == null) b
    else if (b.isEmpty) a.toArray
    else {
      // fail loudly on ragged input: silently truncating (or crashing with
      // an index error) on a mixed-dimension corpus would corrupt the sum
      // nondeterministically by partition order
      require(a.length == b.length,
        s"VectorSumAgg: mixed vector dimensions (${b.length} vs ${a.length})")
      var i = 0
      while (i < b.length) { b(i) += a(i); i += 1 }
      b
    }

  def merge(x: Array[Double], y: Array[Double]): Array[Double] =
    if (x.isEmpty) y
    else if (y.isEmpty) x
    else {
      require(x.length == y.length,
        s"VectorSumAgg: mixed vector dimensions (${x.length} vs ${y.length})")
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }

  def finish(b: Array[Double]): Seq[Double] = b.toSeq

  def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
