package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Min/Max under an arbitrary `Ordering` — the reference's Algebird
  * `Min.aggregator`/`Max.aggregator` surface including its custom-Ordering
  * test case (killrweather-app AggregationSpec.scala:23-41; SURVEY §2.4 A9),
  * as typed Spark Aggregators: associative, commutative, null-safe via the
  * Option buffer, so partial aggregation and merge order never change the
  * result (given a total order).
  */
object OrderedAggregators {

  /** The row minimizing `key(in)` under `ord`; ties keep the first reduced,
    * so pair with a total order (tie-break inside `ord`) for determinism. */
  def minBy[IN, K](key: IN => K)(implicit ord: Ordering[K],
      e: Encoder[Option[IN]], out: Encoder[IN]): Aggregator[IN, Option[IN], IN] =
    pick[IN, K](key, ord.lt)

  def maxBy[IN, K](key: IN => K)(implicit ord: Ordering[K],
      e: Encoder[Option[IN]], out: Encoder[IN]): Aggregator[IN, Option[IN], IN] =
    pick[IN, K](key, ord.gt)

  private def pick[IN, K](key: IN => K, wins: (K, K) => Boolean)(
      implicit e: Encoder[Option[IN]], out: Encoder[IN]): Aggregator[IN, Option[IN], IN] =
    new Aggregator[IN, Option[IN], IN] {
      def zero: Option[IN] = None
      def reduce(b: Option[IN], in: IN): Option[IN] = b match {
        case Some(cur) => if (wins(key(in), key(cur))) Some(in) else b
        case None => Some(in)
      }
      def merge(a: Option[IN], b: Option[IN]): Option[IN] = (a, b) match {
        case (Some(x), Some(y)) => if (wins(key(y), key(x))) b else a
        case (Some(_), None) => a
        case _ => b
      }
      def finish(b: Option[IN]): IN =
        b.getOrElse(throw new NoSuchElementException("empty group"))
      def bufferEncoder: Encoder[Option[IN]] = e
      def outputEncoder: Encoder[IN] = out
    }
}
