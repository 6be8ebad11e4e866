package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass {count, min, max, mean, population variance, stddev} typed
  * aggregator — the distributed replacement for the reference's driver-side
  * `StatCounter` fold (TemperatureActor.scala:87-103 collects a day's values
  * to the driver and folds; this merges per-partition buffers instead, so it
  * scales to arbitrarily large groups).
  *
  * Merge uses the standard parallel-variance (Chan et al.) combination, the
  * same algebra Spark's own StatCounter uses. Population (not sample)
  * variance, matching the reference.
  */
object StatsAggregator {

  final case class StatBuf(n: Long, mu: Double, m2: Double, mn: Double, mx: Double)
  final case class Stats(count: Long, min: Double, max: Double,
      mean: Double, variance: Double, stdev: Double)

  val zero: StatBuf = StatBuf(0L, 0.0, 0.0, Double.PositiveInfinity, Double.NegativeInfinity)

  def add(b: StatBuf, x: Double): StatBuf = {
    val n = b.n + 1
    val delta = x - b.mu
    val mu = b.mu + delta / n
    StatBuf(n, mu, b.m2 + delta * (x - mu), math.min(b.mn, x), math.max(b.mx, x))
  }

  def merge(a: StatBuf, b: StatBuf): StatBuf =
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val delta = b.mu - a.mu
      StatBuf(n,
        a.mu + delta * b.n / n,
        a.m2 + b.m2 + delta * delta * a.n * b.n / n,
        math.min(a.mn, b.mn), math.max(a.mx, b.mx))
    }

  def finish(b: StatBuf): Stats =
    if (b.n == 0) Stats(0, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN)
    else Stats(b.n, b.mn, b.mx, b.mu, b.m2 / b.n, math.sqrt(b.m2 / b.n))

  /** Typed Aggregator usable as `ds.select(StatsAggregator(_.value).toColumn)`
    * or via groupByKey(...).agg(...). */
  def apply[IN](f: IN => Double): Aggregator[IN, StatBuf, Stats] =
    new Aggregator[IN, StatBuf, Stats] {
      def zero: StatBuf = StatsAggregator.zero
      def reduce(b: StatBuf, in: IN): StatBuf = add(b, f(in))
      def merge(a: StatBuf, b: StatBuf): StatBuf = StatsAggregator.merge(a, b)
      def finish(b: StatBuf): Stats = StatsAggregator.finish(b)
      def bufferEncoder: Encoder[StatBuf] = Encoders.product[StatBuf]
      def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
    }
}
