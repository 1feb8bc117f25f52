package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed aggregates via the public `Aggregator[IN, BUF, OUT]` API — the
  * third aggregate flavor in this engine next to built-ins and the
  * internal [[TopKAgg]] (`TypedImperativeAggregate`). `Aggregator` is the
  * right tool when callers live in `Dataset[T]` land: the buffer is a
  * case class with a product encoder, merge is pure, and the result can
  * ride in a `select(agg.toColumn)`.
  */
object TypedAggregators {

  /** Streaming-friendly temperature extremes + mean in one pass. */
  case class TempStats(min: Double, max: Double, sum: Double, n: Long) {
    def mean: Double = if (n == 0) Double.NaN else sum / n
  }

  /** Aggregates (min, max, mean, count) of a Double column in one pass. */
  object TempStatsAgg extends Aggregator[Double, TempStats, TempStats] {
    def zero: TempStats = TempStats(Double.MaxValue, Double.MinValue, 0.0, 0L)
    def reduce(b: TempStats, t: Double): TempStats =
      TempStats(math.min(b.min, t), math.max(b.max, t), b.sum + t, b.n + 1)
    def merge(a: TempStats, b: TempStats): TempStats =
      if (a.n == 0) b
      else if (b.n == 0) a
      else TempStats(math.min(a.min, b.min), math.max(a.max, b.max),
        a.sum + b.sum, a.n + b.n)
    def finish(r: TempStats): TempStats = r
    def bufferEncoder: Encoder[TempStats] = Encoders.product[TempStats]
    def outputEncoder: Encoder[TempStats] = Encoders.product[TempStats]
  }
}
