package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval/range join via bucket decomposition.
  *
  * Spark plans a plain `value BETWEEN lo AND hi` join as a broadcast
  * nested loop — O(probe × intervals) comparisons, which dies at scale.
  * Decomposing each interval into the fixed-width buckets it covers turns
  * the range predicate into an equi-join on the bucket id:
  *
  *  - each interval explodes into `ceil(width / bucketWidth) + 1` rows;
  *  - each probe row computes one bucket id with pure arithmetic;
  *  - the equi-join is hash-partitioned (or broadcast when the interval
  *    side is small), and an exact residual filter removes the boundary
  *    false positives.
  *
  * At 100 TB the probe side shuffles once on a long key (or not at all
  * with a broadcast interval side); the interval side's explosion factor
  * is bounded by `maxIntervalWidth / bucketWidth`, a planning-time choice.
  */
object RangeJoin {

  /** Join `probe` rows to every interval `[loCol, hiCol)` that contains
    * `valueCol`. Interval columns must be numeric; `bucketWidth` trades
    * interval-side replication against candidate-filter selectivity.
    */
  def intervalJoin(probe: DataFrame, valueCol: String, intervals: DataFrame,
      loCol: String, hiCol: String, bucketWidth: Double,
      broadcastIntervals: Boolean = true): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // Cover floor(lo/w)..floor(hi/w) inclusive: the top bucket may be a
    // superset (hi exclusive) — the residual filter is exact, so an extra
    // candidate bucket costs a comparison, never a wrong row.
    val exploded = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val buckets = if (broadcastIntervals) broadcast(exploded) else exploded
    probe
      .withColumn("__bucket", floor(col(valueCol) / bucketWidth).cast("long"))
      .join(buckets, "__bucket")
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }
}
