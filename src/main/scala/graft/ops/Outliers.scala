package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection: median/MAD z-scores — the
  * data-quality gate that flags anomalous numeric records (corrupt
  * measurements, log spikes, poisoned labels) before they reach
  * training. Median and MAD are 50%-breakdown estimators: unlike
  * mean/stddev, the outliers themselves cannot drag the fence.
  *
  * Scale shape: two grouped aggregates over the value column (median,
  * then MAD around it) and one final scan emitting flagged rows — the
  * per-group statistics relations are |groups| rows and broadcast back,
  * so the data side is never shuffled. Exact percentiles concentrate a
  * group's values into its aggregation buffer (the q42 caveat): with
  * few, large groups at 100 TB swap `percentile` for
  * `percentile_approx` / t-digest — the fence moves by the sketch error,
  * the semantics don't.
  *
  * Cross-engine determinism: median interpolation can differ in the
  * last ulp between engines, so both statistics are rounded to 6
  * decimals BEFORE the z computation — downstream arithmetic then runs
  * on bit-identical operands; the z itself rounds to 6 ahead of the
  * threshold test.
  */
object Outliers {

  /** Rows whose |value − median| exceeds `threshold` robust standard
    * deviations (MAD · 1.4826, the normal-consistency constant):
    * original columns + `med`, `mad`, `robust_z`.
    *
    * MAD = 0 policy (a group where >50% of values are identical): the
    * robust z is UNDEFINED there, so `robust_z` is null and the group
    * flags nothing. The naive division would yield Infinity for every
    * non-median row (flagging half a constant-heavy group) and NaN for
    * value == med — and engines disagree on ±0/NaN division and NaN
    * ordering, so the guard is also what keeps the op replayable
    * cross-engine. A degenerate group needs a different detector
    * (exact frequency, not dispersion); the explicit null says so
    * instead of manufacturing flags.
    */
  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
      threshold: Double = 3.0): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(round(expr(s"percentile($valueCol, 0.5)"), 6).as("med"))
    val withMed = df.join(broadcast(med), groupCol)
    val mad = withMed
      .select(col(groupCol), abs(col(valueCol) - col("med")).as("dev"))
      .groupBy(col(groupCol))
      .agg(round(expr("percentile(dev, 0.5)"), 6).as("mad"))
    withMed.join(broadcast(mad), groupCol)
      .withColumn("robust_z",
        when(col("mad") > 0,
          round(abs(col(valueCol) - col("med")) / (lit(1.4826) * col("mad")), 6)))
      .filter(col("robust_z") > threshold)
  }
}
