package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distributed per-group ranking — the row_number counterpart of
  * [[SequencePacking]]'s prefix sum and [[Sampling.tokenBudgetSelect]]'s
  * budget fill, for the window family ([[rankColumns]]: ntile /
  * percent_rank / cume_dist) whose OUTPUT is corpus-sized and therefore
  * cannot take [[graft.functions.TopKAgg]]'s bounded-heap shortcut:
  * every row needs its global rank within the group, so the group must
  * be totally ordered — the question is only whether that order is
  * materialized as ONE task's sort (`Window.partitionBy(group)` — the
  * skew-killer when the group column has single-digit cardinality) or
  * as parallel per-bucket sorts stitched by a tiny prefix relation.
  *
  * Shape: bucket by the ORDER VALUE (`floor(orderCol / bucketWidth)` —
  * deterministic, monotone, ties co-bucketed), row_number within
  * (group, bucket) in parallel, then the per-(group, bucket) COUNTS —
  * |buckets| rows per group — get their own prefix via a window over
  * that summary relation alone and broadcast back: global rank =
  * bucket offset + local rank. Identical to the single-window rank for
  * every positive width (rank under a total order is unique; the spec
  * pins window-equality), so judged oracles stay plain SQL.
  */
object Ranking {

  /** `rnCol` = the 1-based global rank of each row within `groupCol`
    * under (`orderCol` asc, `tieCol` asc — a total order), computed as
    * parallel per-bucket ranks + a broadcast bucket-offset join.
    * `orderCol` must be numeric (exactly double-representable — every
    * score/price/count here); rows with NULL order/tie keys rank
    * nondeterministically in the window form and must be filtered
    * upstream.
    */
  def bucketedRowNumber(df: DataFrame, groupCol: String, orderCol: String,
      tieCol: String, bucketWidth: Double,
      rnCol: String = "rn"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val base = df.withColumn("__rb",
      floor(col(orderCol).cast("double") / lit(bucketWidth)).cast("long"))
    val wIn = Window.partitionBy(col(groupCol), col("__rb"))
      .orderBy(col(orderCol).asc, col(tieCol).asc)
    val local = base.withColumn("__lrn", row_number().over(wIn))
    // one row per (group, bucket); the prefix window below partitions
    // by GROUP over this summary relation only, never the corpus
    val wTot = Window.partitionBy(col(groupCol)).orderBy(col("__rb").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = base.groupBy(col(groupCol), col("__rb"))
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__boff", coalesce(sum(col("__bn")).over(wTot), lit(0L)))
      .select(col(groupCol), col("__rb"), col("__boff"))
    local.join(broadcast(prefixes), Seq(groupCol, "__rb"))
      .withColumn(rnCol, col("__boff") + col("__lrn"))
      .drop("__rb", "__lrn", "__boff")
  }

  /** The distribution-window family derived from the distributed rank:
    * given `rn` (1-based global rank under a TOTAL order, so rank =
    * row_number and every row is its own peer group) and `n` (group
    * size), reproduce Spark's window semantics in closed form:
    *  - `ntile(t)`: the first n % t tiles get ⌈n/t⌉ rows, the rest
    *    ⌊n/t⌋ (Spark's NTile exactly);
    *  - `percent_rank` = (rn − 1) / (n − 1), 0 for a 1-row group;
    *  - `cume_dist` = rn / n.
    * Both ratios rounded to 6 (the cross-engine float discipline).
    */
  def ntileOf(rn: Column, n: Column, tiles: Int): Column = {
    // exact integral division on longs: Column `/` is DOUBLE division,
    // whose floor can land one off once the numerator passes ~2^26
    // (correctly-rounded a/b drifts past the integer below when the
    // remainder fraction is smaller than the rounding error) — subtract
    // the remainder first so the division is exact
    def idiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    val q = idiv(n.cast("long"), lit(tiles.toLong)) // floor bucket size
    val r = pmod(n.cast("long"), lit(tiles.toLong)) // first r tiles: q+1 rows
    val cut = r * (q + 1L)
    when(rn <= cut, idiv(rn - 1L, q + 1L) + 1L)
      .otherwise(r + idiv(rn - cut - 1L, q) + 1L)
  }

  def percentRankOf(rn: Column, n: Column): Column =
    when(n === 1L, lit(0.0))
      .otherwise(round((rn - 1L).cast("double") / (n - 1L).cast("double"), 6))

  def cumeDistOf(rn: Column, n: Column): Column =
    round(rn.cast("double") / n.cast("double"), 6)
}
