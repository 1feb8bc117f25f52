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
    * parallel per-bucket ranks + a bucket-offset join (broadcast in
    * the measured-small regime — [[bucketKeyOf]]/[[joinPrefixes]]).
    * `orderCol` must be numeric (exactly double-representable — every
    * score/price/count here) and NULL/NaN-free: a NULL or NaN order
    * value has no well-defined bucket (the window form ranks such rows
    * nondeterministically), so the bucket key FAILS FAST on one
    * (`raise_error` inside the key expression — caught at execution,
    * zero extra passes) instead of silently dropping the row at the
    * join.
    */
  def bucketedRowNumber(df: DataFrame, groupCol: String, orderCol: String,
      tieCol: String, bucketWidth: Double,
      rnCol: String = "rn"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val base = df.withColumn("__rb",
      bucketKeyOf(col(orderCol), bucketWidth, "Ranking.bucketedRowNumber"))
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
    joinPrefixes(local, prefixes, groupCol)
      .withColumn(rnCol, col("__boff") + col("__lrn"))
      .drop("__rb", "__lrn", "__boff")
  }

  /** The bucket key `floor(order / width)`, failing FAST on NULL/NaN
    * order values (shared with [[Sampling.tokenBudgetSelect]]): both
    * operators' global-order stitch joins on this key, so a row whose
    * key is NULL would silently vanish where the window form ranked it
    * — an error the caller must see, not a dropped row.
    */
  private[ops] def bucketKeyOf(order: Column, width: Double,
      op: String): Column = {
    val d = order.cast("double")
    when(d.isNull || isnan(d),
        raise_error(lit(s"$op: NULL/NaN order value — rank is undefined; " +
          "filter or impute upstream")))
      .otherwise(floor(d / lit(width))).cast("long")
  }

  /** Join the corpus back to its |groups|·|buckets| summary relation —
    * broadcast only in the MEASURED-small regime ([[Dedup
    * .broadcastIfSmall]]'s discipline: the summary is materialized via
    * `localCheckpoint`, counted once, and hinted only under the bound).
    * A pathological `bucketWidth` (far smaller than the order value's
    * spread) makes the summary corpus-sized; an unconditional hint
    * would then build a driver-OOM broadcast silently — above the
    * bound the hint is dropped and the planner/AQE picks a shuffle
    * join, which is merely slower, never wrong.
    *
    * Cost note (a deliberate tradeoff, kept): the measured regime makes
    * this call EAGER — the checkpoint plus the count run two small jobs
    * at plan-construction time even when the summary is trivially
    * tiny, and a checkpointed block is lost on executor failure
    * (recomputed from lineage... which a localCheckpoint severs, so a
    * mid-pipeline executor loss fails the query). Both costs are paid
    * knowingly: the summary is |groups|·|buckets| rows (the two jobs
    * are milliseconds), while the alternative — an unconditional
    * broadcast hint — turns a mis-sized `bucketWidth` into a silent
    * driver OOM. A caller-asserted fast path was considered and
    * rejected: the summary's size depends on the order column's spread,
    * which callers don't reliably know.
    */
  private[ops] def joinPrefixes(local: DataFrame, prefixes: DataFrame,
      groupCol: String, bucketCol: String = "__rb"): DataFrame = {
    val p = prefixes.localCheckpoint()
    local.join(Dedup.broadcastIfSmall(p), Seq(groupCol, bucketCol))
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
