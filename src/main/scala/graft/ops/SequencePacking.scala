package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Greedy in-order sequence packing: lay the corpus's token stream out
  * end-to-end (documents in id order) and assign every document its
  * starting token offset, training-sequence id, and the number of
  * context windows it spans — the layout step that turns a curated
  * corpus into fixed-length training sequences.
  *
  * The global running sum is a DISTRIBUTED PREFIX SUM, not a keyless
  * window (`Window.orderBy` with no partition moves the whole corpus to
  * one task — the anti-pattern q67 exists to avoid):
  *   1. range-partition by the id (range boundaries may vary with
  *      sampling; the final offsets cannot — a prefix sum over a total
  *      order is independent of where partitions split);
  *   2. per-partition running sums in parallel (window partitioned by
  *      the physical partition id);
  *   3. per-partition totals — one row per partition, a provably tiny
  *      relation — get their own prefix via a window over that
  *      relation alone, then broadcast-join back.
  * Cost: one range shuffle + one per-partition sort + a broadcast of
  * #partitions rows. At 100 TB this is the same shape sort-based
  * global ranking uses; nothing corpus-sized ever converges on one
  * task.
  */
object SequencePacking {

  /** (id, n_tok, start_tok, seq_id, seq_offset, n_seqs) per document:
    * `seq_id` = window index where the document begins, `seq_offset`
    * its position inside that window, `n_seqs` how many windows it
    * touches. Pure integer arithmetic — engine-portable by
    * construction.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      window: Int): DataFrame = {
    require(window > 0, "window must be positive")
    val par = df.sparkSession.sparkContext.defaultParallelism
    val base = df
      .select(col(idCol), TextAnalysis.tokenCount(col(textCol)).as("n_tok"))
      .repartitionByRange(par, col(idCol))
      .withColumn("__pid", spark_partition_id())
    val wIn = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = base.withColumn("local_cum",
      coalesce(sum(col("n_tok")).over(wIn), lit(0L)))
    // one row per partition; the keyless window below runs over THIS
    // relation only (≤ parallelism rows), never the corpus
    val wTot = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = base.groupBy("__pid")
      .agg(sum(col("n_tok")).as("__ptot"))
      .withColumn("part_prefix", coalesce(sum(col("__ptot")).over(wTot), lit(0L)))
      .select(col("__pid"), col("part_prefix"))
    // `div` (integral division), never `/` + cast: Spark's double cast
    // truncates where DuckDB's rounds — integer arithmetic sidesteps
    // the divergence entirely (same rule as q29's chunk count)
    local.join(broadcast(prefixes), "__pid")
      .withColumn("start_tok", col("part_prefix") + col("local_cum"))
      .selectExpr(idCol, "n_tok", "start_tok",
        s"start_tok div $window AS seq_id",
        s"start_tok % $window AS seq_offset",
        s"CASE WHEN n_tok = 0 THEN CAST(1 AS BIGINT) ELSE " +
          s"((start_tok + n_tok - 1) div $window) - (start_tok div $window) + 1 END AS n_seqs")
  }
}
