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
  *   1. bucket by the ID VALUE (`id div bucketWidth`) — deterministic
  *      group boundaries with no sampling and no dependence on
  *      physical partitioning (an earlier draft used
  *      `spark_partition_id` after a range repartition; that costs a
  *      second corpus-sized exchange because the window then has to
  *      hash-partition by pid — the value-derived bucket needs ONE);
  *   2. per-bucket running sums in parallel (window partitioned by
  *      bucket, ordered by id);
  *   3. bucket totals — one row per bucket, corpus_size/bucketWidth
  *      rows — get their own prefix via a window over that tiny
  *      relation alone, then broadcast-join back.
  * Cost: one keyed shuffle of (id, n_tok) + a broadcast of #buckets
  * rows. At 100 TB pick bucketWidth so #buckets stays ~10^5-10^6:
  * the prefix relation is still single-task trivial and each bucket's
  * sort fits one task comfortably.
  */
object SequencePacking {

  /** (id, n_tok, start_tok, seq_id, seq_offset, n_seqs) per document:
    * `seq_id` = window index where the document begins, `seq_offset`
    * its position inside that window, `n_seqs` how many windows it
    * touches. Pure integer arithmetic — engine-portable by
    * construction.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      window: Int, bucketWidth: Int = 4096): DataFrame = {
    require(window > 0, "window must be positive")
    require(bucketWidth > 0, "bucketWidth must be positive")
    val base = df
      .select(col(idCol), TextAnalysis.tokenCount(col(textCol)).as("n_tok"))
      .withColumn("__g", expr(s"$idCol div $bucketWidth"))
    val wIn = Window.partitionBy(col("__g")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = base.withColumn("local_cum",
      coalesce(sum(col("n_tok")).over(wIn), lit(0L)))
    // one row per bucket; the keyless window below runs over THIS
    // relation only (corpus/bucketWidth rows), never the corpus
    val wTot = Window.orderBy(col("__g"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = base.groupBy("__g")
      .agg(sum(col("n_tok")).as("__gtot"))
      .withColumn("bucket_prefix", coalesce(sum(col("__gtot")).over(wTot), lit(0L)))
      .select(col("__g"), col("bucket_prefix"))
    // `div` (integral division), never `/` + cast: Spark's double cast
    // truncates where DuckDB's rounds — integer arithmetic sidesteps
    // the divergence entirely (same rule as q29's chunk count)
    local.join(broadcast(prefixes), "__g")
      .withColumn("start_tok", col("bucket_prefix") + col("local_cum"))
      .selectExpr(idCol, "n_tok", "start_tok",
        s"start_tok div $window AS seq_id",
        s"start_tok % $window AS seq_offset",
        s"CASE WHEN n_tok = 0 THEN CAST(1 AS BIGINT) ELSE " +
          s"((start_tok + n_tok - 1) div $window) - (start_tok div $window) + 1 END AS n_seqs")
  }
}
