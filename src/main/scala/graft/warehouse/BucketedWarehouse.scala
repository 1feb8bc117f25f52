package graft.warehouse

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hash-bucketed parquet warehouse — the 100 TB shape of the MERGE layer.
  *
  * [[ParquetWarehouse]] rewrites the whole target per merge; fine for a
  * demo, wrong at scale. Here the target is laid out as
  * `root/<table>/__bucket=N/` with N = murmur3(key) mod `numBuckets`,
  * and a merge:
  *
  *  1. computes the distinct bucket ids present in the stage (≤ a few
  *     for an incremental batch);
  *  2. reads ONLY those bucket partitions of the target — partition
  *     pruning on the directory column, the other (numBuckets - k)
  *     partitions are never opened;
  *  3. upserts within them (same [[Merge.upsert]] algebra);
  *  4. rewrites only those partitions via dynamic partition overwrite.
  *
  * So merge cost scales with the BATCH, not the TARGET: a 10-row stage
  * into a 100 TB target touches k ≤ 10 buckets ≈ (k/numBuckets) of the
  * data. Production would use a transactional format (Delta/Iceberg) for
  * the commit; the pruning/rewrite algebra is identical.
  */
final class BucketedWarehouse(spark: SparkSession, root: String, numBuckets: Int = 16) {

  private val bucketCol = "__bucket"

  def path(table: String): String = s"$root/$table"

  def exists(table: String): Boolean = new java.io.File(path(table)).exists()

  private def withBucket(df: DataFrame, keys: Seq[String]): DataFrame =
    df.withColumn(bucketCol, pmod(hash(keys.map(col): _*), lit(numBuckets)))

  /** Full table content without the bucket column. */
  def read(table: String): DataFrame =
    spark.read.parquet(path(table)).drop(bucketCol)

  /** MERGE `stage` into `table` on `keys`, touching only the bucket
    * partitions the stage hashes into.
    */
  def mergeInto(table: String, stage: DataFrame, keys: Seq[String]): Unit = {
    val bucketedStage = withBucket(stage, keys)
    if (!exists(table)) {
      withBucket(Merge.dedupLastWins(stage, keys, Nil), keys)
        .write.partitionBy(bucketCol).parquet(path(table))
      return
    }
    val touched = bucketedStage.select(bucketCol).distinct()
      .collect().map(_.getInt(0)).sorted
    // Partition pruning: the filter on the directory column means only
    // the touched buckets' files are listed and read.
    val targetSlice = spark.read.parquet(path(table))
      .filter(col(bucketCol).isin(touched.toIndexedSeq.map(x => x: Any): _*))
      .drop(bucketCol)
    val merged = withBucket(Merge.upsert(targetSlice, stage, keys), keys)
    // localCheckpoint breaks the lineage back to the files about to be
    // replaced (Spark refuses to overwrite a path its plan reads; a
    // cluster deployment checkpoints to reliable storage or commits via
    // a transactional table format instead).
    merged.localCheckpoint(eager = true)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(bucketCol)
      .parquet(path(table))
  }

  /** Bucket ids currently materialized on disk (for tests/inspection). */
  def bucketDirs(table: String): Seq[Int] = {
    val d = new java.io.File(path(table))
    if (!d.exists()) Seq.empty
    else d.listFiles().filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith(s"$bucketCol="))
      .map(_.stripPrefix(s"$bucketCol=").toInt).sorted.toSeq
  }

  /** Data-file paths per bucket (for asserting untouched partitions). */
  def dataFiles(table: String, bucket: Int): Set[String] = {
    val d = new java.io.File(s"${path(table)}/$bucketCol=$bucket")
    if (!d.exists()) Set.empty
    else d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
  }
}
