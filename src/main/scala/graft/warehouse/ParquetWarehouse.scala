package graft.warehouse

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Parquet-directory warehouse: one dir per target table, updated by
  * keyed MERGE ([[Merge.upsert]]) or insert-only append
  * ([[Merge.insertNew]]) — the stand-in for the reference's Snowflake
  * target tables (reference: location.sql:11-18 et al.) in an offline,
  * no-Delta environment.
  *
  * Writes go through a staging dir + atomic-ish rename because a Spark
  * plan cannot overwrite a path it is reading. On a real cluster this
  * layer is a transactional table format (Delta/Iceberg) with the same
  * merge algebra; at 100 TB the target is partitioned (by key prefix or
  * date) and only affected partitions rewrite.
  */
final class ParquetWarehouse(spark: SparkSession, root: String) {

  def path(table: String): String = s"$root/$table"

  def exists(table: String): Boolean = new java.io.File(path(table)).exists()

  def read(table: String): DataFrame = spark.read.parquet(path(table))

  def readIfExists(table: String): Option[DataFrame] =
    if (exists(table)) Some(read(table)) else None

  /** Overwrite `table` with `df` via write-to-staging + swap. */
  def overwrite(table: String, df: DataFrame): Unit = {
    val tmp = s"$root/.${table}_tmp"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val dest = new java.io.File(path(table))
    if (dest.exists()) {
      dest.listFiles().foreach(_.delete())
      dest.delete()
    }
    new java.io.File(tmp).renameTo(dest)
  }

  /** MERGE `stage` into `table` on `keys` (M1/M3-M5 semantics). */
  def mergeInto(table: String, stage: DataFrame, keys: Seq[String]): Unit = {
    val merged = readIfExists(table) match {
      case Some(target) => Merge.upsert(target, stage, keys)
      case None => Merge.dedupLastWins(stage, keys, Nil)
    }
    overwrite(table, merged)
  }

  /** Insert-only dimension append (M2/D5 semantics). */
  def insertNewInto(table: String, rows: DataFrame, keys: Seq[String]): Unit = {
    val merged = readIfExists(table) match {
      case Some(dim) => Merge.insertNew(dim, rows, keys)
      case None => Merge.dedupLastWins(rows.distinct(), keys, Nil)
    }
    overwrite(table, merged)
  }
}
