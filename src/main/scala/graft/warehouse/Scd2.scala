package graft.warehouse

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Slowly-changing-dimension type 2: collapse an ordered attribute stream
  * into validity runs — one row per (key, consecutive-attribute-run) with
  * `valid_from` / `valid_to` / `is_current`.
  *
  * The reference's MERGE layer (location.sql:43-59 et al.) is type 1
  * (overwrite); type 2 is the standard warehouse extension of the same
  * protocol, so the engine ships it as a first-class operator.
  *
  * Scale: two window passes over the same (key, ts, tie) sort — Catalyst
  * plans them in a single Exchange + Sort since both windows share the
  * partitioning and ordering; the stream shuffles once.
  */
object Scd2 {

  /** Build the type-2 history of `attrCol` per `keyCol`, ordered by
    * (`tsCol`, `tieCol`). A run starts where the attribute differs from
    * the previous row; `valid_to` is the start of the next run (null on
    * the open, current run).
    */
  def buildHistory(df: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    def w: org.apache.spark.sql.expressions.WindowSpec =
      Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val runsStart = df
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
      .drop("__prev")
    runsStart
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Merge a new snapshot into an existing type-2 dimension: close the
    * current row of every key whose attribute changed (set `valid_to` to
    * the snapshot time) and append a new current row for changed and new
    * keys. Unchanged keys pass through untouched — re-applying the same
    * snapshot is a no-op (idempotent, like the reference's keyed MERGE).
    */
  def applySnapshot(dim: DataFrame, snapshot: DataFrame, keyCol: String,
      attrCol: String, snapshotTs: Column): DataFrame = {
    // `__seen` marks keys that HAVE a current row — null attributes are
    // legal, so presence can't be inferred from `__cur_attr.isNull`, and
    // the attribute comparison must be null-safe (<=>): a change to/from
    // NULL is a real change, NULL -> NULL is not.
    val cur = dim.filter(col("is_current"))
      .select(col(keyCol), col(attrCol).as("__cur_attr"), lit(true).as("__seen"))
    val changedOrNew = snapshot.select(col(keyCol), col(attrCol))
      .join(cur, Seq(keyCol), "left")
      .filter(col("__seen").isNull || !(col("__cur_attr") <=> col(attrCol)))
      .select(col(keyCol), col(attrCol),
        snapshotTs.as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"),
        lit(true).as("is_current"))
    val changedKeys = changedOrNew.select(col(keyCol)).withColumn("__chg", lit(true))
    // Single pass over the (large) dimension: flag changed keys with one
    // broadcast join; a row is closed iff it is the current row of a
    // changed key, everything else passes through untouched.
    val flagged = dim.join(broadcast(changedKeys), Seq(keyCol), "left")
    val isClosing = col("__chg").isNotNull && col("is_current")
    val history = flagged.select(
      dim.columns.toIndexedSeq.map {
        case "valid_to"   => when(isClosing, snapshotTs).otherwise(col("valid_to")).as("valid_to")
        case "is_current" => when(isClosing, lit(false)).otherwise(col("is_current")).as("is_current")
        case c            => col(c)
      }: _*)
    history.unionByName(changedOrNew.select(dim.columns.toIndexedSeq.map(col): _*))
  }
}
