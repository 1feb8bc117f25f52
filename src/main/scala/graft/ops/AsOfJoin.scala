package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** As-of (nearest-earlier) join — attach to each left row the latest
  * right row with `right.time <= left.time` within the same key group.
  *
  * The reference has no such operator (SURVEY.md §2.6 notes no
  * theta/range/as-of joins), but time-series enrichment is table stakes
  * for an observation engine, so it ships as a composed operator, per the
  * build rules' preference order: built-in composition before custom
  * plans.
  *
  * Implementation: union-tag + running `last(_, ignoreNulls)` window —
  * right rows sort before left rows at equal timestamps (as-of `>=`
  * matches same-instant rows). Scale: exactly ONE shuffle on the key
  * columns and a per-partition time sort; no range cross-product, no
  * per-row subquery, state O(1) per group during the scan. A sort-merge
  * band join would shuffle the same data but risks duplicating matches;
  * this shape is the standard Spark as-of idiom.
  */
object AsOfJoin {

  /** @param prefix prepended to every right payload column in the output.
    * Inner semantics: left rows with no earlier right row are dropped
    * (matching SQL `ASOF JOIN`); check `<prefix><rightTime>` for nulls
    * before the filter if left-join semantics are wanted.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, prefix: String = "asof_"): DataFrame = {
    require(!(left.columns ++ right.columns).exists(c => c == "__t" || c == "__tag"),
      "asOf reserves the column names __t and __tag")
    val leftPayload = left.columns.filterNot(c => keys.contains(c)).toSeq
    val rightPayload = right.columns.filterNot(c => keys.contains(c) || c == rightTime).toSeq
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap

    val alignedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__tag")) ++
        leftPayload.map(col) ++
        Seq(lit(null).cast(rightTypes(rightTime)).as(s"__r_$rightTime")) ++
        rightPayload.map(c => lit(null).cast(rightTypes(c)).as(s"__r_$c")): _*)
    val alignedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__tag")) ++
        leftPayload.map(c => lit(null).cast(leftTypes(c)).as(c)) ++
        Seq(col(rightTime).as(s"__r_$rightTime")) ++
        rightPayload.map(c => col(c).as(s"__r_$c")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val rightOut = (rightTime +: rightPayload).map(c =>
      last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"$prefix$c"))

    alignedLeft.unionByName(alignedRight)
      .select((keys.map(col) ++ Seq(col("__t"), col("__tag")) ++
        leftPayload.map(col) ++ rightOut): _*)
      .filter(col("__tag") === 1 && col(s"$prefix$rightTime").isNotNull)
      .drop("__t", "__tag")
  }

  /** Forward as-of: attach to each left row the EARLIEST right row with
    * `right.time >= left.time` (nearest-later). Mirror of [[asOf]]: left
    * rows sort before right rows at equal timestamps (so a same-instant
    * right row matches), and the running window becomes `first(_,
    * ignoreNulls)` over the FOLLOWING frame. Same single-shuffle shape.
    */
  def asOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, prefix: String = "asof_"): DataFrame = {
    require(!(left.columns ++ right.columns).exists(c => c == "__t" || c == "__tag"),
      "asOfForward reserves the column names __t and __tag")
    val leftPayload = left.columns.filterNot(c => keys.contains(c)).toSeq
    val rightPayload = right.columns.filterNot(c => keys.contains(c) || c == rightTime).toSeq
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap

    val alignedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(0).as("__tag")) ++
        leftPayload.map(col) ++
        Seq(lit(null).cast(rightTypes(rightTime)).as(s"__r_$rightTime")) ++
        rightPayload.map(c => lit(null).cast(rightTypes(c)).as(s"__r_$c")): _*)
    val alignedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(1).as("__tag")) ++
        leftPayload.map(c => lit(null).cast(leftTypes(c)).as(c)) ++
        Seq(col(rightTime).as(s"__r_$rightTime")) ++
        rightPayload.map(c => col(c).as(s"__r_$c")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val rightOut = (rightTime +: rightPayload).map(c =>
      first(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"$prefix$c"))

    alignedLeft.unionByName(alignedRight)
      .select((keys.map(col) ++ Seq(col("__t"), col("__tag")) ++
        leftPayload.map(col) ++ rightOut): _*)
      .filter(col("__tag") === 0 && col(s"$prefix$rightTime").isNotNull)
      .drop("__t", "__tag")
  }
}
