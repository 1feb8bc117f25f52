package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** As-of (nearest-earlier / nearest-later) join — attach to each left row
  * the latest right row with `right.time <= left.time` (backward) or the
  * earliest with `right.time >= left.time` (forward) within the same key
  * group.
  *
  * The reference has no such operator (SURVEY.md §2.6 notes no
  * theta/range/as-of joins), but time-series enrichment is table stakes
  * for an observation engine, so it ships as a composed operator, per the
  * build rules' preference order: built-in composition before custom
  * plans.
  *
  * Implementation: union-tag + running `last(_, ignoreNulls)` (backward)
  * / `first(_, ignoreNulls)` (forward) window — right rows sort so that
  * same-instant rows match. Scale: exactly ONE shuffle on the key
  * columns and a per-partition time sort; no range cross-product, no
  * per-row subquery, state O(1) per group during the scan. A sort-merge
  * band join would shuffle the same data but risks duplicating matches;
  * this shape is the standard Spark as-of idiom.
  *
  * ==Skew: time-range bucketing==
  * The plain window partitions by the KEY alone, so a single hot key
  * (10⁹ events for one user) serializes into one task. With
  * `bucketSeconds = Some(w)` the window instead partitions by
  * `(key, floor(time / w))`: the hot key's timeline splits across
  * `range/w` tasks. Cross-bucket correctness is restored by injecting,
  * per (key, bucket), ONE carry-in row — the nearest right row from any
  * earlier (backward) / later (forward) bucket — computed on the
  * per-(key, bucket) summary relation (|keys|·|buckets| rows, never
  * corpus-sized). A carry-in's timestamp lies strictly outside the
  * bucket's time range, so it can never tie with an in-bucket row and
  * the within-bucket tie semantics are untouched. `OpsPropertySpec`
  * pins bucketed ≡ unbucketed on tie-heavy random cases.
  */
object AsOfJoin {

  /** Backward as-of: latest right row with `right.time <= left.time`.
    *
    * @param prefix prepended to every right payload column in the output.
    * @param bucketSeconds when set, additionally partition the window by
    *   `floor(time / bucketSeconds)` to split a skewed key's timeline
    *   across tasks (see class doc). Semantics are identical.
    * Inner semantics: left rows with no earlier right row are dropped
    * (matching SQL `ASOF JOIN`); check `<prefix><rightTime>` for nulls
    * before the filter if left-join semantics are wanted.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, prefix: String = "asof_",
      bucketSeconds: Option[Long] = None): DataFrame =
    impl(forward = false, left, right, keys, leftTime, rightTime, prefix,
      bucketSeconds)

  /** Forward as-of: attach to each left row the EARLIEST right row with
    * `right.time >= left.time` (nearest-later). Mirror of [[asOf]]; same
    * single-shuffle shape and the same optional skew bucketing.
    */
  def asOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, prefix: String = "asof_",
      bucketSeconds: Option[Long] = None): DataFrame =
    impl(forward = true, left, right, keys, leftTime, rightTime, prefix,
      bucketSeconds)

  private def impl(forward: Boolean, left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTime: String, rightTime: String, prefix: String,
      bucketSeconds: Option[Long]): DataFrame = {
    val reserved = Seq("__t", "__tag", "__b", "__s", "__carry")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"asOf reserves the column names ${reserved.mkString(", ")}")
    val leftPayload = left.columns.filterNot(keys.contains).toSeq
    val rightPayload =
      right.columns.filterNot(c => keys.contains(c) || c == rightTime).toSeq
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    // at equal timestamps the RIGHT row must fall inside the left row's
    // window frame: backward frames look back, so right sorts first
    // (tag 0 < 1); forward frames look ahead, so right sorts last
    val (leftTag, rightTag) = if (forward) (0, 1) else (1, 0)
    val rightCarried = (rightTime +: rightPayload).map(c => s"__r_$c")

    val alignedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(leftTag).as("__tag")) ++
        leftPayload.map(col) ++
        Seq(lit(null).cast(rightTypes(rightTime)).as(s"__r_$rightTime")) ++
        rightPayload.map(c => lit(null).cast(rightTypes(c)).as(s"__r_$c")): _*)
    val alignedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(rightTag).as("__tag")) ++
        leftPayload.map(c => lit(null).cast(leftTypes(c)).as(c)) ++
        Seq(col(rightTime).as(s"__r_$rightTime")) ++
        rightPayload.map(c => col(c).as(s"__r_$c")): _*)

    val (unioned, partCols) = bucketSeconds match {
      case None =>
        (alignedLeft.unionByName(alignedRight), keys.map(col))
      case Some(wSec) =>
        def bucketed(df: DataFrame): DataFrame =
          df.withColumn("__b", floor(col("__t").cast("double") / wSec.toDouble))
        val l = bucketed(alignedLeft)
        val r = bucketed(alignedRight)
        val keyB = (keys :+ "__b").map(col)
        // nearest in-bucket right row per (key, bucket) — the only row an
        // ADJACENT bucket could ever need from this one
        val payload = struct(col("__t") +: rightCarried.map(col): _*)
        val pick = if (forward) min_by(payload, col("__t"))
                   else max_by(payload, col("__t"))
        val summary = r.groupBy(keyB: _*).agg(pick.as("__s"))
        // every (key, bucket) that holds a LEFT row needs a carry-in even
        // if no right row shares its bucket
        val combos = l.select(keyB: _*).union(r.select(keyB: _*)).distinct()
        val wCarry0 = Window.partitionBy(keys.map(col): _*).orderBy(col("__b"))
        val (wCarry, pickCarry) =
          if (forward)
            (wCarry0.rowsBetween(1, Window.unboundedFollowing),
              first(col("__s"), ignoreNulls = true))
          else
            (wCarry0.rowsBetween(Window.unboundedPreceding, -1),
              last(col("__s"), ignoreNulls = true))
        // carry-in row per (key, bucket): timestamp is the ORIGINAL right
        // time (strictly outside the bucket's range — a right row at the
        // bucket boundary belongs to the bucket itself), so it sorts
        // before (backward) / after (forward) every in-bucket row and
        // never perturbs tie handling
        val carries = combos.join(summary, keys :+ "__b", "left")
          .withColumn("__carry", pickCarry.over(wCarry))
          .filter(col("__carry").isNotNull)
          .select(keys.map(col) ++ Seq(col("__b"),
            col("__carry").getField("__t").as("__t"),
            lit(rightTag).as("__tag")) ++
            leftPayload.map(c => lit(null).cast(leftTypes(c)).as(c)) ++
            rightCarried.map(c => col("__carry").getField(c).as(c)): _*)
        (l.unionByName(r).unionByName(carries), keyB)
    }

    val w0 = Window.partitionBy(partCols: _*).orderBy(col("__t"), col("__tag"))
    val (w, pickRow) =
      if (forward)
        (w0.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          (c: Column) => first(c, ignoreNulls = true))
      else
        (w0.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          (c: Column) => last(c, ignoreNulls = true))
    val rightOut = (rightTime +: rightPayload).map(c =>
      pickRow(col(s"__r_$c")).over(w).as(s"$prefix$c"))

    unioned
      .select((keys.map(col) ++ Seq(col("__t"), col("__tag")) ++
        leftPayload.map(col) ++ rightOut): _*)
      .filter(col("__tag") === leftTag && col(s"$prefix$rightTime").isNotNull)
      .drop("__t", "__tag", "__b")
  }
}
