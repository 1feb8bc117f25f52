package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Ranking]]'s contract: the bucketed distributed rank and the
  * closed-form distribution columns equal Spark's own window functions
  * exactly, for every bucket width, including the degenerate group
  * sizes (1-row group, group smaller than the tile count, exact order
  * ties resolved by the tie key).
  */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  // 3 groups of very different sizes: 1-row, 3-row (< 4 tiles), 200-row;
  // values collide across rows (v = i*13 % 37) so tie-breaks matter
  private val df = (
    Seq(("tiny", 900L, 5.0)) ++
    (1L to 3L).map(i => ("small", i, (i * 13 % 37).toDouble)) ++
    (1L to 200L).map(i => ("big", 300L + i, (i * 13 % 37).toDouble))
  ).toDF("grp", "id", "v")

  private def windowForm = {
    val w = Window.partitionBy(col("grp")).orderBy(col("v").asc, col("id").asc)
    df.select(col("grp"), col("id"),
        row_number().over(w).cast("long").as("rn"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
  }

  test("bucketedRowNumber + closed forms == the window functions, for every width") {
    val expected = windowForm
    val counts = df.groupBy(col("grp")).agg(count(lit(1)).as("n"))
    Seq(0.5, 3.0, 17.0, 1e9).foreach { width =>
      val got = Ranking.bucketedRowNumber(df, "grp", "v", "id", width)
        .join(broadcast(counts), "grp")
        .select(col("grp"), col("id"), col("rn").cast("long").as("rn"),
          Ranking.ntileOf(col("rn"), col("n"), 4).as("quartile"),
          Ranking.percentRankOf(col("rn"), col("n")).as("pct_rank"),
          Ranking.cumeDistOf(col("rn"), col("n")).as("cume"))
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
      assert(got == expected, s"width $width diverged from the window form")
    }
  }

  test("ntileOf matches Spark's NTile tile sizes on uneven splits") {
    // 10 rows, 4 tiles -> sizes 3,3,2,2 (first n%t tiles get the extra)
    val ten = (1L to 10L).map(i => ("g", i, i.toDouble)).toDF("grp", "id", "v")
    val got = Ranking.bucketedRowNumber(ten, "grp", "v", "id", 2.0)
      .withColumn("n", lit(10L))
      .select(col("id"), Ranking.ntileOf(col("rn"), col("n"), 4).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.partitionBy(col("grp")).orderBy(col("v").asc, col("id").asc)
    val expected = ten.select(col("id"), ntile(4).over(w).cast("long").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.values.groupBy(identity).view.mapValues(_.size).toMap ==
      Map(1L -> 3, 2L -> 3, 3L -> 2, 4L -> 2))
  }
}
