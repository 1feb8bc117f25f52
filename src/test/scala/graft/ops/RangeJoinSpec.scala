package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(probe: org.apache.spark.sql.DataFrame,
      intervals: org.apache.spark.sql.DataFrame) =
    probe.join(intervals, col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "iv").collect().map(_.toSeq).toSet

  test("intervalJoin equals the naive range join, overlapping intervals") {
    val probe = Seq((1L, 0.0), (2L, 4.999), (3L, 5.0), (4L, 12.5), (5L, 19.999), (6L, 20.0), (7L, -3.0))
      .toDF("id", "v")
    val intervals = Seq((10L, 0.0, 10.0), (11L, 5.0, 20.0), (12L, 15.0, 25.0), (13L, 100.0, 101.0))
      .toDF("iv", "lo", "hi")
    for (w <- Seq(1.0, 3.0, 7.0, 50.0)) {
      val got = RangeJoin.intervalJoin(probe, "v", intervals, "lo", "hi", bucketWidth = w)
        .select("id", "iv").collect().map(_.toSeq).toSet
      assert(got == naive(probe, intervals), s"bucketWidth=$w")
    }
  }

  test("hi bound is exclusive, lo inclusive") {
    val probe = Seq((1L, 10.0)).toDF("id", "v")
    val intervals = Seq((1L, 0.0, 10.0), (2L, 10.0, 20.0)).toDF("iv", "lo", "hi")
    val got = RangeJoin.intervalJoin(probe, "v", intervals, "lo", "hi", 4.0)
      .select("iv").as[Long].collect().toSet
    assert(got == Set(2L))
  }

  test("bucket decomposition produces no duplicate (probe, interval) rows") {
    val probe = (1L to 50L).map(i => (i, i.toDouble)).toDF("id", "v")
    val intervals = Seq((1L, 0.0, 60.0)).toDF("iv", "lo", "hi") // spans many buckets
    val rows = RangeJoin.intervalJoin(probe, "v", intervals, "lo", "hi", 2.5)
    assert(rows.count() == rows.dropDuplicates("id", "iv").count())
    assert(rows.count() == 50L)
  }
}
