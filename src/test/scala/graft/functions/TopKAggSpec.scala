package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def agg(df: org.apache.spark.sql.DataFrame, k: Int) = {
    GraftFunctions.register(spark)
    df.groupBy("g")
      .agg(call_function("graft_topk", col("v"), col("id"), lit(k)).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
  }

  test("keeps the k best ids, best first, id tie-break ascending") {
    val df = Seq(
      ("a", 1.0, 1L), ("a", 5.0, 2L), ("a", 3.0, 3L), ("a", 5.0, 4L),
      ("b", 2.0, 10L)).toDF("g", "v", "id")
    val out = agg(df, 3)
    assert(out("a") == List(2L, 4L, 5L).take(0) ++ List(2L, 4L, 3L)) // 5.0@2, 5.0@4, 3.0@3
    assert(out("b") == List(10L))
  }

  test("groups larger than k are truncated; partial-merge across partitions is correct") {
    val rows = (1L to 1000L).map(i => ("g", i.toDouble, i))
    val df = spark.createDataset(rows).toDF("g", "v", "id").repartition(8)
    val out = agg(df, 5)
    assert(out("g") == List(1000L, 999L, 998L, 997L, 996L))
  }

  test("TempStatsAgg (typed Aggregator): one-pass min/max/mean across partitions") {
    import spark.implicits._
    val ds = spark.createDataset((1 to 100).map(_.toDouble)).repartition(8)
    val stats = ds.select(TypedAggregators.TempStatsAgg.toColumn).head()
    assert(stats.min == 1.0 && stats.max == 100.0 && stats.n == 100L)
    assert(math.abs(stats.mean - 50.5) < 1e-12)
  }

  test("nulls in the sort value are ignored") {
    val df = Seq(("a", Some(1.0), 1L), ("a", None, 2L), ("a", Some(3.0), 3L))
      .toDF("g", "v", "id")
    assert(agg(df, 2)("a") == List(3L, 1L))
  }
}
