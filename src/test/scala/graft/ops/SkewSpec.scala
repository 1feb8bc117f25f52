package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin result equals the plain join on a skewed key") {
    val large = (1L to 500L).map(i => (i, if (i % 10 == 0) "rare" else "hot"))
      .toDF("id", "k")
    val small = Seq(("hot", 1), ("rare", 2)).toDF("k", "label")
    val plain = large.join(small, Seq("k"))
      .select("id", "k", "label").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(large, small, Seq("k"), saltBy = col("id"), salts = 8)
      .select("id", "k", "label").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("salting spreads a hot key across multiple shuffle partitions") {
    val large = (1L to 1000L).map(i => (i, "hot")).toDF("id", "k")
    val small = Seq(("hot", 1)).toDF("k", "label")
    val parts = Skew.saltedJoin(large, small, Seq("k"), saltBy = col("id"), salts = 8)
      .groupBy(spark_partition_id().as("p")).count()
    assert(parts.count() > 1) // plain join on one key = exactly one partition
  }
}
