package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The point of q62 is the *plan*: a join of two tables bucketed by the
  * join key must not shuffle either input. The oracle proves result
  * parity; this spec pins the zero-exchange physical plan.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans with zero exchanges") {
    val base = s"${sys.props("java.io.tmpdir")}/graft_bktspec_${ProcessHandle.current().pid()}"
    (1L to 100L).map(i => (i, i % 7)).toDF("k", "grp")
      .write.mode("overwrite").format("parquet")
      .bucketBy(4, "k").sortBy("k")
      .option("path", s"$base/a").saveAsTable("graft_spec_a")
    (1L to 300L).map(i => (i % 100 + 1, i.toDouble)).toDF("k2", "v")
      .write.mode("overwrite").format("parquet")
      .bucketBy(4, "k2").sortBy("k2")
      .option("path", s"$base/b").saveAsTable("graft_spec_b")
    // disable auto-broadcast: tiny test tables would broadcast and skip
    // the bucketed scan entirely (at real scale both sides exceed any
    // broadcast threshold — SMJ over buckets is the plan that matters)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_spec_a")
        .join(spark.table("graft_spec_b"), col("k") === col("k2"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(joined.count() == 300L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
