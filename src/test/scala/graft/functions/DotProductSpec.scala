package graft.functions

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {

  private lazy val emb = {
    GraftFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
      .cache()
  }

  test("native dot is bit-identical to the aggregate(zip_with) composition") {
    val both = emb.select(
      GraftFunctions.dotNative(col("v"), col("v")).as("n"),
      Similarity.dot(col("v"), col("v")).as("h"))
    assert(both.filter(col("n") =!= col("h")).count() == 0)
  }

  test("null input yields null; mismatched lengths use min length") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 5.0))),
      (None, Some(Seq(1.0))),
    ).toDF("a", "b")
    val out = df.select(GraftFunctions.dotNative(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 11.0) // 1*3 + 2*4, third element ignored
    assert(out(1).isNullAt(0))
  }

  test("expression participates in whole-stage codegen") {
    val plan = emb.select(GraftFunctions.dotNative(col("v"), col("v")))
      .queryExecution.executedPlan
    // the `*(n)` prefix marks operators inside a WholeStageCodegen stage
    assert(plan.toString.contains("*(1) Project"), plan.toString)
  }

  test("SQL surface via extension-style registration") {
    emb.createOrReplaceTempView("emb_dot_spec")
    val r = spark.sql(
      "SELECT max(graft_dot(v, v)) AS m FROM emb_dot_spec").head().getDouble(0)
    assert(r > 0.0)
  }
}
