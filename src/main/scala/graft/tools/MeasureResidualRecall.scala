package graft.tools

import graft.ops.ProductQuantize
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Diagnostic: measured mean recall@10 of the residual tiers (the
  * numbers behind q169's floors), per scale factor. Run:
  * `sbt "runMain graft.tools.MeasureResidualRecall"`.
  */
object MeasureResidualRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val n = emb.count()
      val stride = math.max(50L, n / 40)
      val (res, corpus, cents) = ProductQuantize.residualBase(
        emb, "vec_id", "embedding", numCentroids = 8, kmeansIters = 1)
      val codebook = ProductQuantize.train(res, "id", "rv", 8, 32, 1)
      val hits = ProductQuantize.residualRecallHits(corpus, cents, res,
        codebook, stride, 7, 10, 8, 4, math.max(8, ((n + 124) / 125).toInt))
      val agg = hits.agg(count(lit(1)), sum(col("adc_hits")),
        sum(col("tt_hits")), sum(col("ivfpq_hits"))).head()
      val p = agg.getLong(0).toDouble * 10
      println(f"$sf n=$n probes=${agg.getLong(0)} " +
        f"residual_adc=${agg.getLong(1) / p}%.3f " +
        f"residual_two_tier=${agg.getLong(2) / p}%.3f " +
        f"ivfpq_residual=${agg.getLong(3) / p}%.3f")
      corpus.unpersist()
    }
    spark.stop()
  }
}
