package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: MEASURE the per-vector PQ quantization-distortion
  * distributions that [[graft.ops.ProductQuantize.quantizationDrift]]
  * thresholds, instead of guessing a tau: the codebook is trained on
  * the full corpus (the q146/q202 build shape), then distortion
  * quantiles are printed for
  *   - the build corpus itself,
  *   - an ALIGNED batch (the odd half — a subset of the build
  *     distribution, must keep the bad fraction ≈ the build's),
  *   - a DRIFTED batch (the corpus folded through |x| — collapsed into
  *     the positive orthant, reconstructs poorly under signed-trained
  *     codewords).
  * The printed bad fractions at candidate taus say which frozen
  * threshold separates the scenarios with margin at every scale
  * factor.
  *
  * Usage: sbt "runMain graft.tools.ProfilePqDrift <sfDir>"
  */
object ProfilePqDrift {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.ProductQuantize

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val codebook = ProductQuantize.train(emb, "vec_id", "embedding",
      m = 4, k = 8, iters = 1)

    def report(tag: String, batch: org.apache.spark.sql.DataFrame): Unit = {
      val d = ProductQuantize.distortion(batch, "vec_id", "embedding",
          codebook, m = 4)
        .select(col("dist").cast("double").as("dist"))
      val qs = d.stat.approxQuantile("dist",
        Array(0.1, 0.25, 0.5, 0.75, 0.9, 0.99), 0.001)
      println(s"$tag quantiles(10/25/50/75/90/99): " +
        qs.map(x => f"$x%.4f").mkString(" "))
      val mm = d.agg(min(col("dist")), max(col("dist"))).head()
      println(f"$tag%-8s min=${mm.getDouble(0)}%.4f max=${mm.getDouble(1)}%.4f")
      val n = d.count()
      for (tau <- Seq(0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 1.0, 1.2)) {
        val bad = d.filter(col("dist") > tau).count()
        println(f"$tag%-8s tau=$tau%.2f bad=$bad/$n (${bad.toDouble / n}%.3f)")
      }
    }
    report("build", emb)
    report("aligned", emb.filter(col("vec_id") % 2 === 1))
    report("folded", emb.select(col("vec_id"),
      transform(col("embedding"), x => abs(x)).as("embedding")))
    report("scaled3x", emb.select(col("vec_id"),
      transform(col("embedding"),
        x => x.cast("double") * lit(3.0)).as("embedding")))
    spark.stop()
  }
}
