package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: characterize the near-dup pair graph a CC query runs on
  * (edge count, node count, component count/size distribution) and time
  * both component algorithms on it. Explains CC cost at a given SF —
  * propagation rounds scale with component diameter, star rounds with
  * log(diameter) — so a density/diameter report tells us whether a slow
  * sweep number is plan overhead or genuinely bigger graph work.
  *
  * Usage: sbt "runMain graft.tools.GraphStats /tmp/graft-sf1"
  */
object GraphStats {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val pairs = graft.ops.Similarity.nearDupPairs(
      emb, "vec_id", "embedding", threshold = 0.35, numPlanes = 4)
      .persist()
    val nPairs = pairs.count()
    val nNodes = pairs.select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct().count()
    println(s"[graph] edges=$nPairs nodes=$nNodes dir=$dir")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[time] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val prop = time("propagation") {
      val c = graft.ops.Dedup.duplicateClusters(pairs).persist()
      c.count(); c
    }
    val star = time("star") {
      val c = graft.ops.Dedup.duplicateClustersStar(pairs).persist()
      c.count(); c
    }
    val sizes = prop.groupBy("cluster_id").agg(count(lit(1)).as("sz"))
    sizes.agg(count(lit(1)).as("components"), max("sz").as("max_sz"),
        expr("percentile(sz, 0.5)").as("median_sz"), sum("sz").as("nodes"))
      .show(false)
    sizes.groupBy("sz").agg(count(lit(1)).as("n_components"))
      .orderBy(desc("sz")).show(10, false)
    val agree = prop.join(star, Seq("id"))
      .filter(prop("cluster_id") =!= star("cluster_id")).count()
    println(s"[check] label disagreements prop-vs-star: $agree")
    spark.stop()
  }
}
