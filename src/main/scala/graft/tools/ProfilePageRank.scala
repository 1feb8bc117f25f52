package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Scratch: decompose q97's cost (pair generation vs power iterations)
  * and A/B the iteration shape — shuffle join (current) vs
  * dst-partitioned edges + broadcast ranks (candidate for small-|V|
  * graphs where |E| ≫ |V|).
  */
object ProfilePageRank {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rep <- 1 to 3) {
      val pairs = graft.ops.Similarity.nearDupPairs(
        spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        threshold = 0.35, numPlanes = 8)
      time(s"rep$rep pairs (checkpointed)") { pairs.count() }
      time(s"rep$rep pageRank current") {
        graft.ops.PageRank.pageRank(pairs, iters = 3).count()
      }
      time(s"rep$rep pageRank bcast") {
        val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
          .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
          .distinct()
        val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        val edgesDeg = edges.join(deg, "src")
          .repartition(col("dst"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val n = deg.count()
        val teleport = (1.0 - 0.85) / n
        var ranks = deg.select(col("src").as("id"), lit(1.0 / n).as("rank"))
        (1 to 3).foreach { _ =>
          val contrib = edgesDeg
            .join(broadcast(ranks), col("src") === col("id"))
            .select(col("dst"),
              round(col("rank") / col("deg").cast("double"), 12)
                .cast(DecimalType(28, 12)).as("c"))
          ranks = contrib.groupBy(col("dst").as("id"))
            .agg(round(lit(teleport) + lit(0.85) * sum(col("c")).cast("double"), 12)
              .as("rank"))
        }
        val c = ranks.count()
        edgesDeg.unpersist(false)
        c
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
