package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession

/** Reproduce the BENCH loop shape for q21 exactly (noop write +
  * clearCache between iterations, bench session confs) to localize the
  * round-8 regression: candidate counts were flat (~800 pairs), so the
  * suspect is per-iteration fixed cost, not pair-space blowup.
  */
object ProfileQ21Bench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    for (i <- 1 to 6) {
      val t0 = System.nanoTime()
      Dedup.nearDuplicates(docs, "doc_id", "text", 0.5)
        .orderBy("id_a", "id_b")
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      println(f"q21 bench-shape run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
