package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch: decompose q117's cost — staging writes vs the 4-round
  * incremental-dedup loop vs Structured Streaming machinery. Runs the
  * loop twice: once directly over the staged batch frames (no stream),
  * once through the real q117 path (via SparkEntry), printing phase
  * timings. Findings feed SCALE.md / the q117 scaladoc.
  */
object ProfileStreamDedup {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "2").toInt
    for (i <- 1 to reps) {
      println(s"--- iteration $i")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val batches = time("  split 4 frames (localCheckpoint)") {
        (0 to 3).map(k => docs.filter(col("doc_id") % 4 === k).localCheckpoint())
      }
      time("  4-round loop, no stream") {
        val shEmpty = Dedup.shingleTable(docs.limit(0), "doc_id", "text", 3)
        var ix = Dedup.ShingleIndex(shEmpty,
          shEmpty.groupBy(col("doc_id")).agg(count(lit(1)).as("n")),
          shEmpty.groupBy(col("sh")).agg(count(lit(1)).as("df")))
        var results = List.empty[DataFrame]
        for ((b, k) <- batches.zipWithIndex) {
          val sh = time(s"    r$k shingle ckpt") {
            Dedup.shingleTable(b, "doc_id", "text", 3).localCheckpoint()
          }
          val pairs = Dedup.dedupAgainstIndex(sh, ix, "doc_id",
            threshold = 0.5, maxShingleDf = 1000)
          val dupIds = pairs.select(col("new_id").as("doc_id")).distinct()
          val decided = time(s"    r$k pairs+decided ckpt") {
            b.select(col("doc_id"))
              .join(dupIds.withColumn("__dup", lit(true)), Seq("doc_id"), "left")
              .select(col("doc_id"),
                coalesce(col("__dup"), lit(false)).unary_!.as("kept"))
              .localCheckpoint()
          }
          ix = time(s"    r$k foldIn") {
            Dedup.foldIn(ix, sh, decided.filter(col("kept")), "doc_id")
          }
          results = decided :: results
        }
        results.reduce(_ unionByName _).count()
      }
      time("  full q117 (stream)") {
        graft.SparkEntry.queries("q117_stream_incr_dedup")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
