package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Scratch: run selected queries repeatedly in one JVM to separate
  * steady-state cost from JIT/GC warm-up variance.
  */
object ProfileRepeat {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q21_minhash_neardup", "q22_simhash")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // single-file local inputs: smaller splits restore scan parallelism
      // (at cluster scale the 128MB default is correct; this is a local
      // I/O-shape knob, not a semantic one)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "3").toInt
    // SPARK_GRAFT_PROFILE_GC=1: force GC + drain between runs — isolates
    // "inherent cost" from "accumulated not-yet-collected block pressure"
    // (the ContextCleaner releases checkpoint blocks only after a GC).
    val gcBetween = sys.env.get("SPARK_GRAFT_PROFILE_GC").contains("1")
    for (name <- names; i <- 1 to reps) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (gcBetween) { (1 to 4).foreach { _ => System.gc(); Thread.sleep(250) } }
    }
    spark.stop()
  }
}
