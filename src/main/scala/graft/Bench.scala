package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR`, forcing full computation through the `noop`
  * sink (a bare `count()` would let Catalyst prune projections and
  * under-measure), and prints one JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Per-query warm-up immediately before its timed run: the first
    // execution of a plan pays whole-stage-codegen compilation + JIT
    // (profiled at 3-6x steady state), and the codegen class cache is a
    // ~100-entry LRU, so a single global warm-up pass over 29 queries
    // evicts early plans before they are timed. Warming at the same SF
    // matters too — AQE picks size-dependent physical plans. The timed
    // number is operator throughput, not JVM spin-up.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Unit =
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      // Adaptive warm-up: multi-stage plans take several executions for
      // JIT tiering to settle (q21 profiles 12.8 -> 6.2 -> 3.8 -> 1.8 s);
      // repeat until the run stops improving by >20%, max 3 iterations.
      try {
        var prev = Double.MaxValue
        var warm = 0
        var improving = true
        while (warm < 3 && improving) {
          val w0 = System.nanoTime()
          once()
          spark.catalog.clearCache()
          val t = (System.nanoTime() - w0) / 1e9
          improving = t < prev * 0.8
          prev = t
          warm += 1
        }
      } catch { case _: Throwable => () }
      val t0 = System.nanoTime()
      try once()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // Drop any cache a query pinned (e.g. the minhash shingle table) so
      // queries don't pay each other's memory pressure.
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
