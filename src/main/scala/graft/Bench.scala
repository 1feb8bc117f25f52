package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR`, forcing full computation through the `noop`
  * sink (a bare `count()` would let Catalyst prune projections and
  * under-measure), and prints one JSON line.
  *
  * Methodology (pinned in round 3 — the round-2 adaptive early-exit
  * recorded warm-up for some queries and mislabeled them regressions):
  *  - FIXED iteration count per query: `warmups` discarded runs, then
  *    `measured` timed runs. No early exit — the first execution of a
  *    plan pays whole-stage-codegen compilation + JIT tiering (3-10x
  *    steady state), and convergence under a 70-query sweep takes more
  *    runs than alone because the JVM's JIT profiles are polluted by
  *    neighboring queries.
  *  - `queries` reports the MIN over measured runs (the standard
  *    steady-state estimator under one-sided noise; also what rounds 1-2
  *    reported, so round-over-round comparison stays apples-to-apples);
  *    `queries_median` reports the median for a noise-robust second
  *    opinion — a big min/median gap flags an unconverged measurement
  *    rather than a slow plan.
  *  - the codegen class cache is raised from its 100-entry default:
  *    71 queries x 5 runs would otherwise evict and recompile each
  *    other's generated classes mid-sweep.
  *  - Global soft budget: past it, remaining queries get 1 warm-up +
  *    1 measured run — keeps the sweep's wall-clock bounded no matter
  *    how noisy the host is.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val warmups = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUPS", "2").toInt
    val measured = sys.env.getOrElse("SPARK_GRAFT_BENCH_MEASURED", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // single-file local inputs: smaller splits restore scan parallelism
      // (at cluster scale the 128MB default is correct; this is a local
      // I/O-shape knob, not a semantic one)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "460").toDouble
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
      val (nWarm, nMeas) = if (elapsedSec > budgetSec) (1, 1) else (warmups, measured)
      var failed: Option[String] = None
      val times =
        try {
          (0 until nWarm).foreach(_ => once())
          (0 until nMeas).map(_ => once()).sorted
        } catch {
          case e: Throwable => failed = Some(e.getMessage); Seq.empty[Double]
        }
      if (failed.isDefined)
        System.err.println(s"[bench] $name failed: ${failed.get}")
      val mn = if (times.isEmpty) -1.0 else times.head
      val med = if (times.isEmpty) -1.0 else times(times.size / 2)
      (name, mn, med)
    }
    def obj(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = obj(results.map { case (n, mn, _) => n -> mn })
    val med = obj(results.map { case (n, _, md) => n -> md })
    val total = results.map(_._2).sum
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_median":$med,"sf":"$sfDir"}"""
    // Full-detail artifact: the driver snapshots only the LAST 2000 chars
    // of stdout, which amputated the full per-query JSON in rounds 1-4
    // (BENCH_r0N.json "parsed": null). The complete JSON goes to a repo
    // file the driver snapshots via git instead.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (full + "\n").getBytes("UTF-8"))
    // Final stdout line stays under the 2000-char tail window: short qNN
    // keys (the unique prefix of each query name) and 3-decimal values.
    // build.sbt sets `Global / showSuccess := false` so no sbt "[success]"
    // line lands after it inside the captured tail.
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val shortQs = obj(results.map { case (n, mn, _) => n.takeWhile(_ != '_') -> r3(mn) })
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$shortQs,"sf":"$sfDir","full":"$outPath"}""")
    spark.stop()
  }
}
