package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Scratch (optimization round): run one declared query N times and
  * print every Spark job's wall time attributed to its call site —
  * the intra-query phase breakdown the optimization guide's §1 wants
  * before any change. Local measurement aid only; not part of the
  * driver contract.
  *
  * Usage: run_graft.sh graft.tools.ProfileQueryJobs <queryName> [reps]
  */
object ProfileQueryJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class Rec(var n: Int, var ms: Long)
    val bySite = mutable.LinkedHashMap.empty[String, Rec]
    val starts = mutable.Map.empty[Int, (String, Long)]
    var record = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val props = Option(js.properties)
        val site = props
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(props.flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        starts(js.jobId) = (site, System.nanoTime())
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (site, t0) =>
          if (record) {
            val r = bySite.getOrElseUpdate(site, Rec(0, 0L))
            r.n += 1
            r.ms += (System.nanoTime() - t0) / 1000000L
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val fn = SparkEntry.queries(name)

    // warm-up (codegen/JIT), unrecorded
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    for (i <- 1 to reps) {
      bySite.clear(); record = true
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      record = false
      spark.catalog.clearCache()
      // listener events drain asynchronously; settle before printing
      Thread.sleep(300)
      println(f"== $name run $i: $total%.2f s total")
      val rows = bySite.toSeq.sortBy(-_._2.ms)
      val jobSum = rows.map(_._2.ms).sum / 1000.0
      println(f"   job-covered: $jobSum%.2f s over ${rows.map(_._2.n).sum} jobs")
      rows.foreach { case (site, r) =>
        println(f"   ${r.ms / 1000.0}%7.2f s  ${r.n}%3d jobs  $site")
      }
    }
    spark.stop()
  }
}
