package graft.tools

import org.apache.spark.sql.SparkSession

/** Leak-vs-plateau probe for a judged query's checkpoint-block
  * retention: run N times, GC-drain after each, print the surviving
  * persistent-RDD count. True accumulation grows linearly with runs;
  * Spark's transient retention (recent executions' plans reachable from
  * broadcast-exchange pool threads) plateaus at a small multiple of one
  * run's worth.
  */
object ProfileRetention {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("q114_curation_pipeline")
    val n = args.lift(1).map(_.toInt).getOrElse(6)
    val dir = args.lift(2).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    for (i <- 1 to n) {
      graft.SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      var leaked = Set.empty[Int]
      var stable = 0
      val deadline = System.currentTimeMillis() + 20000
      // still-shrinking sets reset the counter; an EMPTY survivor set is
      // terminal (nothing left to drain), so exit instead of burning the
      // full 20 s deadline on every clean run
      while (stable < 8 && System.currentTimeMillis() < deadline) {
        System.gc(); Thread.sleep(250)
        val next = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
        stable = if (next.isEmpty) 8
                 else if (next.size < leaked.size) 0
                 else stable + 1
        leaked = next
      }
      println(s"after run $i: ${leaked.size} surviving persistent RDDs")
    }
    spark.stop()
  }
}
