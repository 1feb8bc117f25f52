package graft.tools

import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler: relational (explode-first) vs Column/higher-order
  * forms of simhash and text-quality, run to steady state in one JVM so
  * the comparison is JIT-fair. Prints min/median over the last `reps-2`
  * runs of each form.
  */
object ProfileForms {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "6").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def steady(label: String)(f: => Unit): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val tail = times.drop(2).sorted
      println(f"$label%-34s min=${tail.head}%.2f med=${tail(tail.size / 2)}%.2f  all=${times.map(t => f"$t%.2f").mkString(",")}")
    }

    steady("simhash relation form") {
      Dedup.simhashTable(docs, "doc_id", "text", 16)
        .write.format("noop").mode("overwrite").save()
    }
    steady("simhash Column/HOF form") {
      docs.select(col("doc_id"),
          Dedup.simhash(TextAnalysis.tokens(col("text")), 16).as("simhash"))
        .write.format("noop").mode("overwrite").save()
    }
    steady("quality relation form") {
      graft.SparkEntry.queries("q23_text_quality")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    steady("quality Column/HOF form") {
      val stop = TextAnalysis.defaultStopwords
      docs.select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens"),
          (regexp_count(col("text"), lit("[.,;:!?]")).cast("double") /
            length(col("text")).cast("double")).as("punct_ratio"),
          TextAnalysis.avgTokenLen(col("text")).as("avg_token_len"),
          (TextAnalysis.stopwordCount(TextAnalysis.tokens(col("text")), stop).cast("double") /
            TextAnalysis.tokenCount(col("text")).cast("double")).as("stop_ratio"),
          TextAnalysis.qualityScore(col("text"), stop).as("quality"))
        .orderBy("doc_id")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
