package graft.tools

import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the MinHash near-dup pipeline stages. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // match Bench's split sizing — without it a single-file table
      // scans in ~1 partition and every stage serializes, so timings
      // are not comparable to the sweep's
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    time("tokenize+count") {
      docs.select(explode(TextAnalysis.tokens(col("text")))).count()
    }
    for (i <- 1 to 4) {
      time(s"shingleTable(window) r$i") {
        Dedup.shingleTable(docs, "doc_id", "text", 3).count()
      }
      time(s"shingleTable(HOF) r$i") {
        docs.select(col("doc_id"),
          explode(Dedup.shingles(TextAnalysis.tokens(col("text")), 3)).as("sh")).count()
      }
    }
    val sh = Dedup.shingleTable(docs, "doc_id", "text", 3)
    time("shingleTable.count") { sh.count() }
    val shC = sh.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("persist materialize") { shC.count() }
    val sig = Dedup.minhashSignatures(shC, "doc_id", 8)
    time("signatures") { sig.write.format("noop").mode("overwrite").save() }
    val cand = Dedup.lshCandidatePairs(sig, "doc_id", 4, 2)
    time("candidates") { println("pairs=" + cand.count()) }
    time("full nearDuplicates") {
      Dedup.nearDuplicates(docs, "doc_id", "text", 0.5)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
