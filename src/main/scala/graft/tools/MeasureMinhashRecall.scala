package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Diagnostic: measured verified-pair recall of the banded MinHash
  * detector against the exact Jaccard truth (the numbers behind
  * q176's floors), per scale factor and (numHashes, bands) config.
  * Run: `sbt "runMain graft.tools.MeasureMinhashRecall"`.
  */
object MeasureMinhashRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val sh = Dedup.shingleTable(docs, "doc_id", "text", 3)
        .persist()
      val truth = Dedup.jaccardFromShingles(sh, "doc_id", 0.5, 0)
        .select(col("id_a"), col("id_b")).persist()
      val nTrue = truth.count()
      for ((nh, b) <- Seq((8, 4), (16, 8))) {
        val cand = Dedup.lshCandidatePairs(
          Dedup.minhashSignatures(sh, "doc_id", nh), "doc_id", b, nh / b)
        val nHit = truth.join(cand, Seq("id_a", "id_b")).count()
        println(f"$sf n_true=$nTrue ${nh}x$b n_hit=$nHit " +
          f"recall=${if (nTrue == 0) 1.0 else nHit.toDouble / nTrue}%.4f")
      }
      truth.unpersist(); sh.unpersist()
    }
    spark.stop()
  }
}
