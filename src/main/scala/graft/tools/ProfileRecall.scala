package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession

/** Scratch: raw per-probe ANN recalls at each scale factor — the
  * measurement behind the q112 contract bounds (the judged booleans
  * must hold with margin at every sf the driver or bench touches).
  */
object ProfileRecall {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- dirs) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val raw = Similarity.recallFromBucketer(emb, "vec_id", "embedding",
          probeEvery = 50, probeOffset = 7, k = 10, numCentroids = 8, nprobe = 4,
          Similarity.multiTableBucketer(numTables = 4, numPlanes = 4),
          mpFlipBits = 4)
        .collect()
      val lsh = raw.map(_.getLong(1) / 10.0).sorted
      val ivf = raw.map(_.getLong(2) / 10.0).sorted
      val mp = raw.map(_.getLong(3) / 10.0).sorted
      def stats(xs: Array[Double]) =
        f"min=${xs.head}%.2f p10=${xs(xs.length / 10)}%.2f mean=${xs.sum / xs.length}%.2f"
      println(s"$dir probes=${raw.length}  LSH(4x4) ${stats(lsh)}  " +
        s"IVF(4/8) ${stats(ivf)}  MP(4x4+flip1) ${stats(mp)}")
    }
    spark.stop()
  }
}
