package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimhashNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (4L, "completely different content about databases and spark engines"),
    (5L, "unrelated text mentioning weather forecasts and temperatures"),
  ).toDF("doc_id", "text")

  test("banding finds every pair the naive quadratic scan finds") {
    val sig = Dedup.simhashTable(docs, "doc_id", "text", 16)
    val a = sig.toDF("id_a", "sig_a")
    val b = sig.toDF("id_b", "sig_b")
    val naive = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("hamming", Dedup.hammingDistance(col("sig_a"), col("sig_b")).cast("long"))
      .filter(col("hamming") <= 3)
      .select("id_a", "id_b", "hamming")
      .collect().map(_.toSeq).toSet
    val banded = Dedup.simhashNearDup(docs, "doc_id", "text", bits = 16, bands = 4, maxHamming = 3)
      .collect().map(_.toSeq).toSet
    assert(banded == naive)
    // the exact duplicate pair must be present at hamming 0
    assert(naive.exists(r => r(0) == 1L && r(1) == 3L && r(2) == 0L))
  }

  test("pigeonhole precondition is enforced") {
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDup(docs, "doc_id", "text", bits = 16, bands = 4, maxHamming = 4)
    }
  }
}
