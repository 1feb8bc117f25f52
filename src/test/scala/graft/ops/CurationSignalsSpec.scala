package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The shared-signal base must be a pure refactoring of the per-signal
  * scans: shingles derived from the token base are row-identical to
  * [[Dedup.shingleTable]]'s fresh tokenize for every k the pipeline
  * uses, and the token relation matches [[TextAnalysis.tokenTable]].
  */
class CurationSignalsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("shingles(k) == Dedup.shingleTable for k = 3 and k = 5") {
    val sig = CurationSignals.build(docs, "doc_id", "text")
    try {
      for (k <- Seq(3, 5)) {
        val shared = sig.shingles(k)
        val fresh = Dedup.shingleTable(docs, "doc_id", "text", k)
        assert(shared.exceptAll(fresh).isEmpty && fresh.exceptAll(shared).isEmpty,
          s"k=$k shingle drift between shared base and fresh tokenize")
      }
    } finally { sig.base.unpersist(blocking = false); () }
  }

  test("tokens == TextAnalysis.tokenTable (same tokenization contract)") {
    val sig = CurationSignals.build(docs, "doc_id", "text")
    try {
      val shared = sig.tokens.select(col("doc_id"), col("tok"))
      val fresh = TextAnalysis.tokenTable(docs, "doc_id", "text")
        .select(col("doc_id"), col("tok"))
      assert(shared.exceptAll(fresh).isEmpty && fresh.exceptAll(shared).isEmpty)
    } finally { sig.base.unpersist(blocking = false); () }
  }

  test("base carries the exact-dup hash: text_hash == md5(text)") {
    val sig = CurationSignals.build(docs, "doc_id", "text")
    try {
      val joined = sig.base.select(col("doc_id"), col("text_hash"))
        .join(docs.select(col("doc_id"), md5(col("text")).as("h")), "doc_id")
      assert(joined.filter(col("text_hash") =!= col("h")).isEmpty)
    } finally { sig.base.unpersist(blocking = false); () }
  }
}
