package graft.ops

import graft.SparkSpec

class SequencePackingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c"),                  // 3 tokens, start 0
    (2L, "d e f g h"),              // 5 tokens, start 3
    (3L, "i j"),                    // 2 tokens, start 8  -> spans the w=4 boundary? no: 8..9
    (4L, "k l m n o p"),            // 6 tokens, start 10 -> spans windows 2..3 (w=4)
    (5L, "q"),                      // 1 token, start 16
  ).toDF("doc_id", "text")

  test("offsets are the exact prefix sums; window math is integral") {
    val got = SequencePacking.packSequences(docs, "doc_id", "text", 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, 3L, 0L, 0L, 0L, 1L),
      (2L, 5L, 3L, 0L, 3L, 2L),   // tokens 3..7 span windows 0 and 1
      (3L, 2L, 8L, 2L, 0L, 1L),   // tokens 8..9 inside window 2
      (4L, 6L, 10L, 2L, 2L, 2L),  // tokens 10..15 span windows 2 and 3
      (5L, 1L, 16L, 4L, 0L, 1L),
    ))
  }

  test("result is invariant to the partition count of the prefix sum") {
    val big = (1L to 400L).map(i => (i, ("tok " * (i % 7 + 1).toInt).trim)).toDF("doc_id", "text")
    def run(par: Int, bucketWidth: Int) = {
      val df = big.repartition(par)
      SequencePacking.packSequences(df, "doc_id", "text", 16, bucketWidth)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    }
    // invariant to BOTH physical partitioning and the bucket width
    assert(run(1, 32) == run(13, 32))
    assert(run(13, 32) == run(13, 4096))
    // contiguity: each start is the previous start + previous length
    val rows = SequencePacking.packSequences(big, "doc_id", "text", 16, 32)
      .orderBy("doc_id").collect().map(r => (r.getLong(1), r.getLong(2)))
    rows.sliding(2).foreach { case Array((n0, s0), (_, s1)) => assert(s1 == s0 + n0) }
  }
}
