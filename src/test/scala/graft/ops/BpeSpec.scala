package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Bpe]]'s contracts: hand-computed merge sequence on a toy corpus,
  * the greedy left-to-right non-overlap rule (runs only matter for
  * left == right), the char-split convention, tie-breaks, and the
  * word-table scale shape (training never touches the corpus again).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("split('') yields exactly the characters — the symbol alphabet convention") {
    val out = Seq("abc").toDF("w").select(split(col("w"), "")).head().getSeq[String](0)
    assert(out == Seq("a", "b", "c"))
  }

  test("toy corpus: merge sequence and final symbols match the hand computation") {
    // words: aaaa x1, abab x1, aab x2
    // round 1 pair counts: (a,a)=3+2=5, (a,b)=2+2=4, (b,a)=1 -> merge (a,a) 5
    // round 2: (aa,aa)=1, (a,b)=2, (b,a)=1, (aa,b)=2 -> tie (a,b)/(aa,b) at 2,
    //          lhs asc picks (a,b)
    // round 3: (aa,aa)=1, (ab,ab)=1, (aa,b)=2 -> merge (aa,b) 2
    val words = Seq(("aaaa", 1L), ("abab", 1L), ("aab", 2L)).toDF("word", "freq")
    val (merges, fin) = Bpe.train(words, numMerges = 3)
    assert(merges == Seq(
      Bpe.Merge(1, "a", "a", 5L),
      Bpe.Merge(2, "a", "b", 2L),
      Bpe.Merge(3, "aa", "b", 2L)))
    val syms = fin.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(syms == Map(
      "aaaa" -> List("aa", "aa"),
      "aab" -> List("aab"),
      "abab" -> List("ab", "ab")))
  }

  test("greedy non-overlap: odd runs of a self-pair leave the trailing symbol") {
    // "aaaaa" under (a,a): greedy -> aa, aa, a (never aa, a, aa)
    val words = Seq(("aaaaa", 1L)).toDF("word", "freq")
    val applied = Bpe.applyMerge(
      words.select(col("word"), col("freq"), split(col("word"), "").as("syms")),
      "a", "a")
    assert(applied.head().getSeq[String](2).toList == List("aa", "aa", "a"))
  }

  test("no same-round chaining: a symbol formed this round never re-matches") {
    // "aab" under (a,b): only position 2 matches -> a, ab; the new "ab"
    // must not then participate in this same round
    val words = Seq(("aab", 1L)).toDF("word", "freq")
    val applied = Bpe.applyMerge(
      words.select(col("word"), col("freq"), split(col("word"), "").as("syms")),
      "a", "b")
    assert(applied.head().getSeq[String](2).toList == List("a", "ab"))
  }

  test("docTokenCounts: exact counts under the trained tokenization") {
    val docs = Seq((1L, "aaaa abab"), (2L, "aab aab aaaa")).toDF("doc_id", "text")
    val (_, fin) = Bpe.train(Bpe.wordTable(docs, "doc_id", "text"), 3)
    val m = Bpe.docTokenCounts(docs, "doc_id", "text", fin)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // freqs here: aaaa=2, abab=1, aab=2 -> merges (a,a)8, (a,b)2 (lhs
    // tie-break), (aa,aa)2 (rhs tie-break) -> aaaa=[aaaa] 1 token,
    // abab=[ab,ab] 2, aab=[aa,b] 2
    // doc 1: aaaa(1) + abab(2) = 3 tokens / 2 words
    // doc 2: aab(2) + aab(2) + aaaa(1) = 5 tokens / 3 words
    assert(m == Map(1L -> ((3L, 2L)), 2L -> ((5L, 3L))), s"got $m")
  }

  test("docTokenCounts: OOV words fall back to character counts, never dropped") {
    // train on docs 1-2 only; doc 3 carries one trained word and one
    // word training never saw — the pre-r16 inner join dropped "zzq"
    // from BOTH counts
    val train = Seq((1L, "aaaa abab"), (2L, "aab aab aaaa")).toDF("doc_id", "text")
    val held = Seq((3L, "aaaa zzq")).toDF("doc_id", "text")
    val (_, fin) = Bpe.train(Bpe.wordTable(train, "doc_id", "text"), 3)
    val m = Bpe.docTokenCounts(held, "doc_id", "text", fin)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // aaaa -> 1 trained token; zzq -> OOV, char fallback 3 symbols
    assert(m == Map(3L -> ((4L, 2L))), s"got $m")
  }

  test("encode: train-corpus words re-encode to the trained symbolization verbatim") {
    val docs = Seq((1L, "aaaa abab"), (2L, "aab aab aaaa")).toDF("doc_id", "text")
    val words = Bpe.wordTable(docs, "doc_id", "text")
    val (merges, fin) = Bpe.train(words, 3)
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getSeq[String](2).toList)).toMap
    assert(toMap(Bpe.encode(words, merges)) == toMap(fin))
  }

  test("encode: stored merges apply to UNSEEN words in rank order") {
    // merges learned from the BpeSpec toy corpus: (a,a), (a,b), (aa,b)
    val merges = Seq(Bpe.Merge(1, "a", "a", 5L), Bpe.Merge(2, "a", "b", 2L),
      Bpe.Merge(3, "aa", "b", 2L))
    // "aabab": rank1 -> [aa,b,a,b]; rank2 -> a,b at tail merges -> [aa,b,ab];
    // rank3 -> aa+b merges -> [aab, ab]. "ba": no merge applies -> [b,a]
    val unseen = Seq(("aabab", 1L), ("ba", 1L)).toDF("word", "freq")
    val enc = Bpe.encode(unseen, merges).collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(enc == Map("aabab" -> List("aab", "ab"), "ba" -> List("b", "a")),
      s"got $enc")
  }

  test("docTokenCountsEncoded: held-out docs under the stored merge table") {
    val train = Seq((1L, "aaaa abab"), (2L, "aab aab aaaa")).toDF("doc_id", "text")
    val held = Seq((3L, "aabab ba aaaa")).toDF("doc_id", "text")
    val (merges, _) = Bpe.train(Bpe.wordTable(train, "doc_id", "text"), 3)
    val out = Bpe.docTokenCountsEncoded(held, "doc_id", "text",
        Bpe.mergeTable(spark, merges))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // merges on this corpus: (a,a)8, (a,b)2, (aa,aa)2 — aabab encodes
    // rank1 [aa,b,a,b] rank2 [aa,b,ab] (rank3 aa+aa never adjacent) = 3
    // tokens; ba = 2; aaaa = rank1 [aa,aa] rank3 [aaaa] = 1 -> 6 / 3
    assert(out == Map(3L -> ((6L, 3L))), s"got $out")
  }

  test("training reads the word table only — |vocab| rows per round, corpus untouched") {
    // shape pin: wordTable aggregates the corpus once; train's per-round
    // relations derive from the checkpointed word relation (scan count
    // in any round's plan shows no documents read)
    val docs = Seq((1L, "x y x"), (2L, "y z")).toDF("doc_id", "text")
    val words = Bpe.wordTable(docs, "doc_id", "text")
    assert(words.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("x" -> 2L, "y" -> 2L, "z" -> 1L))
  }
}
