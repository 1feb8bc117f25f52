package graft.queries

import graft.SparkSpec

/** q117's streaming incremental-dedup loop against an INDEPENDENT
  * driver-side reference: plain-Scala 3-gram shingle sets and exact
  * Jaccard, replayed sequentially over the same doc_id-mod-4 batches
  * (batch k deduped against the survivors of batches < k; within-batch
  * duplicates both survive and both fold in). The corpus is synthetic
  * and adversarial: cross-batch exact dups, a dup OF A DROPPED doc
  * (must still drop — its original survived), a within-batch dup pair
  * (both must survive), and a partial-overlap pair right at the 0.5
  * threshold boundary.
  */
class StreamingIncrDedupSpec extends SparkSpec {

  private val docs: Seq[(Long, String)] = Seq(
    // batch 0 (ids ≡ 0 mod 4): all kept — the index starts empty
    0L  -> "alpha beta gamma delta epsilon",
    4L  -> "zeta eta theta iota kappa",
    8L  -> "one two three four five six",
    // batch 1: 1 dups doc 0 (drop); 5 and 9 dup EACH OTHER in-batch
    // (both kept — the loop only checks against the index)
    1L  -> "alpha beta gamma delta epsilon",
    5L  -> "lambda mu nu xi omicron",
    9L  -> "lambda mu nu xi omicron",
    // batch 2: 2 dups the DROPPED doc 1 (still dropped — doc 0 is in
    // the index); 6 dups the batch-1 survivors 5/9; 10 is fresh
    2L  -> "alpha beta gamma delta epsilon",
    6L  -> "lambda mu nu xi omicron",
    10L -> "pi rho sigma tau upsilon",
    // batch 3: 3 dups 10; 7 is fresh; 11 overlaps doc 8 at jaccard
    // 3/5 = 0.6 ≥ 0.5 (threshold boundary exercised, not just 1.0)
    3L  -> "pi rho sigma tau upsilon",
    7L  -> "phi chi psi omega aleph",
    11L -> "one two three four five seven",
  )

  private def shingles(text: String): Set[String] = {
    val w = text.toLowerCase.split(" ").filter(_.nonEmpty)
    if (w.length < 3) Set.empty
    else w.sliding(3).map(_.mkString(" ")).toSet
  }

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty || b.isEmpty) 0.0
    else (a & b).size.toDouble / (a | b).size.toDouble

  /** The sequential reference: each batch is decided in full against the
    * PRIOR batches' survivors (fold-in is per batch, so a within-batch
    * dup pair both survive), then its keepers fold in.
    */
  private def referenceKept: Map[Long, Boolean] = {
    val byBatch = docs.groupBy(_._1 % 4)
    var survivors = List.empty[(Long, Set[String])]
    var kept = Map.empty[Long, Boolean]
    for (k <- 0L to 3L) {
      val decided = byBatch(k).sortBy(_._1).map { case (id, text) =>
        val sh = shingles(text)
        (id, sh, !survivors.exists { case (_, s) => jaccard(sh, s) >= 0.5 })
      }
      kept ++= decided.map(d => d._1 -> d._3)
      survivors ++= decided.collect { case (id, sh, true) => (id, sh) }
    }
    kept
  }

  test("q117 loop == sequential driver reference on an adversarial corpus") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_incr_dedup_spec_").toFile
    try {
      import spark.implicits._
      docs.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$root/documents.parquet")
      val got = graft.SparkEntry.queries("q117_stream_incr_dedup")(
          spark, root.toString)
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      val want = referenceKept
      assert(got == want, s"got $got\nwant $want")
      // the hand-reasoned cases, pinned explicitly
      assert(got(0L) && got(4L) && got(8L), "batch 0 must be kept wholesale")
      assert(!got(1L), "cross-batch exact dup must drop")
      assert(got(5L) && got(9L), "within-batch dup pair must BOTH survive")
      assert(!got(2L), "dup of a DROPPED doc must still drop (original is indexed)")
      assert(!got(6L), "dup of a within-batch-surviving pair must drop")
      assert(!got(11L), "0.6-jaccard partial overlap must drop at threshold 0.5")
      assert(got(7L) && got(10L), "fresh docs must survive")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete(); ()
      }
      rm(root)
    }
  }
}
