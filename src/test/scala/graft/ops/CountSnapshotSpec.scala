package graft.ops

import graft.SparkSpec

/** Snapshot-pinned serving for the count-delta LSM ([[CountLsm
  * .writeSnapshot]] / [[CountLsm.deltasAtSnapshot]] + the retirement
  * half of [[CountLsm.compactSwap]]), exercised through the bigram-LM
  * store: pinned decisions replay bit-exactly across ingest,
  * unlearning and compaction; vacuum retains what snapshots pin and
  * reclaims the rest; a vacuumed-away snapshot fails loudly.
  */
class CountSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
    f.delete(); ()
  }

  private def freshPath(tag: String): String = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_snap_$tag"
    rm(new java.io.File(p)); p
  }

  private val docs = Seq(
    (1L, "a b a b c"), (2L, "a a d b"), (3L, "c c a b"),
    (4L, "b d d a"), (5L, "e f e f"), (6L, "a e b f")
  ).toDF("doc_id", "text")

  test("snapshot serve == pre-snapshot serve, across later ingest and a compaction that retires the pinned batches") {
    val path = freshPath("basic")
    try {
      LanguageModel.writeCountBatch(docs.filter($"doc_id" <= 2),
        "doc_id", "text", path, "b0")
      LanguageModel.writeCountBatch(
        docs.filter($"doc_id" > 2 && $"doc_id" <= 4),
        "doc_id", "text", path, "b1")
      val before = LanguageModel.scoreFromCounts(spark, path, docs,
        "doc_id", "text").orderBy("doc_id").collect().toSeq
      LanguageModel.snapshotCountModel(spark, path, "s1")
      LanguageModel.writeCountBatch(docs.filter($"doc_id" > 4),
        "doc_id", "text", path, "b2")
      LanguageModel.compactCountModel(spark, path)
      // the pinned batches now live ONLY as retired partitions
      assert(new java.io.File(s"$path/retired/cb/bid=b0").isDirectory)
      assert(new java.io.File(s"$path/retired/tc/bid=b1").isDirectory)
      val snap = LanguageModel.scoreAtSnapshot(spark, path, "s1", docs,
        "doc_id", "text").orderBy("doc_id").collect().toSeq
      assert(snap == before)
      // and the live serve is the full-corpus model, untouched
      val live = LanguageModel.scoreFromCounts(spark, path, docs,
        "doc_id", "text").orderBy("doc_id").collect().toSeq
      assert(live == LanguageModel.bigramNll(docs, "doc_id", "text")
        .orderBy("doc_id").collect().toSeq)
    } finally rm(new java.io.File(path))
  }

  test("a snapshot taken after an unlearn replays the unlearn (negated batch in the manifest)") {
    val path = freshPath("unlearn")
    val keep = docs.filter($"doc_id" <= 4)
    val td = docs.filter($"doc_id" > 4)
    try {
      LanguageModel.writeCountBatch(keep, "doc_id", "text", path, "keep")
      LanguageModel.writeCountBatch(td, "doc_id", "text", path, "td")
      LanguageModel.deleteCountBatch(td, "doc_id", "text", path, "del-td")
      LanguageModel.snapshotCountModel(spark, path, "s1")
      LanguageModel.writeCountBatch(td, "doc_id", "text", path, "re-add")
      LanguageModel.compactCountModel(spark, path)
      val snap = LanguageModel.scoreAtSnapshot(spark, path, "s1", keep,
        "doc_id", "text").orderBy("doc_id").collect().toSeq
      assert(snap == LanguageModel.bigramNll(keep, "doc_id", "text")
        .orderBy("doc_id").collect().toSeq)
    } finally rm(new java.io.File(path))
  }

  test("two compactions accumulate retirements; every live snapshot replays its own generation") {
    val path = freshPath("two_gen")
    try {
      LanguageModel.writeCountBatch(docs.filter($"doc_id" <= 2),
        "doc_id", "text", path, "b0")
      LanguageModel.writeCountBatch(
        docs.filter($"doc_id" > 2 && $"doc_id" <= 4),
        "doc_id", "text", path, "b1")
      val gen1 = LanguageModel.scoreFromCounts(spark, path, docs,
        "doc_id", "text").orderBy("doc_id").collect().toSeq
      LanguageModel.snapshotCountModel(spark, path, "s1")
      LanguageModel.compactCountModel(spark, path)
      LanguageModel.writeCountBatch(docs.filter($"doc_id" > 4),
        "doc_id", "text", path, "b2")
      LanguageModel.snapshotCountModel(spark, path, "s2")
      LanguageModel.compactCountModel(spark, path)
      assert(CountLsm.liveSnapshotIds(spark, path) == Seq("s1", "s2"))
      assert(LanguageModel.scoreAtSnapshot(spark, path, "s1", docs,
        "doc_id", "text").orderBy("doc_id").collect().toSeq == gen1)
      assert(LanguageModel.scoreAtSnapshot(spark, path, "s2", docs,
        "doc_id", "text").orderBy("doc_id").collect().toSeq ==
        LanguageModel.bigramNll(docs, "doc_id", "text")
          .orderBy("doc_id").collect().toSeq)
    } finally rm(new java.io.File(path))
  }

  test("vacuum retains pinned deltas; after dropSnapshot it reclaims them and the snapshot serve fails loudly") {
    val path = freshPath("vacuum")
    try {
      LanguageModel.writeCountBatch(docs.filter($"doc_id" <= 3),
        "doc_id", "text", path, "b0")
      LanguageModel.snapshotCountModel(spark, path, "s1")
      LanguageModel.writeCountBatch(docs.filter($"doc_id" > 3),
        "doc_id", "text", path, "b1")
      LanguageModel.compactCountModel(spark, path)
      CountLsm.vacuumRetired(spark, path)
      // s1 pins b0 — still served after the vacuum
      assert(new java.io.File(s"$path/retired/cb/bid=b0").isDirectory)
      // b1 is pinned by nothing — reclaimed
      assert(!new java.io.File(s"$path/retired/cb/bid=b1").exists)
      LanguageModel.scoreAtSnapshot(spark, path, "s1", docs,
        "doc_id", "text").collect()
      // out-of-band loss of a pinned delta (NOT vacuum — vacuum never
      // reclaims pinned bids): the serve must fail loudly, not sum a
      // partial model
      val stash = new java.io.File(s"$path/stash_cb_b0")
      assert(new java.io.File(s"$path/retired/cb/bid=b0").renameTo(stash))
      val partial = intercept[IllegalArgumentException] {
        LanguageModel.scoreAtSnapshot(spark, path, "s1", docs,
          "doc_id", "text").collect()
      }
      assert(partial.getMessage.contains("vacuumed"))
      assert(stash.renameTo(new java.io.File(s"$path/retired/cb/bid=b0")))
      CountLsm.dropSnapshot(spark, path, "s1")
      CountLsm.vacuumRetired(spark, path)
      assert(!new java.io.File(s"$path/retired/cb/bid=b0").exists)
      val err = intercept[IllegalArgumentException] {
        LanguageModel.scoreAtSnapshot(spark, path, "s1", docs,
          "doc_id", "text").collect()
      }
      assert(err.getMessage.contains("unknown snapshot"))
      // the live serve never depends on retired partitions
      assert(LanguageModel.scoreFromCounts(spark, path, docs,
        "doc_id", "text").orderBy("doc_id").collect().toSeq ==
        LanguageModel.bigramNll(docs, "doc_id", "text")
          .orderBy("doc_id").collect().toSeq)
    } finally rm(new java.io.File(path))
  }

  test("NB store: snapshot classify == model trained on the pinned slice, across ingest + compaction") {
    val path = freshPath("nb")
    val labeled = Seq(
      (1L, "a b a", "x"), (2L, "a b", "x"), (3L, "c c d", "y"),
      (4L, "c d", "y"), (5L, "e e a", "x"), (6L, "c e", "y")
    ).toDF("doc_id", "text", "lang")
    val held = Seq((10L, "a b"), (11L, "c d"), (12L, "e")).toDF("doc_id", "text")
    try {
      NaiveBayes.writeCountBatch(labeled.filter($"doc_id" <= 2),
        "doc_id", "text", "lang", path, "b0")
      NaiveBayes.writeCountBatch(
        labeled.filter($"doc_id" > 2 && $"doc_id" <= 4),
        "doc_id", "text", "lang", path, "b1")
      NaiveBayes.snapshotCountModel(spark, path, "s1")
      NaiveBayes.writeCountBatch(labeled.filter($"doc_id" > 4),
        "doc_id", "text", "lang", path, "b2")
      NaiveBayes.compactCountModel(spark, path)
      val snap = NaiveBayes.classify(held, "doc_id", "text",
          NaiveBayes.readCountModelAt(spark, path, "s1"))
        .orderBy("doc_id").collect().toSeq
      val retrained = NaiveBayes.classify(held, "doc_id", "text",
          NaiveBayes.trainModel(labeled.filter($"doc_id" <= 4),
            "doc_id", "text", "lang"))
        .orderBy("doc_id").collect().toSeq
      assert(snap == retrained)
      // and the live model folds b2 (q178's law, unchanged)
      val live = NaiveBayes.classify(held, "doc_id", "text",
          NaiveBayes.readCountModel(spark, path))
        .orderBy("doc_id").collect().toSeq
      assert(live == NaiveBayes.classify(held, "doc_id", "text",
          NaiveBayes.trainModel(labeled, "doc_id", "text", "lang"))
        .orderBy("doc_id").collect().toSeq)
    } finally rm(new java.io.File(path))
  }

  test("heal: a crash between the compaction swap and the retirement resumes the retirement") {
    val path = freshPath("heal")
    try {
      LanguageModel.writeCountBatch(docs.filter($"doc_id" <= 3),
        "doc_id", "text", path, "b0")
      LanguageModel.snapshotCountModel(spark, path, "s1")
      LanguageModel.writeCountBatch(docs.filter($"doc_id" > 3),
        "doc_id", "text", path, "b1")
      val before = LanguageModel.scoreAtSnapshot(spark, path, "s1", docs,
        "doc_id", "text").orderBy("doc_id").collect().toSeq
      LanguageModel.compactCountModel(spark, path)
      // fake the crash window: a retired partition is still sitting in
      // the renamed-aside old root
      val retired = new java.io.File(s"$path/retired/cb/bid=b0")
      val oldSub = new java.io.File(s"$path/.counts_old/cb")
      assert(oldSub.mkdirs())
      assert(retired.renameTo(new java.io.File(oldSub, "bid=b0")))
      // any store access heals: retirement resumed, old root dropped
      val snap = LanguageModel.scoreAtSnapshot(spark, path, "s1", docs,
        "doc_id", "text").orderBy("doc_id").collect().toSeq
      assert(snap == before)
      assert(retired.isDirectory)
      assert(!new java.io.File(s"$path/.counts_old").exists)
    } finally rm(new java.io.File(path))
  }
}
