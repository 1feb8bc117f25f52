package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  // V = {a,b,c,d} = 4; n_tok(x) = 5, n_tok(y) = 4; priors ln(1/2) each.
  private def trainDocs = Seq(
    (1L, "a a b", "x"),
    (2L, "a b", "x"),
    (3L, "c c", "y"),
    (4L, "c d", "y")
  ).toDF("doc_id", "text", "lang")

  test("classify: hand-computed posteriors pick the right label") {
    val model = NaiveBayes.trainModel(trainDocs, "doc_id", "text", "lang")
    val held = Seq(
      (10L, "a b z"), // x-ish tokens + one OOV
      (11L, "c c"),   // pure y evidence
      (12L, "z")      // OOV only: floors decide — y's (1/8) > x's (1/9)
    ).toDF("doc_id", "text")
    val out = NaiveBayes.classify(held, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2))))
      .toMap
    assert(out(10L)._1 == "x")
    assert(out(11L)._1 == "y")
    assert(out(12L)._1 == "y")
    // ln(1/2) + 2·ln(4/8) with round-9 contributions, round-6 total
    assert(math.abs(out(11L)._2 - (-2.079442)) < 1e-6)
    // OOV-only doc scores at the floor: ln(1/2) + ln(1/8)
    assert(math.abs(out(12L)._2 - (-2.772589)) < 1e-6)
  }

  test("classify: equal posteriors tie-break by label ascending") {
    val tr = Seq((1L, "a", "x"), (2L, "a", "y")).toDF("doc_id", "text", "lang")
    val model = NaiveBayes.trainModel(tr, "doc_id", "text", "lang")
    val out = NaiveBayes.classify(Seq((9L, "a")).toDF("doc_id", "text"),
        "doc_id", "text", model)
      .collect()
    assert(out.length == 1 && out.head.getString(1) == "x")
  }

  test("zero-token held-out docs are excluded; zero-token train docs count toward the prior") {
    val tr = trainDocs.union(Seq((5L, "", "y")).toDF("doc_id", "text", "lang"))
    val model = NaiveBayes.trainModel(tr, "doc_id", "text", "lang")
    // prior shifts: lp(y) = ln(3/5), lp(x) = ln(2/5); likelihoods unchanged
    val pri = model.priors.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(pri("y") - math.log(3.0 / 5.0)) < 1e-8)
    assert(math.abs(pri("x") - math.log(2.0 / 5.0)) < 1e-8)
    val out = NaiveBayes.classify(
      Seq((10L, "a"), (11L, "")).toDF("doc_id", "text"),
      "doc_id", "text", model)
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(10L))
  }

  test("stored model reproduces the in-session posterior exactly") {
    val model = NaiveBayes.trainModel(trainDocs, "doc_id", "text", "lang")
    val held = Seq((10L, "a b z"), (11L, "c c"), (12L, "z"))
      .toDF("doc_id", "text")
    val dir = s"${sys.props("java.io.tmpdir")}/graft_nb_model_spec"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(dir))
    try {
      NaiveBayes.writeModel(model, dir)
      val fresh = NaiveBayes.classify(held, "doc_id", "text", model)
        .orderBy("doc_id").collect().toSeq
      val stored = NaiveBayes.classify(held, "doc_id", "text",
          NaiveBayes.readModel(spark, dir))
        .orderBy("doc_id").collect().toSeq
      assert(fresh == stored)
    } finally rm(new java.io.File(dir))
  }

  test("pluggable features: a char-bigram model classifies what the word model cannot") {
    val tr = Seq((1L, "abab", "x"), (2L, "cdcd", "y")).toDF("doc_id", "text", "lang")
    val held = Seq((9L, "cd")).toDF("doc_id", "text")
    val bigrams = (c: org.apache.spark.sql.Column) => TextAnalysis.charBigrams(c)
    val charPred = NaiveBayes.classify(held, "doc_id", "text",
        NaiveBayes.trainModel(tr, "doc_id", "text", "lang", bigrams), bigrams)
      .head().getString(1)
    assert(charPred == "y") // "cd" is a trained bigram of label y
    // the word model never saw "cd" as a token: symmetric floors, and
    // the label-asc tie-break picks x — the extractor IS the model
    val wordPred = NaiveBayes.classify(held, "doc_id", "text",
        NaiveBayes.trainModel(tr, "doc_id", "text", "lang"))
      .head().getString(1)
    assert(wordPred == "x")
  }

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rmTree))
    f.delete(): Unit
  }

  test("count store: batch decomposition + compaction + retry == one-shot model") {
    val held = Seq((10L, "a b z"), (11L, "c c"), (12L, "z")).toDF("doc_id", "text")
    val oneShot = NaiveBayes.classify(held, "doc_id", "text",
        NaiveBayes.trainModel(trainDocs, "doc_id", "text", "lang"))
      .orderBy("doc_id").collect().toSeq
    val dir = s"${sys.props("java.io.tmpdir")}/graft_nb_counts_spec"
    rmTree(new java.io.File(dir))
    try {
      NaiveBayes.writeCountBatch(trainDocs.filter($"doc_id" <= 2),
        "doc_id", "text", "lang", dir, "b0")
      NaiveBayes.compactCountModel(spark, dir)
      NaiveBayes.writeCountBatch(trainDocs.filter($"doc_id" > 2),
        "doc_id", "text", "lang", dir, "b1")
      // idempotent retry: same bid, partition overwritten not doubled
      NaiveBayes.writeCountBatch(trainDocs.filter($"doc_id" > 2),
        "doc_id", "text", "lang", dir, "b1")
      val incremental = NaiveBayes.classify(held, "doc_id", "text",
          NaiveBayes.readCountModel(spark, dir))
        .orderBy("doc_id").collect().toSeq
      assert(incremental == oneShot)
    } finally rmTree(new java.io.File(dir))
  }

  test("count store: ALL-DIGIT batch ids survive partition-type inference (bid read as string)") {
    // a store whose every bid is numeric ("2024", "2025") makes Spark
    // infer the bid partition column as int; the typed readDeltas pins
    // it back to string so ledger comparisons and the compaction
    // collect keep working — same model as the lettered decomposition
    val held = Seq((10L, "a b z"), (11L, "c c")).toDF("doc_id", "text")
    val oneShot = NaiveBayes.classify(held, "doc_id", "text",
        NaiveBayes.trainModel(trainDocs, "doc_id", "text", "lang"))
      .orderBy("doc_id").collect().toSeq
    val dir = s"${sys.props("java.io.tmpdir")}/graft_nb_counts_digit"
    rmTree(new java.io.File(dir))
    try {
      NaiveBayes.writeCountBatch(trainDocs.filter($"doc_id" <= 2),
        "doc_id", "text", "lang", dir, "2024")
      NaiveBayes.writeCountBatch(trainDocs.filter($"doc_id" > 2),
        "doc_id", "text", "lang", dir, "2025")
      assert(NaiveBayes.classify(held, "doc_id", "text",
          NaiveBayes.readCountModel(spark, dir))
        .orderBy("doc_id").collect().toSeq == oneShot)
      NaiveBayes.compactCountModel(spark, dir)
      // the ledger holds the digit bids; a folded retry stays a no-op
      NaiveBayes.writeCountBatch(trainDocs.filter($"doc_id" <= 2),
        "doc_id", "text", "lang", dir, "2024")
      assert(NaiveBayes.classify(held, "doc_id", "text",
          NaiveBayes.readCountModel(spark, dir))
        .orderBy("doc_id").collect().toSeq == oneShot)
    } finally rmTree(new java.io.File(dir))
  }

  test("unlearn: negative deltas == a model that never saw the batch, vocab shrinkage included") {
    val held = Seq((10L, "a b z"), (11L, "c c"), (12L, "d d")).toDF("doc_id", "text")
    val dir = s"${sys.props("java.io.tmpdir")}/graft_nb_unlearn_spec"
    rmTree(new java.io.File(dir))
    try {
      // ingest all four docs, then unlearn doc 4 ("c d" under y) —
      // token d exists ONLY in doc 4, so V must shrink from 4 to 3
      NaiveBayes.writeCountBatch(trainDocs.filter($"doc_id" <= 3),
        "doc_id", "text", "lang", dir, "b0")
      NaiveBayes.writeCountBatch(trainDocs.filter($"doc_id" === 4),
        "doc_id", "text", "lang", dir, "b1")
      NaiveBayes.deleteCountBatch(trainDocs.filter($"doc_id" === 4),
        "doc_id", "text", "lang", dir, "del-b1")
      val unlearned = NaiveBayes.classify(held, "doc_id", "text",
          NaiveBayes.readCountModel(spark, dir))
        .orderBy("doc_id").collect().toSeq
      val retrained = NaiveBayes.classify(held, "doc_id", "text",
          NaiveBayes.trainModel(trainDocs.filter($"doc_id" <= 3),
            "doc_id", "text", "lang"))
        .orderBy("doc_id").collect().toSeq
      assert(unlearned == retrained)
      // the zeroed token is OUT of the vocabulary, not a floor row
      assert(NaiveBayes.readCountModel(spark, dir)
        .lik.filter($"tok" === "d").count() == 0)
      // unlearning EVERY doc of a label removes the label entirely
      NaiveBayes.deleteCountBatch(trainDocs.filter($"doc_id" === 3),
        "doc_id", "text", "lang", dir, "del-b0-3")
      val m = NaiveBayes.readCountModel(spark, dir)
      assert(m.priors.collect().map(_.getString(0)).toSeq == Seq("x"))
    } finally rmTree(new java.io.File(dir))
  }

  test("count store: a torn batch (tok landed, lab did not) is invisible until retried") {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_nb_counts_torn"
    rmTree(new java.io.File(dir))
    try {
      NaiveBayes.writeCountBatch(trainDocs, "doc_id", "text", "lang", dir, "b0")
      NaiveBayes.writeCountBatch(
        Seq((99L, "q q q", "x")).toDF("doc_id", "text", "lang"),
        "doc_id", "text", "lang", dir, "torn")
      // simulate the crash window: lab/ partition (the commit marker,
      // written LAST) vanishes, tok/ deltas survive
      rmTree(new java.io.File(s"$dir/counts/lab/bid=torn"))
      val m = NaiveBayes.readCountModel(spark, dir)
      assert(m.lik.filter($"tok" === "q").count() == 0)
      // retry commits it
      NaiveBayes.writeCountBatch(
        Seq((99L, "q q q", "x")).toDF("doc_id", "text", "lang"),
        "doc_id", "text", "lang", dir, "torn")
      assert(NaiveBayes.readCountModel(spark, dir)
        .lik.filter($"tok" === "q").count() == 1)
    } finally rmTree(new java.io.File(dir))
  }

  test("a label whose EVERY training doc is token-free keeps its prior") {
    // label "z" has one doc, all empty: it must not exit the model —
    // its prior is ln(1/5), its likelihood mass is all floor ln(1/V)
    val tr = trainDocs.union(Seq((5L, "", "z")).toDF("doc_id", "text", "lang"))
    val model = NaiveBayes.trainModel(tr, "doc_id", "text", "lang")
    val pri = model.priors.collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(pri.keySet == Set("x", "y", "z"))
    assert(math.abs(pri("z")._1 - math.log(1.0 / 5.0)) < 1e-8)
    // n_tok(z) = 0, V = 4: floor = ln(1/(0+4))
    assert(math.abs(pri("z")._2 - math.log(1.0 / 4.0)) < 1e-8)
    // and the shifted denominators move the OTHER priors too
    assert(math.abs(pri("x")._1 - math.log(2.0 / 5.0)) < 1e-8)
  }

  test("count store: a retry of an already-COMPACTED batch is a no-op, not a double count") {
    val held = Seq((10L, "a b z"), (11L, "c c")).toDF("doc_id", "text")
    val dir = s"${sys.props("java.io.tmpdir")}/graft_nb_counts_folded"
    rmTree(new java.io.File(dir))
    try {
      val b0 = trainDocs.filter($"doc_id" <= 2)
      NaiveBayes.writeCountBatch(b0, "doc_id", "text", "lang", dir, "b0")
      NaiveBayes.compactCountModel(spark, dir)
      // the q184 window: a streaming restart replays b0 AFTER the
      // compaction folded it — must not land a fresh bid=b0 partition
      NaiveBayes.writeCountBatch(b0, "doc_id", "text", "lang", dir, "b0")
      NaiveBayes.writeCountBatch(trainDocs.filter($"doc_id" > 2),
        "doc_id", "text", "lang", dir, "b1")
      val incremental = NaiveBayes.classify(held, "doc_id", "text",
          NaiveBayes.readCountModel(spark, dir))
        .orderBy("doc_id").collect().toSeq
      val oneShot = NaiveBayes.classify(held, "doc_id", "text",
          NaiveBayes.trainModel(trainDocs, "doc_id", "text", "lang"))
        .orderBy("doc_id").collect().toSeq
      assert(incremental == oneShot)
      // the ledger survives a SECOND compaction (folded bids accumulate)
      NaiveBayes.compactCountModel(spark, dir)
      NaiveBayes.writeCountBatch(b0, "doc_id", "text", "lang", dir, "b0")
      NaiveBayes.writeCountBatch(trainDocs.filter($"doc_id" > 2),
        "doc_id", "text", "lang", dir, "b1")
      assert(NaiveBayes.classify(held, "doc_id", "text",
          NaiveBayes.readCountModel(spark, dir))
        .orderBy("doc_id").collect().toSeq == oneShot)
    } finally rmTree(new java.io.File(dir))
  }

  test("count store: the compaction crash window heals (counts restored from .counts_old)") {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_nb_counts_heal"
    rmTree(new java.io.File(dir))
    try {
      NaiveBayes.writeCountBatch(trainDocs, "doc_id", "text", "lang", dir, "b0")
      val before = NaiveBayes.readCountModel(spark, dir)
        .priors.orderBy("label").collect().toSeq
      // simulate a crash between compaction's two renames
      assert(new java.io.File(s"$dir/counts")
        .renameTo(new java.io.File(s"$dir/.counts_old")))
      val after = NaiveBayes.readCountModel(spark, dir)
        .priors.orderBy("label").collect().toSeq
      assert(after == before)
      assert(new java.io.File(s"$dir/counts").isDirectory)
    } finally rmTree(new java.io.File(dir))
  }

  test("calibrationSweep: counts replay a hand margin computation; coverage is monotone; an accepts-nothing threshold yields NULL accuracy") {
    val model = NaiveBayes.trainModel(trainDocs, "doc_id", "text", "lang")
    val held = Seq(
      (10L, "a b", "x"),  // confident, correct
      (11L, "c c", "y"),  // confident, correct
      (12L, "z", "x")     // OOV-only: floors pick y — wrong, tiny margin
    ).toDF("doc_id", "text", "lang")
    val out = NaiveBayes.calibrationSweep(held, "doc_id", "text", "lang",
        model, thresholds = Seq(0.0, 0.5, 100.0))
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(5)).map(_.asInstanceOf[Double])))).toMap
    // margins: doc 12's floor gap |ln(1/8) − ln(1/9)| ≈ 0.118 < 0.5;
    // docs 10/11 have real evidence margins > 0.5
    assert(out(0.0) == ((3L, 3L, 2L, Some(round6(2.0 / 3)))))
    assert(out(0.5)._2 == 2L && out(0.5)._3 == 2L &&
      out(0.5)._4 == Some(1.0))
    // nothing clears 100: coverage 0, accuracy undefined (NULL)
    assert(out(100.0) == ((3L, 0L, 0L, None)))
    // coverage monotone non-increasing in t
    val cov = NaiveBayes.calibrationSweep(held, "doc_id", "text", "lang",
        model, thresholds = Seq(0.0, 0.1, 0.2, 0.5, 1.0))
      .orderBy("threshold").collect().map(_.getDouble(4))
    assert(cov.sliding(2).forall(p => p(0) >= p(1)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
