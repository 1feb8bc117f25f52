package graft.ops

import graft.SparkSpec

class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq(
    (100L, "alpha beta gamma delta epsilon zeta"),
    (101L, "one two three four five six seven"),
  ).toDF("doc_id", "text")

  test("flags a doc sharing >= minOverlap shingles, skips disjoint docs") {
    val corpus = Seq(
      // shares 5-gram windows with bench 100 (same leading 6 words)
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      // shares nothing
      (2L, "red green blue cyan magenta yellow black"),
      // shares exactly one 5-gram with bench 101 -> below minOverlap=2
      (3L, "one two three four five NOPE NOPE"),
    ).toDF("doc_id", "text")
    val got = Decontamination
      .overlapReport(corpus, bench, "doc_id", "text", k = 5, minOverlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1 vs bench 100: windows of "alpha..zeta eta" include 2 shingles
    // present in bench 100 ("alpha..epsilon", "beta..zeta")
    assert(got == Set((1L, 100L, 2L)))
  }

  test("benchmark-side document-frequency cap drops stop-shingles") {
    // the same boilerplate shingle appears in BOTH bench docs -> df=2
    val bench2 = Seq(
      (100L, "common header words here now alpha"),
      (101L, "common header words here now beta"),
    ).toDF("doc_id", "text")
    val corpus = Seq((1L, "common header words here now gamma")).toDF("doc_id", "text")
    val uncapped = Decontamination
      .overlapReport(corpus, bench2, "doc_id", "text", k = 5, minOverlap = 1)
      .count()
    val capped = Decontamination
      .overlapReport(corpus, bench2, "doc_id", "text", k = 5, minOverlap = 1,
        maxBenchShingleDf = 1)
      .count()
    assert(uncapped == 2L) // matches both bench docs via the shared shingle
    assert(capped == 0L)   // df=2 shingle dropped by the cap
  }

  test("contaminatedDocs reports the worst benchmark match per doc") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
    ).toDF("doc_id", "text")
    val got = Decontamination
      .contaminatedDocs(corpus, bench, "doc_id", "text", k = 5, minOverlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 100L, 2L)))
  }

  test("PII scrub: emails, urls, phones replaced; clean text untouched") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "write to alice.b+test@corp.example please"),
      (2L, "docs at https://docs.example/path?q=1 here"),
      (3L, "call +15551234567 now"),
      (4L, "userinfo url https://u@h.example/x stays one URL"),
      (5L, "nothing sensitive here"),
    ).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.scrubPii(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "write to <EMAIL> please")
    assert(got(2L) == "docs at <URL> here")
    assert(got(3L) == "call <PHONE> now")
    // URL pass runs first, so the embedded userinfo '@' never becomes an email
    assert(got(4L) == "userinfo url <URL> stays one URL")
    assert(got(5L) == "nothing sensitive here")
  }

  test("repetition signals: degenerate text scores high, varied text low") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "all distinct words appear once here"),
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // doc 1: 6 tokens 1 distinct -> 5/6; 5 bigrams 1 distinct -> 4/5; top 5/5
    assert(got(1L) == ((5.0 / 6.0, 4.0 / 5.0, 1.0)))
    // doc 2: all distinct -> 0; bigrams all distinct -> 0; top 1/5
    assert(got(2L) == ((0.0, 0.0, 1.0 / 5.0)))
  }

  test("stored benchmark index: probe == from-text report; frozen k and df-cap replayed") {
    val bench2 = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "common header words here now alpha"),
      (102L, "common header words here now beta"),
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "common header words here now gamma"),
      (3L, "red green blue cyan magenta yellow black"),
    ).toDF("doc_id", "text")
    val dir = s"${sys.props("java.io.tmpdir")}/graft_bench_ix_spec"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(dir))
    try {
      Decontamination.writeBenchIndex(bench2, "doc_id", "text", dir,
        k = 5, maxBenchShingleDf = 1)
      val fromIndex = Decontamination
        .overlapFromIndex(corpus, "doc_id", "text", dir, minOverlap = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val fromText = Decontamination
        .overlapReport(corpus, bench2, "doc_id", "text", k = 5,
          minOverlap = 1, maxBenchShingleDf = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(fromIndex == fromText)
      // the df-capped boilerplate shingle (df=2 across bench 101/102)
      // must be gone from the STORE itself, not re-filtered at probe
      assert(!fromIndex.exists(_._1 == 2L))
      assert(fromIndex.exists(_._1 == 1L))
    } finally rm(new java.io.File(dir))
  }

  test("bench versions: union of live versions; retire == never indexed; purge physical; k frozen") {
    val benchV1 = Seq(
      (101L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val benchV2 = Seq(
      (201L, "red green blue cyan magenta yellow")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "red green blue cyan magenta yellow black"),
      (3L, "totally unrelated content about spark engines here"),
    ).toDF("doc_id", "text")
    val dir = s"${sys.props("java.io.tmpdir")}/graft_bench_ver_spec"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    def probe() = Decontamination
      .overlapFromIndex(corpus, "doc_id", "text", dir, minOverlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    rm(new java.io.File(dir))
    try {
      Decontamination.writeBenchVersion(benchV1, "doc_id", "text", dir,
        "v1", k = 5)
      val v1Only = probe()
      assert(v1Only.exists(_._2 == 101L) && !v1Only.exists(_._2 == 201L))
      // a second version: the probe sees the UNION of live versions;
      // its k=9 argument is IGNORED (layout frozen at bootstrap)
      Decontamination.writeBenchVersion(benchV2, "doc_id", "text", dir,
        "v2", k = 9)
      val both = probe()
      assert(both.exists(_._2 == 101L) && both.exists(_._2 == 201L))
      // retiring v2 ≡ never having indexed it
      Decontamination.retireBenchVersion(spark, dir, "v2")
      assert(probe() == v1Only)
      // double retire: no-op
      Decontamination.retireBenchVersion(spark, dir, "v2")
      assert(probe() == v1Only)
      // purge drops v2's partition physically, changes no overlap
      Decontamination.purgeBenchIndex(spark, dir)
      assert(!new java.io.File(s"$dir/bench_sh/ver=v2").exists)
      assert(new java.io.File(s"$dir/bench_sh/ver=v1").isDirectory)
      assert(probe() == v1Only)
      // an eval doc carried by two live releases must not double-count
      Decontamination.writeBenchVersion(benchV1, "doc_id", "text", dir, "v3")
      assert(probe() == v1Only)
      // version tokens are validated at EVERY directory-naming entry
      // point: a traversal segment must never reach fs.delete, and an
      // all-digit token would be re-typed by partition inference
      for (bad <- Seq("../v1", "a/b", "v1/..", "2024", "")) {
        intercept[IllegalArgumentException] {
          Decontamination.writeBenchVersion(benchV1, "doc_id", "text", dir, bad)
        }
        intercept[IllegalArgumentException] {
          Decontamination.retireBenchVersion(spark, dir, bad)
        }
      }
      // a poisoned ledger row (written around the API) is caught at
      // purge time, BEFORE any delete path is built from it
      Seq("../../etc").toDF("ver").coalesce(1)
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(s"$dir/_retired")
      intercept[IllegalArgumentException] {
        Decontamination.purgeBenchIndex(spark, dir)
      }
      assert(new java.io.File(s"$dir/bench_sh/ver=v1").isDirectory)
    } finally rm(new java.io.File(dir))
  }
}
