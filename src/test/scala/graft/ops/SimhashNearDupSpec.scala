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

  test("crossHammingFromSig == the cross restriction of the naive pair scan") {
    val sig = Dedup.simhashTable(docs, "doc_id", "text", 16)
    val batch = sig.filter(col("doc_id") % 2 === 1)
    val corpus = sig.filter(col("doc_id") % 2 === 0)
    val naive = batch.toDF("new_id", "sig_a")
      .crossJoin(corpus.toDF("corpus_id", "sig_b"))
      .withColumn("hamming",
        Dedup.hammingDistance(col("sig_a"), col("sig_b")).cast("long"))
      .filter(col("hamming") <= 3)
      .select("new_id", "corpus_id", "hamming")
      .collect().map(_.toSeq).toSet
    val banded = Dedup.crossHammingFromSig(batch, corpus, "doc_id", "simhash",
        bits = 16, bands = 4, maxHamming = 3)
      .collect().map(_.toSeq).toSet
    assert(banded == naive && naive.nonEmpty, s"banded $banded vs naive $naive")
    // an id on both sides never pairs with itself
    val selfed = Dedup.crossHammingFromSig(sig, sig, "doc_id", "simhash",
        bits = 16, bands = 4, maxHamming = 3)
      .filter(col("new_id") === col("corpus_id")).count()
    assert(selfed == 0)
  }

  test("hamming recall contract: valid configs hit 1.0; beyond-pigeonhole config caught") {
    // 60 signatures in 4-member families whose members differ in up to
    // 3 LOW bits of one band; plus one engineered CROSS-band pair at
    // hamming 4 (bits 0 and 12 flipped -> two bands touched)
    val base = spark.range(60).select(col("id").as("doc_id"),
      (shiftright(col("id"), 2) * 1664525 + 1013904223)
        .bitwiseAND(lit((1L << 48) - 1))
        .bitwiseXOR(shiftleft(col("id") % 4, 1)).as("s"))
    // probes are id % 50 == 7 (ids 7 and 57)
    val truthAt = (h: Int) => {
      val a = base.toDF("pid", "psig")
      base.crossJoin(a.filter(col("pid") % 50 === 7))
        .filter(col("doc_id") =!= col("pid"))
        .filter(Dedup.hammingDistance(col("s"), col("psig")) <= h)
        .count()
    }
    assert(truthAt(3) > 0)
    val ok = Dedup.hammingRecallContract(base, "doc_id", "s", bits = 48,
        probeMod = 50, configs = Seq((4, 3, 1.0), (6, 3, 1.0)))
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(ok == Map("hamming_48b_4x_h3" -> true, "hamming_48b_6x_h3" -> true))
    // beyond pigeonhole: verify at hamming <= 4 with only 4 bands —
    // a pair spreading its 4 flips across all 4 bands shares no band
    // slice and is MISSED; the contract must report the broken config.
    // id 997 ≡ 7 (mod 990) makes the engineered pair's left side a probe.
    val withCross = base.unionByName(
      Seq((997L, 0L), (998L, 1L | (1L << 12) | (1L << 24) | (1L << 36)))
        .toDF("doc_id", "s"))
    val broken = Dedup.hammingRecallContract(withCross, "doc_id", "s",
        bits = 48, probeMod = 990, configs = Seq((4, 4, 1.0)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    // probe 997 truly pairs with 998 at hamming 4, but no band slice is
    // shared: recall_ok must be FALSE under the 1.0 bound
    assert(broken.head._2 >= 1L)
    assert(!broken.head._3,
      "a banding that cannot cover its verify threshold must fail the contract")
  }

  test("full-store pair sweep == the in-session detector; tombstones masked") {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles match {
        case null => ()
        case kids => kids.foreach(rm)
      }
      f.delete(); ()
    }
    val sig = spark.range(60).select(col("id").as("doc_id"),
      (shiftright(col("id"), 2) * 1664525 + 1013904223)
        .bitwiseAND(lit((1L << 48) - 1))
        .bitwiseXOR(shiftleft(col("id") % 4, 2)).as("s"))
      .localCheckpoint()
    val expected = Dedup.hammingNearDupFromSig(sig, "doc_id", "s",
        bits = 48, bands = 4, maxHamming = 3)
      .collect().map(_.toSeq).toSet
    assert(expected.nonEmpty)
    val p = s"${sys.props("java.io.tmpdir")}/graft_sigstore_spec_sweep"
    rm(new java.io.File(p))
    Dedup.writeSignatureStore(sig.filter(col("doc_id") % 2 === 0),
      "doc_id", "s", p, bits = 48, bands = 4, sigBuckets = 8)
    Dedup.appendToSignatureStore(sig.filter(col("doc_id") % 2 === 1),
      "doc_id", "s", p)
    def sweep() = Dedup.hammingPairsFromSignatureStore(spark, p, maxHamming = 3)
      .collect().map(_.toSeq).toSet
    assert(sweep() == expected,
      "pairs from the at-rest banded relation must equal in-session pairs")
    // a deleted signature leaves EVERY pair it was part of
    val doomed = sig.limit(2).select(col("doc_id")).localCheckpoint()
    val doomedIds = doomed.collect().map(_.getLong(0)).toSet
    Dedup.deleteFromSignatureStore(doomed, "doc_id", p)
    assert(sweep() == expected.filterNot(r =>
      doomedIds(r(0).asInstanceOf[Long]) || doomedIds(r(1).asInstanceOf[Long])))
    rm(new java.io.File(p))
  }

  test("signature store: probe == in-session cross pairs; append == write; re-append no-op") {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles match {
        case null => ()
        case kids => kids.foreach(rm)
      }
      f.delete(); ()
    }
    // a wider corpus so bucket pruning is non-trivial: 60 synthetic
    // signatures in 15 four-member Hamming families
    val sig = spark.range(60).select(col("id").as("doc_id"),
      (shiftright(col("id"), 2) * 1664525 + 1013904223)
        .bitwiseAND(lit((1L << 48) - 1))
        .bitwiseXOR(shiftleft(col("id") % 4, 2)).as("s"))
      .localCheckpoint()
    val corpus = sig.filter(col("doc_id") % 2 === 0)
    val batch = sig.filter(col("doc_id") % 2 === 1)
    val expected = Dedup.crossHammingFromSig(batch, corpus, "doc_id", "s",
        bits = 48, bands = 4, maxHamming = 3)
      .collect().map(_.toSeq).toSet
    assert(expected.nonEmpty)
    val pW = s"${sys.props("java.io.tmpdir")}/graft_sigstore_spec_w"
    val pA = s"${sys.props("java.io.tmpdir")}/graft_sigstore_spec_a"
    rm(new java.io.File(pW)); rm(new java.io.File(pA))
    Dedup.writeSignatureStore(corpus, "doc_id", "s", pW,
      bits = 48, bands = 4, sigBuckets = 8)
    def probe(p: String) = Dedup.dedupAgainstSignatureStore(
        batch, "doc_id", "s", p, maxHamming = 3)
      .collect().map(_.toSeq).toSet
    assert(probe(pW) == expected, "store probe must equal in-session pairs")
    // append-built == write-built on the union corpus
    Dedup.writeSignatureStore(corpus.filter(col("doc_id") % 4 === 0),
      "doc_id", "s", pA, bits = 48, bands = 4, sigBuckets = 8)
    Dedup.appendToSignatureStore(corpus.filter(col("doc_id") % 4 === 2),
      "doc_id", "s", pA)
    assert(probe(pA) == expected, "append-built must equal write-built")
    // duplicate re-append: idempotent (a doubled band row would
    // double every pair it produces)
    Dedup.appendToSignatureStore(corpus, "doc_id", "s", pA)
    assert(probe(pA) == expected)
    assert(spark.read.parquet(s"$pA/sigs").count() == corpus.count())
    // the banded relation is sb-partitioned on disk (the pruning layout)
    assert(new java.io.File(s"$pA/bands").listFiles()
      .exists(_.getName.startsWith("sb=g")))
    // --- deletion lifecycle: mask == never-stored, purge physical ---
    val doomed = corpus.limit(3).select(col("doc_id")).localCheckpoint()
    val doomedIds = doomed.collect().map(_.getLong(0)).toSet
    val expectedDel = expected.filterNot(r => doomedIds(r(1).asInstanceOf[Long]))
    Dedup.deleteFromSignatureStore(doomed, "doc_id", pA)
    assert(probe(pA) == expectedDel, "masked probe must equal never-stored")
    // double delete: no-op
    Dedup.deleteFromSignatureStore(doomed, "doc_id", pA)
    assert(probe(pA) == expectedDel)
    // re-append of a deleted id is blocked until the purge
    Dedup.appendToSignatureStore(corpus.join(doomed, Seq("doc_id"), "leftsemi"),
      "doc_id", "s", pA)
    assert(probe(pA) == expectedDel, "re-append of tombstoned ids must be blocked")
    Dedup.purgeSignatureStore(spark, pA)
    assert(probe(pA) == expectedDel, "purge must not change any pair")
    assert(!new java.io.File(s"$pA/bands/_tombstones").exists)
    assert(spark.read.parquet(s"$pA/sigs")
      .filter(col("doc_id").isin(doomedIds.toSeq: _*)).count() == 0)
    assert(spark.read.parquet(s"$pA/bands")
      .filter(col("id").isin(doomedIds.toSeq: _*)).count() == 0)
    // after the purge the ids are re-ingestable; the store equals the
    // never-deleted one again
    Dedup.appendToSignatureStore(corpus.join(doomed, Seq("doc_id"), "leftsemi"),
      "doc_id", "s", pA)
    assert(probe(pA) == expected,
      "delete -> purge -> re-append must equal the never-deleted store")
    rm(new java.io.File(pW)); rm(new java.io.File(pA))
  }
}
