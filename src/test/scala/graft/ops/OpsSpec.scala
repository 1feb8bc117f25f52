package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq((1L, text)).toDF("id", "text")

  test("tokens/tokenCount: lowercases, drops empties") {
    val n = one("The  quick Brown fox").select(TextAnalysis.tokenCount($"text")).as[Long].head()
    assert(n == 4)
  }

  test("bpeTokenCount: splits runs and marks") {
    // "ab12,cd" -> ab, 12, ',', cd
    val n = one("ab12,cd").select(TextAnalysis.bpeTokenCount($"text")).as[Long].head()
    assert(n == 4)
  }

  test("stopword count and quality score bounds") {
    val df = one("the cat sat on the mat")
    val stop = df.select(TextAnalysis.stopwordCount(TextAnalysis.tokens($"text"))).as[Long].head()
    assert(stop == 2)
    val q = df.select(TextAnalysis.qualityScore($"text")).as[Double].head()
    assert(q > 0.0 && q <= 1.0)
  }

  test("dupSpanCoverage: merged overlaps, cross-doc only, short docs zero") {
    val docs = Seq(
      (1L, "a b c d e"),       // "a b c" (shared w/ 2), "c d e" (shared w/ 3)
      (2L, "a b c x y"),       // "a b c" only
      (3L, "z c d e q"),       // "c d e" only
      (4L, "q q"),             // shorter than k -> no grams
      (5L, "m n o p m n o")    // "m n o" repeats WITHIN the doc only
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dupSpanCoverage(docs, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    // doc 1: spans [1,3] and [3,5] merge to 5 covered tokens (position 3
    // counted ONCE) -> frac 1.0 — the merged-interval arithmetic's point
    assert(out(1L) == ((5L, 1.0)))
    assert(out(2L) == ((3L, 0.6)))
    assert(out(3L) == ((3L, 0.6)))
    assert(out(4L) == ((0L, 0.0)))
    // within-doc repetition is NOT cross-doc duplication
    assert(out(5L) == ((0L, 0.0)))
  }

  test("exciseDupSpans: keeper survives, overlaps merge, within-doc repeats excise, empty husk kept") {
    val docs = Seq(
      (1L, "a b c d e"),      // keeper of "a b c" and "c d e" — untouched
      (2L, "a b c x y"),      // loses [1,3] to doc 1's "a b c"
      (3L, "z c d e q"),      // loses [2,4] to doc 1's "c d e"
      (4L, "q q"),            // shorter than k -> no grams, kept whole
      (5L, "m n o p m n o"),  // WITHIN-doc repeat: second "m n o" excised
      (6L, "u v w x y"),      // keeper of "u v w" and "v w x"
      (7L, "u v w x z"),      // overlapping excisions [1,3]+[2,4] merge to [1,4]
      (8L, "r s t"),          // keeper of the exact-dup pair
      (9L, "r s t")           // fully excised -> empty husk, row kept
    ).toDF("doc_id", "text")
    val out = TextAnalysis.exciseDupSpans(docs, "doc_id", "text", k = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((5L, 0L, "a b c d e")))
    assert(out(2L) == ((5L, 3L, "x y")))
    assert(out(3L) == ((5L, 3L, "z q")))
    assert(out(4L) == ((2L, 0L, "q q")))
    assert(out(5L) == ((7L, 3L, "m n o p")))
    assert(out(6L) == ((5L, 0L, "u v w x y")))
    assert(out(7L) == ((5L, 4L, "z")))
    assert(out(8L) == ((3L, 0L, "r s t")))
    assert(out(9L) == ((3L, 3L, "")))
  }

  test("langId: marker argmax with alphabetical tie-break, und for no hits") {
    val df = Seq((1L, "the cat and dog"), (2L, "el gato la casa"),
      (3L, "zzz qqq"), (4L, "la la la")).toDF("id", "text")
    val out = df.select($"id", TextAnalysis.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "und")
    assert(out(4L) == "es") // 'la' ties es/fr -> alphabetical es
  }

  test("langIdCharNgram: bigram profiles classify short natural-language samples") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the fence"),
      (2L, "der hund und die katze scheinen schnell"),
      (3L, "la ciudad de los angeles esta en el oeste"),
      (4L, "xq zz vv"),
    ).toDF("id", "text")
    val out = df.select($"id", TextAnalysis.langIdCharNgram($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "es")
    assert(out(4L) == "und")
  }

  test("fingerprint collapses order+dups; rollingFingerprint does not") {
    val df = Seq((1L, "b a a c"), (2L, "a b c"), (3L, "c b a")).toDF("id", "text")
    val fps = df.select(TextAnalysis.fingerprint($"text")).as[String].collect()
    assert(fps.distinct.length == 1)
    val rfps = df.select(TextAnalysis.rollingFingerprint($"text")).as[Long].collect()
    assert(rfps.distinct.length == 3)
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exactDupGroups: keeper is min id, counts copies") {
    val df = Seq((1L, "same text"), (5L, "same text"), (3L, "other")).toDF("doc_id", "text")
    val out = Dedup.exactDupGroups(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("keeper_id") -> r.getAs[Long]("n_copies")).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L))
  }

  test("shingles: 1-based 3-grams, short docs yield none") {
    val df = Seq((1L, "a b c d"), (2L, "a b")).toDF("id", "text")
    val sh = df.select($"id", Dedup.shingles(TextAnalysis.tokens($"text")).as("sh")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L) == Seq("a b c", "b c d"))
    assert(sh(2L).isEmpty)
  }

  test("nearDuplicates finds a planted near-dup and skips unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val nearDup = base.replace("today", "tomorrow")
    val other = "completely different words about spark catalyst optimizer internals"
    val df = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.nearDuplicates(df, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("minhashRecallContract: healthy configs pass, an AND-construction config is caught") {
    // 30 planted near-dup pairs (doc i ≈ doc i+100) + unrelated fillers
    val docs = ((1L to 30L).flatMap { i =>
      val base = s"alpha bravo charlie delta echo foxtrot golf hotel india tail$i more words here"
      Seq((i, base), (i + 100L, base.replace("more", "extra")))
    } ++ (200L to 230L).map(i =>
      (i, s"totally unrelated content number $i about $i different things ${i * 7}")))
      .toDF("doc_id", "text")
    val out = Dedup.minhashRecallContract(docs, "doc_id", "text",
        threshold = 0.5, shingleK = 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(out("minhash_8x4")._1 >= 30L)
    assert(out("minhash_8x4")._2 && out("minhash_16x8")._2)
    // contract BITES: 8 rows in ONE band is an AND-construction —
    // candidate probability s^8, recall collapses, the floor catches it
    val broken = Dedup.minhashRecallContract(docs, "doc_id", "text",
        threshold = 0.5, shingleK = 3, configs = Seq((8, 1, 0.55)))
      .collect()
    assert(broken.length == 1 && !broken.head.getBoolean(2))
  }

  test("nearDuplicates is invariant under input partitioning") {
    val docs = (1L to 20L).map(i =>
      (i, s"shared prefix words for all docs number ${i % 3} tail $i extra token salad here"))
      .toDF("doc_id", "text")
    val a = Dedup.nearDuplicates(docs, "doc_id", "text", 0.2)
      .collect().map(_.toSeq).toSet
    val b = Dedup.nearDuplicates(docs.repartition(7), "doc_id", "text", 0.2)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("simhashTable (native aggregate) == the per-bit column-sum formulation") {
    // random-ish docs with repeated tokens (multiplicity matters) and a
    // token mix wide enough to exercise every bit position
    val docs = (1L to 40L).map { i =>
      val toks = (0 until (3 + (i % 9)).toInt)
        .map(j => s"tok${(i * 7 + j * 13) % 23}")
      (i, (toks ++ toks.take((i % 3).toInt)).mkString(" "))
    }.toDF("doc_id", "text")
    for (bits <- Seq(16, 32, 60)) {
      val got = Dedup.simhashTable(docs, "doc_id", "text", bits)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // independent reference: the bits-separate conditional sums
      val v = docs
        .select($"doc_id", explode(split(lower($"text"), " ")).as("t"))
        .filter($"t" =!= "")
        .select($"doc_id",
          conv(substring(md5($"t"), 1, bits / 4), 16, 10).cast("long").as("v"))
      val want = v.groupBy($"doc_id")
        .agg(sum(when(shiftright($"v", 0).bitwiseAND(1) === 1, 1).otherwise(-1)).as("s0"),
          (1 until bits).map(b =>
            sum(when(shiftright($"v", b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$b")): _*)
        .select($"doc_id",
          (0 until bits).map(b =>
            when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"bits=$bits")
    }
  }

  test("simhash: near-identical docs land within small hamming distance") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "one two three four five six seven eight")).toDF("id", "text")
    val hs = df.select($"id", Dedup.simhash(TextAnalysis.tokens($"text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(1L), hs(2L)) < ham(hs(1L), hs(3L)))
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("cosine of a vector with itself is 1") {
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("id", "v")
    val c = df.select(Similarity.cosine(
      Similarity.toDoubleVec($"v"), Similarity.toDoubleVec($"v"))).as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("knnBrute: k results, sims sorted desc, query excluded") {
    val out = Similarity.knnBrute(emb, "vec_id", "embedding", 0L, 10).collect()
    assert(out.length == 10)
    assert(!out.map(_.getLong(0)).contains(0L))
    val sims = out.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("annQuery results are a subset of brute-force cosine ranking space") {
    val brute = Similarity.knnBrute(emb, "vec_id", "embedding", 0L, 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ann = Similarity.annQuery(emb, "vec_id", "embedding", 0L, 5).collect()
    ann.foreach { r =>
      assert(math.abs(brute(r.getLong(0)) - r.getDouble(1)) < 1e-9)
    }
  }

  test("ivfQuery: k results from probed cells, sims agree with brute force") {
    val brute = Similarity.knnBrute(emb, "vec_id", "embedding", 0L, 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivf = Similarity.ivfQuery(emb, "vec_id", "embedding", 0L, 5).collect()
    assert(ivf.length == 5)
    ivf.foreach { r =>
      assert(math.abs(brute(r.getLong(0)) - r.getDouble(1)) < 1e-9)
    }
    val sims = ivf.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("lshPlanes deterministic and bounded") {
    val p1 = Similarity.lshPlanes(4, 64)
    val p2 = Similarity.lshPlanes(4, 64)
    assert(p1.flatten.toSeq == p2.flatten.toSeq)
    assert(p1.flatten.forall(v => v >= -1.0 && v < 1.0))
  }

  test("nearDupPairs: symmetric blocking, ordered ids, sim above threshold") {
    val out = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.35, 4).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.35)
    }
  }

  test("annRecallContract: judged bounds hold AND a broken bucketer is caught") {
    val healthy = Similarity.annRecallContract(emb, "vec_id", "embedding")
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(healthy == Map("ivf" -> true, "lsh_multitable" -> true,
      "lsh_multiprobe" -> true),
      s"judged contract must hold on the shipped index: $healthy")
    // geometry-free bucketer: buckets keyed on the id, not the vector —
    // candidates become a uniform 1/16 slice of the corpus and mean
    // recall collapses ~5x below the judged bound, so the SAME contract
    // must flip the lsh rows (ivf is untouched by the bucketer). The
    // multiprobe path perturbs the broken keys too — still geometry-free,
    // still caught.
    val brokenHits = Similarity.recallFromBucketer(emb, "vec_id", "embedding",
      probeEvery = 50, probeOffset = 7, k = 10, numCentroids = 8, nprobe = 4,
      (_, _) => array(concat(lit("0:"), (col("id") % 16).cast("string"))),
      mpFlipBits = 4)
    val broken = Similarity.contractFromHits(brokenHits, k = 10,
        lshBound = 0.3, ivfBound = 0.35, mpBound = 0.7)
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(!broken("lsh_multitable"),
      s"a geometry-free bucket assignment must fail the recall bound: $broken")
    assert(!broken("lsh_multiprobe"),
      s"multiprobe over geometry-free buckets must fail too: $broken")
    assert(broken("ivf"), "the ivf path is independent of the lsh bucketer")
  }

  test("annRecallContract: per-probe hits bounded by k; multiprobe dominates multitable") {
    val raw = Similarity.recallFromBucketer(emb, "vec_id", "embedding",
      probeEvery = 50, probeOffset = 7, k = 10, numCentroids = 8, nprobe = 4,
      Similarity.multiTableBucketer(4, 4), mpFlipBits = 4).collect()
    assert(raw.length == 10) // 500 ids, every 50th starting at 7
    raw.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 10)
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 10)
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 10)
      // multiprobe candidates are a superset (the unflipped key is
      // probed too), so its hit count dominates per probe — exact, not
      // statistical
      assert(r.getLong(3) >= r.getLong(1),
        s"multiprobe hits ${r.getLong(3)} < multitable hits ${r.getLong(1)}")
    }
  }

  test("multiProbeKeys: 2-digit table prefixes (numTables >= 11) flip plane bits, never the prefix") {
    import spark.implicits._
    // table index 10 — the first 2-digit prefix; a hardcoded 2-char
    // prefix assumption would flip the '0' of "10:" instead of a plane
    // bit and silently degrade multiprobe to junk lookups
    val keys = Seq("10:0110", "0:1010").toDF("bk0")
      .select(col("bk0"), explode(Similarity.multiProbeKeys(col("bk0"), 4)).as("bk"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    Seq("10:0110", "0:1010").foreach { bk0 =>
      val probed = keys.filter(_._1 == bk0).map(_._2).toSeq
      val (prefix, bits) = bk0.splitAt(bk0.indexOf(':') + 1)
      // the unflipped key itself plus one key per plane bit, all distinct
      assert(probed.size == 1 + bits.length, s"$bk0 -> $probed")
      assert(probed.distinct.size == probed.size, s"duplicate probe keys: $probed")
      assert(probed.contains(bk0), s"unflipped key missing from $probed")
      probed.foreach { k =>
        assert(k.startsWith(prefix), s"prefix mangled: $bk0 -> $k")
        val suffix = k.drop(prefix.length)
        assert(suffix.length == bits.length, s"suffix length drift: $bk0 -> $k")
        val hamming = suffix.zip(bits).count { case (a, b) => a != b }
        assert(hamming <= 1, s"flip must touch exactly one plane bit: $bk0 -> $k")
      }
    }
  }
}

class MultimodalSpec extends SparkSpec {

  private def media = {
    val rows = Seq(
      org.apache.spark.sql.Row(1L, "image/fake", Array[Byte](1, 2, 3, 4), 2, 2, null),
      org.apache.spark.sql.Row(2L, "video/fake", "0123456789".getBytes, 4, 4, 3000L),
    )
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
  }

  test("decodeFeatures: deterministic stub features + checksums") {
    val out = Multimodal.decodeFeatures(media, new Multimodal.StubDecoder(4))
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_bytes") == 4L)
    assert(out(1L).getSeq[Float](out(1L).fieldIndex("feature")).length == 4)
    assert(out(2L).getAs[Int]("n_frames_sampled") == 3) // 3000ms @ 1s step
    // determinism
    val again = Multimodal.decodeFeatures(media, new Multimodal.StubDecoder(4))
      .collect().map(r => r.getAs[Long]("media_id") ->
        r.getSeq[Float](r.fieldIndex("feature")).toList).toMap
    assert(again(1L) == out(1L).getSeq[Float](out(1L).fieldIndex("feature")).toList)
  }

  test("audio fingerprint: formula-exact samples, stride-blind to edits, per-group distinct") {
    // keyedTonePcm: sample i = ((a(i+1) + b) mod 4096) - 2048
    val g = 5L
    val a = (g * 43 + 13) % 509 + 16
    val b = (g * 29 + 7) % 101
    val clip = Multimodal.keyedTonePcm(g, 480)
    val s = Multimodal.decodePcm16(clip)
    assert(s.length == 480)
    assert(s(0) == ((a * 1 + b) % 4096 - 2048).toShort)
    assert(s(479) == ((a * 480 + b) % 4096 - 2048).toShort)
    val fp = Multimodal.audioFingerprint(s, 48)
    // perturbation at a NON-strided position (stride = 10) is invisible
    val p1 = Multimodal.decodePcm16(Multimodal.perturbSample(clip, 3, 997))
    assert(Multimodal.audioFingerprint(p1, 48) == fp)
    assert(p1(3) != s(3))
    // ... at a STRIDED position with a sign-flipping delta it is not
    val p2 = Multimodal.decodePcm16(Multimodal.perturbSample(clip, 10, 20000))
    assert(Multimodal.audioFingerprint(p2, 48) != fp)
    // different groups fingerprint apart (the q177 cross-group claim)
    val other = Multimodal.audioFingerprint(
      Multimodal.decodePcm16(Multimodal.keyedTonePcm(6L, 480)), 48)
    assert(java.lang.Long.bitCount(fp ^ other) > 3)
    // the 60-bit wide variant (q185's scale path, stride 8): same
    // stride-blindness, same cross-group separation
    val fp60 = Multimodal.audioFingerprint(s, 60)
    assert(Multimodal.audioFingerprint(p1, 60) == fp60)
    val other60 = Multimodal.audioFingerprint(
      Multimodal.decodePcm16(Multimodal.keyedTonePcm(6L, 480)), 60)
    assert(java.lang.Long.bitCount(fp60 ^ other60) > 3)
  }

  test("audioHashTable + hamming banding: within-group pairs only, hamming 0") {
    import spark.implicits._
    val media = (0L until 8L).map { id =>
      (id, Multimodal.perturbSample(
        Multimodal.keyedTonePcm(id / 4, 480), 1 + (id % 4).toInt, 997))
    }.toDF("media_id", "payload")
    val pairs = Dedup.hammingNearDupFromSig(
        Multimodal.audioHashTable(media, bits = 48),
        "media_id", "afp", bits = 48, bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = (for {
      g <- 0L to 1L; i <- 0L until 4L; j <- i + 1 until 4L
    } yield (g * 4 + i, g * 4 + j, 0L)).toSet
    assert(pairs == expected)
  }

  test("extractFrameStub: deterministic proportional slices; resize rejects non-PPM bytes") {
    val payload = (0 until 100).map(_.toByte).toArray
    val f0 = Multimodal.extractFrameStub(payload, 0L, 10000L)
    val fMid = Multimodal.extractFrameStub(payload, 5000L, 10000L)
    assert(f0.head == 0.toByte && fMid.head != f0.head)
    assert(Multimodal.extractFrameStub(payload, 5000L, 10000L).toSeq == fMid.toSeq)
    intercept[IllegalArgumentException](Multimodal.resizeImage(payload, 2, 2))
  }

  test("PPM codec: encode/decode roundtrip, header grammar, truncation rejected") {
    val rgb = (0 until 4 * 3 * 3).map(_.toByte).toArray
    val img = Multimodal.RasterImage(4, 3, rgb)
    val decoded = Multimodal.decodePpm(Multimodal.encodePpm(img))
    assert(decoded.width == 4 && decoded.height == 3)
    assert(decoded.rgb.toSeq == rgb.toSeq)
    // comments + arbitrary whitespace between header tokens
    val weird = ("P6 # binary ppm\n# a comment line\n 4\t3 # dims\n255\n"
      .getBytes("US-ASCII")) ++ rgb
    val d2 = Multimodal.decodePpm(weird)
    assert(d2.width == 4 && d2.height == 3 && d2.rgb.toSeq == rgb.toSeq)
    intercept[IllegalArgumentException](
      Multimodal.decodePpm(Multimodal.encodePpm(img).dropRight(1)))
    intercept[IllegalArgumentException](
      Multimodal.decodePpm("P5\n1 1\n255\n ".getBytes("US-ASCII")))
  }

  test("PNG codec: lossless roundtrip bit-for-bit; undecodable bytes rejected") {
    // every byte value appears across channels — a channel-order or
    // sign-extension slip cannot hide
    val rgb = (0 until 16 * 12 * 3).map(i => ((i * 7) % 256).toByte).toArray
    val img = Multimodal.RasterImage(16, 12, rgb)
    val png = Multimodal.encodePng(img)
    // actual PNG container, not a renamed raster
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val decoded = Multimodal.decodeImage(png)
    assert(decoded.width == 16 && decoded.height == 12)
    assert(decoded.rgb.toSeq == rgb.toSeq)
    intercept[IllegalArgumentException](
      Multimodal.decodeImage("not an image".getBytes("US-ASCII")))
  }

  test("JPEG codec: lossy roundtrip within tolerance, dimensions exact") {
    // smooth gradient (JPEG's best case) — per-channel MEAN must land
    // within a few counts of the source; dimensions must be exact
    val w = 16; val h = 12
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      rgb(i) = (8 * x).toByte; rgb(i + 1) = (10 * y).toByte; rgb(i + 2) = 64.toByte
    }
    val decoded = Multimodal.decodeImage(
      Multimodal.encodeJpeg(Multimodal.RasterImage(w, h, rgb)))
    assert(decoded.width == w && decoded.height == h)
    def mean(a: Array[Byte], c: Int): Double =
      a.indices.collect { case i if i % 3 == c => (a(i) & 0xff).toDouble }.sum / (w * h)
    for (c <- 0 until 3)
      assert(math.abs(mean(decoded.rgb, c) - mean(rgb, c)) <= 4.0,
        s"channel $c mean drifted past JPEG tolerance")
  }

  test("resizeImage: nearest-neighbor downscale picks source pixels") {
    // 4x4 image whose quadrants are solid colors
    val rgb = new Array[Byte](4 * 4 * 3)
    for (y <- 0 until 4; x <- 0 until 4) {
      val v: Byte = (if (y < 2) { if (x < 2) 10 else 20 }
                     else { if (x < 2) 30 else 40 }).toByte
      val i = (y * 4 + x) * 3
      rgb(i) = v; rgb(i + 1) = v; rgb(i + 2) = v
    }
    val small = Multimodal.decodePpm(Multimodal.resizeImage(
      Multimodal.encodePpm(Multimodal.RasterImage(4, 4, rgb)), 2, 2))
    assert(small.width == 2 && small.height == 2)
    assert(small.rgb.grouped(3).map(_.head).toSeq == Seq[Byte](10, 20, 30, 40))
    // upscale roundtrip: 2x2 -> 4x4 -> every quadrant constant
    val up = Multimodal.decodePpm(Multimodal.resizeImage(
      Multimodal.encodePpm(small), 4, 4))
    assert(up.rgb.grouped(3).map(_.head).toSeq ==
      Seq[Byte](10, 10, 20, 20, 10, 10, 20, 20, 30, 30, 40, 40, 30, 30, 40, 40))
  }

  test("aHash: robust to odd-pixel perturbation and PNG roundtrip, distinct across groups") {
    val base = Multimodal.keyedGradientRaster(5L, 16, 12)
    val h0 = Multimodal.aHash(base)
    // perturbations at ODD coordinates are invisible to the 8x6
    // even-coordinate downsample: hash EXACTLY equal, through a real
    // PNG encode/decode roundtrip
    for (p <- 0 until 4) {
      val v = Multimodal.perturbPixel(base, 1 + 2 * p, 1, 97)
      assert(Multimodal.aHash(Multimodal.decodeImage(Multimodal.encodePng(v))) == h0,
        s"odd-pixel perturbation $p changed the hash")
    }
    // a perturbation at an EVEN (sampled) coordinate CAN move bits —
    // the hash is of the content, not a constant (big red shift at a
    // sampled pixel shifts that cell's gray by ~32 of ~128 range)
    val sampled = Multimodal.perturbPixel(base, 2, 2, 120)
    assert(Multimodal.aHash(sampled) != h0 ||
      Multimodal.aHash(Multimodal.perturbPixel(base, 4, 2, 120)) != h0,
      "sampled-pixel perturbations never moving any bit means the hash is degenerate")
    // distinct groups -> genuinely different signatures (beyond the
    // banding threshold), for a spread of group keys
    for (g <- Seq(0L, 1L, 2L, 17L, 101L)) {
      val hg = Multimodal.aHash(Multimodal.keyedGradientRaster(g, 16, 12))
      if (g != 5L)
        assert(java.lang.Long.bitCount(hg ^ h0) > 3,
          s"group $g within hamming 3 of group 5: ${java.lang.Long.bitCount(hg ^ h0)}")
    }
  }

  test("imageHashTable + hammingNearDupFromSig: same-group variants pair, cross-group don't") {
    import spark.implicits._
    // 3 groups x 4 perturbed variants — the q158 fixture in miniature
    val media = (0L until 12L).map { id =>
      val img = Multimodal.keyedGradientRaster(id / 4, 16, 12)
      (id, Multimodal.encodePng(
        Multimodal.perturbPixel(img, 1 + 2 * (id % 4).toInt, 1, 97)))
    }.toDF("media_id", "payload")
    val pairs = Dedup.hammingNearDupFromSig(
        Multimodal.imageHashTable(media), "media_id", "ahash",
        bits = 48, bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every within-group pair present at hamming 0 (6 per group)
    val expected = (for {
      g <- 0L until 3L; a <- 0L until 4L; b <- (a + 1) until 4L
    } yield (g * 4 + a, g * 4 + b)).toSet
    assert(pairs.map(p => (p._1, p._2)).toSet == expected,
      s"pairs ${pairs.toSeq.sorted} != expected within-group pairs")
    assert(pairs.forall(_._3 == 0L), "same-group variants must hash identically")
  }

  test("PCM16 codec: roundtrip, byte order, sign extension, odd length rejected") {
    val samples = Array[Short](0, 1, -1, 257, -257, Short.MaxValue, Short.MinValue)
    val bytes = Multimodal.encodePcm16(samples)
    assert(bytes.length == samples.length * 2)
    // little-endian: 257 = 0x0101 -> 01 01; 1 = 0x0001 -> 01 00
    assert(bytes(2) == 1.toByte && bytes(3) == 0.toByte)
    assert(Multimodal.decodePcm16(bytes).toSeq == samples.toSeq)
    // -1 = 0xFFFF must decode back negative (sign extension of the high byte)
    assert(Multimodal.decodePcm16(Array(0xff.toByte, 0xff.toByte)).head == -1)
    intercept[IllegalArgumentException](Multimodal.decodePcm16(bytes.dropRight(1)))
  }

  test("audioStatsTable: exact stats from real s16le bytes; sawtooth covers full range") {
    val payload = Multimodal.encodePcm16(Array[Short](100, -200, 300))
    val rows = Seq(org.apache.spark.sql.Row(3L, "audio/pcm", payload, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Multimodal.mediaSchema)
    val r = Multimodal.audioStatsTable(df.select(col("media_id"), col("payload")))
      .collect().head
    assert(r.getLong(1) == 3L)                                    // n_samples
    assert(r.getLong(2) == 200L)                                  // sum
    assert(r.getLong(3) == 100L * 100 + 200L * 200 + 300L * 300)  // sum_sq
    assert(r.getInt(4) == 300)                                    // peak
    // sawtooth: deterministic, and decodes to the closed-form samples
    val saw = Multimodal.decodePcm16(Multimodal.sawtoothPcm(5L, 11L, 64))
    assert(saw.toSeq == Multimodal.decodePcm16(Multimodal.sawtoothPcm(5L, 11L, 64)).toSeq)
    assert(saw.zipWithIndex.forall { case (v, i) =>
      v == (java.lang.Math.floorMod(5L * 31 + 11L * 17 + i * 7919L, 65536L) - 32768L).toShort
    })
  }

  test("PpmDecoder: real decode through decodeFeatures, exact channel means") {
    // solid-color 2x2: means are exactly the channel values
    val rgb = Array.fill(4)(Array[Byte](100.toByte, 150.toByte, 200.toByte)).flatten
    val payload = Multimodal.encodePpm(Multimodal.RasterImage(2, 2, rgb))
    val rows = Seq(org.apache.spark.sql.Row(7L, "image/x-portable-pixmap",
      payload, 2, 2, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Multimodal.mediaSchema)
    val f = Multimodal.decodeFeatures(df, new Multimodal.PpmDecoder)
      .collect().head.getSeq[Float](5)
    assert(f.take(5) == Seq(2f, 2f, 100f, 150f, 200f))
    val stats = Multimodal.imageStatsTable(df.select(col("media_id"), col("payload")))
      .collect().head
    assert(stats.getLong(3) == 400L && stats.getLong(4) == 600L && stats.getLong(5) == 800L)
  }

  test("mediaMetadata: payload-free metadata columns") {
    val out = Multimodal.mediaMetadata(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("n_bytes")).toMap
    assert(out == Map(1L -> 4L, 2L -> 10L))
  }

  test("GVID codec: roundtrip, header-only duration, truncation and bad magic rejected") {
    val f0 = Multimodal.encodePpm(Multimodal.keyedGradientRaster(3L, 4, 4))
    val f1 = Multimodal.encodePng(Multimodal.keyedGradientRaster(4L, 4, 4))
    val clip = Multimodal.encodeVideo(Seq(f0, f1), frameMs = 250L)
    val (ms, frames) = Multimodal.decodeVideo(clip)
    assert(ms == 250L && frames.length == 2)
    assert(frames(0).toSeq == f0.toSeq && frames(1).toSeq == f1.toSeq)
    assert(Multimodal.videoDurationMs(clip) == 500L)
    intercept[IllegalArgumentException](
      Multimodal.decodeVideo(clip.dropRight(3)))
    intercept[IllegalArgumentException](
      Multimodal.decodeVideo("XV1\n1 10\n".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](
      Multimodal.encodeVideo(Seq.empty, 100L))
  }

  test("videoFrameHashTable: sampled slots only, hash == the frame's aHash, format-mixed stills") {
    import spark.implicits._
    val rasters = (0 until 4).map(j => Multimodal.keyedGradientRaster(10L + j, 16, 12))
    // mixed still formats inside one clip: PPM and PNG both decode
    val stills = rasters.zipWithIndex.map { case (img, j) =>
      if (j % 2 == 0) Multimodal.encodePpm(img) else Multimodal.encodePng(img)
    }
    val clip = Multimodal.encodeVideo(stills, frameMs = 1000L)
    val out = Multimodal.videoFrameHashTable(
        Seq((7L, clip)).toDF("media_id", "payload"), stepMs = 2000L)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // 4000 ms at step 2000 samples slots 0 and 2 only
    assert(out.keySet == Set((7L, 0), (7L, 2)))
    assert(out((7L, 0)) == Multimodal.aHash(rasters(0)))
    assert(out((7L, 2)) == Multimodal.aHash(rasters(2)))
  }

  test("videoPairsFromFramePairs: aligned slots only, minFrames fold, key pack/unpack") {
    import spark.implicits._
    def fid(v: Long, f: Long) = (v << Multimodal.videoFrameShift) + f
    val framePairs = Seq(
      (fid(1, 0), fid(2, 0)), // aligned slot 0
      (fid(1, 2), fid(2, 2)), // aligned slot 2 -> (1,2) has 2 frames
      (fid(1, 0), fid(3, 2)), // MISALIGNED: never video evidence
      (fid(1, 0), fid(4, 0)), // (1,4) only 1 aligned frame
    ).toDF("id_a", "id_b")
    val out = Multimodal.videoPairsFromFramePairs(framePairs, "id_a", "id_b",
        minFrames = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 2L, 2L)))
    // at minFrames = 1 the single-slot pair appears; the misaligned never
    val loose = Multimodal.videoPairsFromFramePairs(framePairs, "id_a", "id_b",
        minFrames = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(loose == Set((1L, 2L, 2L), (1L, 4L, 1L)))
  }

  test("video dedup end-to-end: same-group variants form 4-cliques, cross-group none") {
    import spark.implicits._
    // the q199 fixture in miniature: 2 groups x 4 odd-pixel variants
    val media = (0L until 8L).map { id =>
      val frames = (0 until 4).map { j =>
        val img = Multimodal.keyedGradientRaster((id / 4) * 7 + 3 * j + 1, 16, 12)
        Multimodal.encodePng(
          Multimodal.perturbPixel(img, 1 + 2 * (id % 4).toInt, 1, 97 + j))
      }
      (id, Multimodal.encodeVideo(frames, frameMs = 1000L))
    }.toDF("media_id", "payload")
    val fidSigs = Multimodal.videoFrameHashTable(media, stepMs = 2000L)
      .select(Multimodal.videoFrameKey(col("media_id"), col("frame_idx"))
        .as("fid"), col("fhash"))
    val pairs = Multimodal.videoPairsFromFramePairs(
        Dedup.hammingNearDupFromSig(fidSigs, "fid", "fhash",
          bits = 48, bands = 4, maxHamming = 3)
          .select(col("id_a"), col("id_b")),
        "id_a", "id_b", minFrames = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = (for {
      g <- 0L to 1L; i <- 0L until 4L; j <- i + 1 until 4L
    } yield (g * 4 + i, g * 4 + j, 2L)).toSet
    assert(pairs == expected)
  }
}
