package graft.ops

import graft.SparkSpec
import graft.warehouse.Scd2
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import java.sql.Timestamp

/** Seeded random-input properties for the round-2 operators, each checked
  * against an independent reference implementation (naive join for the
  * range join, driver-side union-find for connected components) or a
  * structural invariant (SCD-2 run algebra).
  */
class OpsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A](gen: Gen[A], n: Int = 8)(f: A => Unit): Unit =
    (1 to n).foreach { i => f(gen.pureApply(Gen.Parameters.default, Seed(i.toLong))) }

  // ------------------------------------------------------------- range join

  private val rangeCase: Gen[(List[(Long, Double)], List[(Long, Double, Double)], Double)] =
    for {
      values <- Gen.listOfN(40, Gen.choose(-50.0, 150.0))
      ivs <- Gen.listOfN(8, for {
        lo <- Gen.choose(-60.0, 140.0)
        w <- Gen.choose(0.5, 45.0)
      } yield (lo, lo + w))
      bw <- Gen.oneOf(1.0, 3.7, 10.0, 80.0)
    } yield (
      values.zipWithIndex.map { case (v, i) => (i.toLong, v) },
      ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) },
      bw)

  test("property: intervalJoin == naive BETWEEN join for random intervals/widths") {
    forAll(rangeCase) { case (probe, ivs, bw) =>
      val p = probe.toDF("id", "v")
      val iv = ivs.toDF("iv", "lo", "hi")
      val got = RangeJoin.intervalJoin(p, "v", iv, "lo", "hi", bw)
        .select("id", "iv").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (id, v) <- probe
        (ivId, lo, hi) <- ivs
        if v >= lo && v < hi
      } yield (id, ivId)).toSet
      assert(got == want, s"bucketWidth=$bw")
    }
  }

  // ------------------------------------------------- connected components

  private val edgeGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(25, for {
      a <- Gen.choose(1L, 18L)
      b <- Gen.choose(1L, 18L)
      if a != b
    } yield (math.min(a, b), math.max(a, b)))

  /** Driver-side union-find — the independent reference. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("property: duplicateClusters == driver-side union-find on random graphs") {
    forAll(edgeGen, n = 6) { edges =>
      if (edges.nonEmpty) {
        val got = Dedup.duplicateClusters(edges.toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == unionFind(edges))
      }
    }
  }

  // ------------------------------------------------------------ as-of joins

  /** Left rows (key, t, id); right rows (key, rt, payload) with (key, rt)
    * unique and payload a pure function of (key, rt). Times are drawn
    * from a small range so equal-timestamp ties occur constantly — the
    * tie semantics (as-of matches same-instant rows on BOTH directions)
    * are exactly what the naive reference pins.
    */
  private val asofCase: Gen[(List[(Long, Int, Long)], List[(Long, Int, Double)])] =
    for {
      nL <- Gen.choose(5, 25)
      left <- Gen.listOfN(nL, for {
        k <- Gen.choose(1L, 3L); t <- Gen.choose(0, 20)
      } yield (k, t))
      right <- Gen.listOfN(30, for {
        k <- Gen.choose(1L, 3L); t <- Gen.choose(0, 20)
      } yield (k, t))
    } yield (
      left.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) },
      right.distinct.map { case (k, t) => (k, t, k * 100.0 + t) })

  test("property: asOfForward == naive earliest-later subquery (ties included)") {
    forAll(asofCase, n = 8) { case (left, right) =>
      val got = AsOfJoin.asOfForward(
          left.toDF("k", "t", "lid"), right.toDF("k", "rt", "v"),
          Seq("k"), "t", "rt")
        .select("lid", "asof_rt", "asof_v").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
      val want = left.flatMap { case (k, lt, id) =>
        val cands = right.filter(r => r._1 == k && r._2 >= lt)
        if (cands.isEmpty) None
        else { val m = cands.minBy(_._2); Some((id, m._2, m._3)) }
      }.toSet
      assert(got == want)
    }
  }

  test("property: asOf (backward) == naive latest-earlier subquery (ties included)") {
    forAll(asofCase, n = 8) { case (left, right) =>
      val got = AsOfJoin.asOf(
          left.toDF("k", "t", "lid"), right.toDF("k", "rt", "v"),
          Seq("k"), "t", "rt")
        .select("lid", "asof_rt", "asof_v").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
      val want = left.flatMap { case (k, lt, id) =>
        val cands = right.filter(r => r._1 == k && r._2 <= lt)
        if (cands.isEmpty) None
        else { val m = cands.maxBy(_._2); Some((id, m._2, m._3)) }
      }.toSet
      assert(got == want)
    }
  }

  test("property: time-bucketed asOf/asOfForward == unbucketed (skew path)") {
    // width 7 over times 0..20 → 3 buckets, so carry-ins across bucket
    // boundaries are exercised constantly; width 1000 → single bucket
    // (bucketing must degrade to a no-op); ties included via asofCase
    forAll(asofCase, n = 8) { case (left, right) =>
      val (l, r) = (left.toDF("k", "t", "lid"), right.toDF("k", "rt", "v"))
      for (w <- Seq(7L, 1000L)) {
        def rows(df: org.apache.spark.sql.DataFrame) =
          df.select("lid", "asof_rt", "asof_v").collect()
            .map(x => (x.getLong(0), x.getInt(1), x.getDouble(2))).toSet
        assert(rows(AsOfJoin.asOf(l, r, Seq("k"), "t", "rt",
            bucketSeconds = Some(w))) ==
          rows(AsOfJoin.asOf(l, r, Seq("k"), "t", "rt")),
          s"backward bucketed(w=$w) != unbucketed")
        assert(rows(AsOfJoin.asOfForward(l, r, Seq("k"), "t", "rt",
            bucketSeconds = Some(w))) ==
          rows(AsOfJoin.asOfForward(l, r, Seq("k"), "t", "rt")),
          s"forward bucketed(w=$w) != unbucketed")
      }
    }
  }

  // ------------------------------------------------------------------ SCD-2

  private val attrStream: Gen[List[(Long, String)]] =
    Gen.listOfN(20, for {
      k <- Gen.choose(1L, 4L)
      attr <- Gen.oneOf("A", "B", "C")
    } yield (k, attr))

  test("property: SCD-2 runs chain (valid_to == next valid_from), one current per key") {
    forAll(attrStream, n = 6) { rows =>
      if (rows.nonEmpty) {
        // timestamp = row index + 1 (globally unique): the chain
        // assertions below recover run order from valid_from, which is
        // only unambiguous when starts are distinct
        val df = rows.zipWithIndex.map { case ((k, a), i) =>
          (k, a, Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00"), i.toLong) }
          .toDF("k", "attr", "t", "tie")
        val hist = Scd2.buildHistory(df, "k", "attr", "t", "tie")
          .select("k", "attr", "valid_from", "valid_to", "is_current")
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
            Option(r.getTimestamp(3)), r.getBoolean(4)))
        // exactly one open (current) run per key
        val byKey = hist.groupBy(_._1)
        byKey.foreach { case (k, runs) =>
          assert(runs.count(_._5) == 1, s"key $k: exactly one current run")
          // runs chain: sorted by valid_from, each valid_to equals the
          // next run's valid_from; only the last is open
          val sorted = runs.sortBy(_._3.getTime)
          sorted.sliding(2).foreach {
            case Array(prev, next) => assert(prev._4.contains(next._3), s"key $k chain broken")
            case _ =>
          }
          assert(sorted.last._4.isEmpty)
          // adjacent runs always differ in attribute
          sorted.sliding(2).foreach {
            case Array(prev, next) => assert(prev._2 != next._2, s"key $k merged runs differ")
            case _ =>
          }
        }
      }
    }
  }

  // -------------------------------------------------------- decontamination

  /** Random docs over a tiny vocabulary so k-gram collisions actually
    * occur; split into corpus/benchmark by index parity.
    */
  private val decontCase: Gen[(List[(Long, String)], List[(Long, String)])] =
    for {
      n <- Gen.choose(10, 24)
      docs <- Gen.listOfN(n, Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    } yield {
      val indexed = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      (indexed.filter(_._1 % 2 == 0), indexed.filter(_._1 % 2 == 1))
    }

  test("property: overlapReport == naive distinct k-gram intersection count") {
    forAll(decontCase, n = 6) { case (corpus, bench) =>
      val k = 3
      def shingles(t: String): Set[String] =
        t.split(" ").filter(_.nonEmpty).sliding(k).filter(_.length == k)
          .map(_.mkString(" ")).toSet
      val want = (for {
        (cid, ct) <- corpus
        (bid, bt) <- bench
        ov = (shingles(ct) intersect shingles(bt)).size
        if ov >= 2
      } yield (cid, bid, ov.toLong)).toSet
      val got = Decontamination.overlapReport(
          corpus.toDF("doc_id", "text"), bench.toDF("doc_id", "text"),
          "doc_id", "text", k = k, minOverlap = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want)
    }
  }

  // ------------------------------------------------------- media codecs

  test("property: PCM16 encode∘decode == identity for random sample arrays") {
    val gen = Gen.listOf(Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))
    forAll(gen, n = 12) { xs =>
      val samples = xs.map(_.toShort).toArray
      val back = Multimodal.decodePcm16(Multimodal.encodePcm16(samples))
      assert(back.toSeq == samples.toSeq)
    }
  }

  test("property: PPM resize preserves the nearest-neighbor sampling law") {
    val dims = for {
      sw <- Gen.choose(1, 12); sh <- Gen.choose(1, 12)
      dw <- Gen.choose(1, 12); dh <- Gen.choose(1, 12)
    } yield (sw, sh, dw, dh)
    forAll(dims, n = 12) { case (sw, sh, dw, dh) =>
      // deterministic pixel content keyed by position
      val rgb = Array.tabulate(sw * sh * 3)(i => ((i * 7 + 3) % 256).toByte)
      val src = Multimodal.RasterImage(sw, sh, rgb)
      val out = Multimodal.decodePpm(
        Multimodal.resizeImage(Multimodal.encodePpm(src), dw, dh))
      assert(out.width == dw && out.height == dh)
      for (y <- 0 until dh; x <- 0 until dw; c <- 0 until 3) {
        val s = ((y * sh / dh) * sw + (x * sw / dw)) * 3 + c
        assert(out.rgb((y * dw + x) * 3 + c) == rgb(s),
          s"pixel ($x,$y) channel $c for ${sw}x$sh -> ${dw}x$dh")
      }
    }
  }

  test("property: PPM decode rejects any single-byte header truncation") {
    val img = Multimodal.RasterImage(3, 2, Array.tabulate(18)(_.toByte))
    val full = Multimodal.encodePpm(img)
    // every strict prefix that cuts into pixel data (or header) must throw
    for (cut <- 1 until full.length) {
      intercept[IllegalArgumentException](
        Multimodal.decodePpm(full.take(full.length - cut)))
    }
  }

  // ------------------------------------------------------ round-7 operators

  private val corpusCase: Gen[List[(Long, String)]] = {
    val word = Gen.oneOf("a", "b", "c", "d", "e")
    for {
      n <- Gen.choose(6, 18)
      docs <- Gen.listOfN(n, Gen.choose(0, 9).flatMap(len =>
        Gen.listOfN(len, word).map(_.mkString(" "))))
    } yield docs.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
  }

  test("property: token entropy bounded by ln(distinct), permutation-invariant") {
    forAll(corpusCase) { docs =>
      val df = docs.toDF("doc_id", "text")
      val h = TextAnalysis.tokenEntropy(df, "doc_id", "text")
        .as[(Long, Double)].collect().toMap
      docs.foreach { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty)
        if (toks.isEmpty) assert(!h.contains(id))
        else {
          val hd = h(id)
          assert(hd >= -1e-9, s"entropy must be non-negative, got $hd")
          assert(hd <= math.log(toks.distinct.length.toDouble) + 1e-6,
            s"entropy exceeds ln(distinct) for doc $id")
          // permutation invariance: H is a function of the multiset
          val perm = toks.reverse.mkString(" ")
          val hp = TextAnalysis.tokenEntropy(
            Seq((id, perm)).toDF("doc_id", "text"), "doc_id", "text")
            .as[(Long, Double)].collect().head._2
          assert(hp == hd, s"entropy must be token-order invariant")
        }
      }
    }
  }

  test("property: containment ratios in (0,1], superset direction reaches 1") {
    forAll(corpusCase) { docs =>
      val df = docs.toDF("doc_id", "text")
      val out = Dedup.containmentNearDup(df, "doc_id", "text", threshold = 0.0)
        .as[(Long, Long, Double, Double)].collect()
      out.foreach { case (a, b, cab, cba) =>
        assert(a < b)
        assert(cab > 0 && cab <= 1.0 + 1e-12, s"cont($a in $b)=$cab out of range")
        assert(cba > 0 && cba <= 1.0 + 1e-12, s"cont($b in $a)=$cba out of range")
      }
    }
  }

  test("property: cross dedup == side-filtered full dedup on random corpora") {
    forAll(corpusCase, n = 5) { docs =>
      val df = docs.toDF("doc_id", "text")
      val newDf = df.filter(col("doc_id") % 3 === 0)
      val oldDf = df.filter(col("doc_id") % 3 =!= 0)
      val cross = Dedup.crossJaccardNearDup(newDf, oldDf, "doc_id", "text",
          threshold = 0.2)
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, j) => (math.min(a, b), math.max(a, b), j) }.toSet
      val full = Dedup.jaccardNearDup(df, "doc_id", "text", threshold = 0.2)
        .as[(Long, Long, Double)].collect()
        .filter { case (a, b, _) => (a % 3 == 0) != (b % 3 == 0) }.toSet
      assert(cross == full)
    }
  }

  test("law: dedup against folded index == dedup against recomputed corpus ∪ survivors") {
    forAll(corpusCase, n = 5) { docs =>
      val df = docs.toDF("doc_id", "text")
      val corpus = df.filter(col("doc_id") % 3 === 0)
      val batch1 = df.filter(col("doc_id") % 3 === 1)
      val batch2 = df.filter(col("doc_id") % 3 === 2)
      val thr = 0.2
      // incremental path: build → dedup b1 → fold survivors → dedup b2
      val ix0 = Dedup.buildShingleIndex(corpus, "doc_id", "text")
      val sh1 = Dedup.shingleTable(batch1, "doc_id", "text", 3).localCheckpoint()
      val pairs1 = Dedup.dedupAgainstIndex(sh1, ix0, "doc_id", thr, maxShingleDf = 2)
      val survivors1 = batch1.select(col("doc_id"))
        .join(pairs1.select(col("new_id").as("doc_id")), Seq("doc_id"), "left_anti")
      val ix1 = Dedup.foldIn(ix0, sh1, survivors1, "doc_id")
      val got = Dedup.dedupAgainstIndex(
          Dedup.shingleTable(batch2, "doc_id", "text", 3), ix1, "doc_id",
          thr, maxShingleDf = 2)
        .as[(Long, Long, Double)].collect().toSet
      // from-scratch path: the same dedup against corpus ∪ survivors,
      // recomputed with no maintained state (maxShingleDf deliberately
      // tiny so the df-merge arithmetic is actually exercised)
      val scratch = corpus.unionByName(
        batch1.join(survivors1, Seq("doc_id"), "leftsemi"))
      val want = Dedup.crossJaccardNearDup(batch2, scratch, "doc_id", "text",
          threshold = thr, shingleK = 3, maxShingleDf = 2)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == want,
        s"incremental != from-scratch: extra=${got -- want} missing=${want -- got}")
    }
  }

  test("law: foldIn with zero survivors is identity for subsequent dedup") {
    forAll(corpusCase, n = 3) { docs =>
      val df = docs.toDF("doc_id", "text")
      val corpus = df.filter(col("doc_id") % 3 === 0)
      val batch1 = df.filter(col("doc_id") % 3 === 1)
      val batch2 = df.filter(col("doc_id") % 3 === 2)
      val ix0 = Dedup.buildShingleIndex(corpus, "doc_id", "text")
      val sh1 = Dedup.shingleTable(batch1, "doc_id", "text", 3).localCheckpoint()
      val ix1 = Dedup.foldIn(ix0, sh1, batch1.select(col("doc_id")).limit(0), "doc_id")
      val sh2 = Dedup.shingleTable(batch2, "doc_id", "text", 3).localCheckpoint()
      def run(ix: Dedup.ShingleIndex) =
        Dedup.dedupAgainstIndex(sh2, ix, "doc_id", threshold = 0.2, maxShingleDf = 2)
          .as[(Long, Long, Double)].collect().toSet
      assert(run(ix1) == run(ix0),
        "an all-duplicate batch (nothing folded) must leave the index's behavior unchanged")
    }
  }

  test("property: semDedup components == union-find over cell-restricted pairs; one keeper each") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.semDedup(emb, "vec_id", "embedding")
      .as[(Long, Long, Long, Boolean)].collect()
    // independent reference: the same (cell ∧ cosine-pair) edge set via
    // the operator's own building blocks, closed by driver union-find
    val cells = out.map { case (id, cell, _, _) => id -> cell }.toMap
    val pairs = Similarity
      .nearDupPairs(emb, "vec_id", "embedding", threshold = 0.35, numPlanes = 8)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect()
      .filter { case (a, b) => cells(a) == cells(b) }
    val rep = unionFind(pairs.toSeq)
    out.foreach { case (id, _, semRep, isKeeper) =>
      val want = rep.getOrElse(id, id)
      assert(semRep == want, s"vec $id: sem_rep $semRep != union-find $want")
      assert(isKeeper == (semRep == id), s"vec $id: keeper flag inconsistent")
    }
    // exactly one keeper per component, and every component has one
    val byRep = out.groupBy(_._3)
    byRep.foreach { case (r, members) =>
      assert(members.count(_._4) == 1, s"component $r keeper count != 1")
    }
  }
}
