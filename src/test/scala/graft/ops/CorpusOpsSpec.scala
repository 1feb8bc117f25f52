package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-6 operator suite: exact n-gram Jaccard, bloom-pruned semi
  * join, count-min heavy hitters, BM25, robust outliers, PageRank.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------- exact n-gram Jaccard

  test("jaccardNearDup: complete exact pair set at threshold") {
    val docs = Seq(
      (1L, "a b c d e"), // shingles: {a b c, b c d, c d e}
      (2L, "a b c d e"), // identical -> jaccard 1.0 with 1
      (3L, "a b c d x"), // {a b c, b c d, c d x} -> 2/4 = 0.5 with 1/2
      (4L, "z z z z z"), // {z z z} -> disjoint
      (5L, "q r"),       // too short for 3-shingles
    ).toDF("doc_id", "text")
    val out = Dedup.jaccardNearDup(docs, "doc_id", "text", threshold = 0.5)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 2L, 1.0), (1L, 3L, 0.5), (2L, 3L, 0.5)))
  }

  test("jaccardNearDup matches naive all-pairs Jaccard on a random-ish corpus") {
    val words = Seq("a", "b", "c", "d", "e", "f")
    val docs = (1L to 24L).map { i =>
      val toks = (0 until 8).map(j => words(((i * 7 + j * 5) % 6).toInt))
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val fast = Dedup.jaccardNearDup(docs, "doc_id", "text", threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    // naive: exact Jaccard over distinct 3-shingle sets, all pairs
    val sets = docs.as[(Long, String)].collect().map { case (id, text) =>
      val t = text.split(" ").filter(_.nonEmpty)
      id -> t.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    val naive = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) intersect sets(b)).size
      if inter > 0
      j = inter.toDouble / (sets(a).size + sets(b).size - inter)
      if j >= 0.3
    } yield (a, b, j)).toSet
    assert(fast == naive)
  }

  test("jaccardNearDup: maxShingleDf drops stop-shingle candidate fan-out only") {
    // 'x x x' appears in every doc (stop shingle); the real pair shares more
    val docs = Seq(
      (1L, "x x x a b c d"),
      (2L, "x x x a b c e"),
      (3L, "x x x q r s t"),
    ).toDF("doc_id", "text")
    val capped = Dedup.jaccardNearDup(docs, "doc_id", "text",
      threshold = 0.3, maxShingleDf = 2)
    // pair (1,2) still found via its uncapped shared shingles (x x a/x a b/a b c)
    val ids = capped.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(ids.contains((1L, 2L)))
    // doc 3 shares ONLY the capped stop-shingle with 1/2 -> no pair survives
    assert(!ids.exists(p => p._1 == 3L || p._2 == 3L))
  }

  // --------------------------------------------------- n-gram containment

  test("containmentNearDup: subset doc scores 1.0 where Jaccard stays low") {
    val docs = Seq(
      (1L, "a b c d"),                               // shingles {abc, bcd} — inside 2
      (2L, "a b c d e f g h i j k l m n o p q r"),   // long superset
      (3L, "z y x w v u"),                           // unrelated
    ).toDF("doc_id", "text")
    val out = Dedup.containmentNearDup(docs, "doc_id", "text", threshold = 0.9)
      .as[(Long, Long, Double, Double)].collect()
    assert(out.toSeq == Seq((1L, 2L, 1.0, 2.0 / 16.0)))
    // the same pair is invisible to Jaccard at any reasonable threshold
    val jac = Dedup.jaccardNearDup(docs, "doc_id", "text", threshold = 0.5)
      .count()
    assert(jac == 0)
  }

  test("containmentNearDup matches naive directional containment") {
    val words = Seq("a", "b", "c", "d", "e", "f")
    val docs = (1L to 20L).map { i =>
      val len = 4 + (i % 5).toInt
      (i, (0 until len).map(j => words(((i * 7 + j * 5) % 6).toInt)).mkString(" "))
    }.toDF("doc_id", "text")
    val fast = Dedup.containmentNearDup(docs, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double, Double)].collect().toSet
    val sets = docs.as[(Long, String)].collect().map { case (id, text) =>
      id -> text.split(" ").filter(_.nonEmpty)
        .sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    val naive = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) intersect sets(b)).size
      if inter > 0
      ca = inter.toDouble / sets(a).size
      cb = inter.toDouble / sets(b).size
      if math.max(ca, cb) >= 0.5
    } yield (a, b, ca, cb)).toSet
    assert(fast == naive)
  }

  test("crossJaccardNearDup equals the cross-pair restriction of the full dedup") {
    val words = Seq("a", "b", "c", "d", "e", "f")
    val docs = (1L to 24L).map { i =>
      (i, (0 until 8).map(j => words(((i * 7 + j * 5) % 6).toInt)).mkString(" "))
    }.toDF("doc_id", "text")
    val newDocs = docs.filter(col("doc_id") % 4 === 1)
    val corpus = docs.filter(col("doc_id") % 4 =!= 1)
    val cross = Dedup.crossJaccardNearDup(newDocs, corpus, "doc_id", "text",
        threshold = 0.3)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (math.min(a, b), math.max(a, b), j) }.toSet
    val full = Dedup.jaccardNearDup(docs, "doc_id", "text", threshold = 0.3)
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => (a % 4 == 1) != (b % 4 == 1) }.toSet
    assert(cross == full && cross.nonEmpty)
  }

  test("tokenEntropy: closed-form cases") {
    val docs = Seq(
      (1L, "x x x x"),          // single token -> H = 0
      (2L, "a b c d"),          // uniform distinct -> H = ln 4
      (3L, "a a b b"),          // two tokens twice -> H = ln 2
      (4L, ""),                 // tokenless -> absent
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(out(1L) == 0.0)
    assert(math.abs(out(2L) - math.log(4)) < 1e-6)
    assert(math.abs(out(3L) - math.log(2)) < 1e-6)
    assert(!out.contains(4L) && out.size == 3)
  }

  test("keepBest: argmax-score keeper per component, singletons keep themselves") {
    val docs = Seq(
      (1L, 10L), (2L, 50L), (3L, 30L), // component {1,2,3} -> keeper 2
      (10L, 7L), (11L, 7L),            // component {10,11}, tied score -> keeper 10
      (20L, 1L),                        // singleton
    ).toDF("id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Dedup.keepBest(docs, "id", pairs, "score")
      .select("id", "cluster_id", "is_keeper")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 1L, false), (2L, 1L, true), (3L, 1L, false),
      (10L, 10L, true), (11L, 10L, false),
      (20L, 20L, true)))
  }

  // ----------------------------------------------- approx-percentile bound

  test("approxPercentileContract: GK rank bound holds; broken bound detected") {
    val df = (1 to 10000).map(i => (i.toLong, if (i % 2 == 0) "g0" else "g1",
      (i * 37 % 9973).toDouble)).toDF("id", "grp", "value")
    val out = Sketches.approxPercentileContract(df, "grp", "value",
      Seq("p50" -> 0.5, "p95" -> 0.95), accuracy = 1000)
      .as[(String, Long, Boolean, Boolean)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq("g0", "g1"))
    assert(out.forall(r => r._2 == 5000L && r._3 && r._4))
    // sanity of the verdict arithmetic: a deliberately wrong "sketch
    // value" (the group's minimum posing as p95) must fail the bound
    val broken = df.groupBy(col("grp")).agg(min(col("value")).as("__ap_p95"))
    val n = df.join(broadcast(broken), "grp")
      .groupBy(col("grp")).agg(
        count(lit(1)).as("n"),
        count(when(col("value") < col("__ap_p95"), 1)).as("lo"),
        count(when(col("value") <= col("__ap_p95"), 1)).as("hi"))
      .select(col("grp"),
        ((col("hi").cast("double") >= lit(0.95 - 0.001) * col("n") - 1) &&
          (col("lo").cast("double") <= lit(0.95 + 0.001) * col("n") + 1)).as("ok"))
      .as[(String, Boolean)].collect()
    assert(n.forall(!_._2), "minimum-as-p95 must violate the rank bound")
  }

  // ------------------------------------------------------ bloom-pruned join

  test("BloomPrune.semiJoin equals the plain semi join") {
    val fact = (1L to 500L).map(i => (i, i % 7)).toDF("k", "v")
    val keys = Seq(3L, 9L, 27L, 81L, 243L, 999L).toDF("key")
    val got = BloomPrune.semiJoin(fact, "k", keys, "key")
      .orderBy("k").as[(Long, Long)].collect().toSeq
    val want = fact.join(keys, col("k") === col("key"), "left_semi")
      .orderBy("k").as[(Long, Long)].collect().toSeq
    assert(got == want)
    assert(got.map(_._1) == Seq(3L, 9L, 27L, 81L, 243L))
  }

  test("BloomContains: no false negatives; prunes most non-members") {
    val keys = (0L until 200L).map(i => i * 13).toDF("key")
    val bytes = BloomPrune.buildFilter(keys, "key", fpp = 0.01)
    graft.functions.GraftFunctions.register(spark)
    val probes = (0L until 5000L).toDF("k")
      .select(col("k"),
        call_function("graft_bloom_contains", col("k"), lit(bytes)).as("hit"))
      .as[(Long, Boolean)].collect()
    val members = probes.filter(p => p._1 % 13 == 0 && p._1 / 13 < 200)
    assert(members.forall(_._2), "bloom filters must have no false negatives")
    val nonMembers = probes.filterNot(p => p._1 % 13 == 0 && p._1 / 13 < 200)
    val fpRate = nonMembers.count(_._2).toDouble / nonMembers.length
    assert(fpRate < 0.05, s"false-positive rate $fpRate far above fpp")
  }

  test("BloomPrune.semiJoin: string keys — insert/probe representations agree") {
    // regression: the round-6 shape inserted native-typed keys but probed
    // cast("long"); string keys produced null probes -> every true match
    // silently dropped (false negatives). Canonicalization fixes it.
    val fact = (1 to 300).map(i => (s"user$i", i)).toDF("uid", "v")
    val keys = Seq("user7", "user70", "user170", "ghost").toDF("key")
    val got = BloomPrune.semiJoin(fact, "uid", keys, "key")
      .orderBy("uid").as[(String, Int)].collect().toSeq
    val want = fact.join(keys, col("uid") === col("key"), "left_semi")
      .orderBy("uid").as[(String, Int)].collect().toSeq
    assert(got == want && got.map(_._1) == Seq("user170", "user7", "user70"))
  }

  test("BloomPrune.semiJoin: int fact key against long key column still matches") {
    val fact = (1 to 100).map(i => (i, i * 2)).toDF("k", "v") // k is Int
    val keys = Seq(3L, 9L, 999L).toDF("key")                  // key is Long
    val got = BloomPrune.semiJoin(fact, "k", keys, "key")
      .orderBy("k").select("k").as[Int].collect().toSeq
    assert(got == Seq(3, 9))
  }

  test("BloomPrune.semiJoin rejects mixed integral/non-integral key pairs") {
    val fact = Seq((1L, "x")).toDF("k", "v")
    val keys = Seq("1").toDF("key")
    val e = intercept[IllegalArgumentException] {
      BloomPrune.semiJoin(fact, "k", keys, "key")
    }
    assert(e.getMessage.contains("integral"))
  }

  // --------------------------------------------------- count-min heavy hits

  test("cmsHeavyHitters: exact top-k with contract satisfied") {
    // zipf-ish: item i appears 200/i times
    val items = (1 to 20).flatMap(i => Seq.fill(200 / i)(s"term$i"))
      .toDF("tok")
    val out = Sketches.cmsHeavyHitters(items, "tok", k = 5, eps = 0.001)
      .as[(String, Long, Boolean)].collect()
    assert(out.length == 5)
    assert(out.map(_._1).head == "term1")
    assert(out.map(_._2).toSeq == Seq(200L, 100L, 66L, 50L, 40L))
    assert(out.forall(_._3), "CMS estimates must satisfy the epsilon contract")
  }

  // ------------------------------------------------------------------- bm25

  test("bm25TopK: tf saturation and idf ordering behave") {
    val docs = Seq(
      (1L, "spark spark spark spark filler filler filler filler"),
      (2L, "spark filler filler filler filler filler filler filler"),
      (3L, "rare filler filler filler filler filler filler filler"),
      (4L, "filler a b c d e f g"),
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      query = Seq("spark", "rare"), k = 10)
      .as[(Long, Double)].collect()
    val score = out.toMap
    // doc3's term is rarer (df 1 vs 2) than doc2's -> higher idf, same tf/dl
    assert(score(3L) > score(2L))
    // more tf beats less tf at the same df/dl
    assert(score(1L) > score(2L))
    // doc4 matches nothing -> absent
    assert(!score.contains(4L) && out.length == 3)
  }

  test("bm25 stored index: serve-from-index == from-text; append == write on the union") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val query = Seq("vector", "stream", "window")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles match {
        case null => ()
        case kids => kids.foreach(rm)
      }
      f.delete(); ()
    }
    val pW = s"${sys.props("java.io.tmpdir")}/graft_bm25_spec_w"
    val pA = s"${sys.props("java.io.tmpdir")}/graft_bm25_spec_a"
    rm(new java.io.File(pW)); rm(new java.io.File(pA))
    Retrieval.writeBm25Index(docs, "doc_id", "text", pW)
    // ingest shape: half written, half appended — postings/lens/stats
    // all pure appends, stats as delta rows summed at read
    Retrieval.writeBm25Index(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", pA)
    Retrieval.appendToBm25Index(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", pA)
    assert(spark.read.parquet(s"$pA/stats").count() == 2) // two delta rows
    def top(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fromText = top(Retrieval.bm25TopK(docs, "doc_id", "text", query, k = 20))
    val fromIx = top(Retrieval.bm25FromIndex(spark, pW, "doc_id", query, k = 20))
    val fromIngest = top(Retrieval.bm25FromIndex(spark, pA, "doc_id", query, k = 20))
    assert(fromIx == fromText)
    assert(fromIngest == fromText)
    assert(fromText.nonEmpty)
    rm(new java.io.File(pW)); rm(new java.io.File(pA))
  }

  test("bm25 bucketed index: serve == from-text; append routes through the frozen bucket map") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val query = Seq("vector", "stream", "window")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles match {
        case null => ()
        case kids => kids.foreach(rm)
      }
      f.delete(); ()
    }
    val pB = s"${sys.props("java.io.tmpdir")}/graft_bm25_spec_tb"
    rm(new java.io.File(pB))
    Retrieval.writeBm25Index(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", pB, termBuckets = 16)
    // append must read the bucket count from _layout, not a parameter
    Retrieval.appendToBm25Index(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", pB)
    assert(Retrieval.layoutOf(spark, pB) == 16)
    // the postings tree is tb=-partitioned, every term row in its
    // md5-mapped bucket (write AND append paths)
    val misrouted = spark.read.parquet(s"$pB/postings")
      .select(col("term"), col("tb").cast("string").as("tb")).distinct()
      .collect()
      .filter(r => Retrieval.termBucketOf(r.getString(0), 16) != r.getString(1))
    assert(misrouted.isEmpty, s"misrouted terms: ${misrouted.take(5).mkString(",")}")
    def top(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fromText = top(Retrieval.bm25TopK(docs, "doc_id", "text", query, k = 20))
    assert(top(Retrieval.bm25FromIndex(spark, pB, "doc_id", query, k = 20))
      == fromText)
    rm(new java.io.File(pB))
  }

  test("bm25 append: re-appending indexed docs is an idempotent no-op") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val query = Seq("vector", "stream", "window")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles match {
        case null => ()
        case kids => kids.foreach(rm)
      }
      f.delete(); ()
    }
    val p = s"${sys.props("java.io.tmpdir")}/graft_bm25_spec_idem"
    rm(new java.io.File(p))
    Retrieval.writeBm25Index(docs, "doc_id", "text", p)
    val before = Retrieval.bm25FromIndex(spark, p, "doc_id", query, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // the whole corpus again: without the anti-join guard this would
    // double every dl/df/tf and fan out the serve-time tf join
    Retrieval.appendToBm25Index(docs, "doc_id", "text", p)
    val after = Retrieval.bm25FromIndex(spark, p, "doc_id", query, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after == before, "duplicate re-append must not change scores")
    // the duplicate batch added no lens rows and a zero stats delta
    assert(spark.read.parquet(s"$p/lens").count() == docs.count())
    val st = spark.read.parquet(s"$p/stats")
      .agg(sum(col("n_docs")), sum(col("sum_dl"))).head()
    assert(st.getLong(0) == docs.count())
    rm(new java.io.File(p))
  }

  test("bm25 append: torn batch (guard rows landed, postings not) — retry never double-counts") {
    // the crash window the r16 write order leaves: lens (the guard key)
    // commits first, so a crash before postings leaves a batch whose
    // retry is anti-joined away. The invariant under ANY tear+retry is
    // "no document's tf/dl is ever counted twice" — the old
    // postings-first order violated it (retry re-appended postings for
    // docs with no lens row, permanently doubling their tf)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles match {
        case null => ()
        case kids => kids.foreach(rm)
      }
      f.delete(); ()
    }
    val p = s"${sys.props("java.io.tmpdir")}/graft_bm25_spec_torn"
    rm(new java.io.File(p))
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    Retrieval.writeBm25Index(a, "doc_id", "text", p)
    // simulate the crash: batch b's lens rows land, nothing else does
    graft.ops.TextAnalysis.tokenTable(b, "doc_id", "text")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(s"$p/lens")
    // the retry: the guard sees b as indexed and must no-op
    Retrieval.appendToBm25Index(b, "doc_id", "text", p)
    val postDocs = spark.read.parquet(s"$p/postings")
      .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(postDocs.forall(_ % 2 == 0),
      "torn batch must stay out of postings after a retry — never half in")
    // lens rows counted exactly once per doc (no doubling either side)
    val lensDup = spark.read.parquet(s"$p/lens")
      .groupBy("doc_id").count().filter(col("count") > 1).count()
    assert(lensDup == 0, "a retried torn batch must not duplicate lens rows")
    // scoring still works and only sees the fully-committed half
    val top = Retrieval.bm25FromIndex(spark, p, "doc_id",
      Seq("vector", "stream", "window"), k = 20).collect()
    assert(top.nonEmpty && top.forall(_.getLong(0) % 2 == 0))
    rm(new java.io.File(p))
  }

  test("shingle-store delete: mask == never-shingled; purge physical; df deltas exact") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles match {
        case null => ()
        case kids => kids.foreach(rm)
      }
      f.delete(); ()
    }
    def pairs(p: String) = Dedup.jaccardFromIndex(
        Dedup.readStoredIndex(spark, "doc_id", p), "doc_id",
        threshold = 0.5, maxShingleDf = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    val pDel = s"${sys.props("java.io.tmpdir")}/graft_shingle_spec_del"
    val pRef = s"${sys.props("java.io.tmpdir")}/graft_shingle_spec_del_ref"
    rm(new java.io.File(pDel)); rm(new java.io.File(pRef))
    val doomedIds = docs.filter(col("doc_id") % 5 === 2).select(col("doc_id"))
    Dedup.writeStoredIndex(
      Dedup.buildShingleIndex(docs, "doc_id", "text", 3), "doc_id", pDel)
    Dedup.writeStoredIndex(
      Dedup.buildShingleIndex(docs.filter(col("doc_id") % 5 =!= 2),
        "doc_id", "text", 3), "doc_id", pRef)
    val ref = pairs(pRef)
    Dedup.deleteFromStoredIndex(doomedIds, "doc_id", pDel)
    assert(pairs(pDel) == ref, "masked index must equal never-shingled")
    // double delete + unknown-id delete: no-ops (df must not go
    // double-negative)
    Dedup.deleteFromStoredIndex(doomedIds, "doc_id", pDel)
    Dedup.deleteFromStoredIndex(
      spark.range(1000000, 1000005).toDF("doc_id"), "doc_id", pDel)
    assert(pairs(pDel) == ref)
    // masked df delta sum == exact survivor df (the negative deltas
    // subtract precisely what the deleted docs contributed)
    val dfMasked = Dedup.readStoredIndex(spark, "doc_id", pDel).dfs
      .filter(col("df") > 0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dfRef = Dedup.readStoredIndex(spark, "doc_id", pRef).dfs
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfMasked == dfRef, "summed df deltas must equal survivor dfs")
    // purge: physical removal, dfs recomputed, tombstones cleared
    Dedup.purgeStoredIndex(spark, "doc_id", pDel)
    assert(pairs(pDel) == ref, "purge must not change the pair relation")
    assert(!new java.io.File(s"$pDel/tombstones").exists)
    assert(spark.read.parquet(s"$pDel/postings")
      .filter(col("doc_id") % 5 === 2).count() == 0)
    assert(spark.read.parquet(s"$pDel/sizes")
      .filter(col("doc_id") % 5 === 2).count() == 0)
    val dfPurged = spark.read.parquet(s"$pDel/dfs")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfPurged == dfRef, "purged dfs must be the exact survivor dfs")
    rm(new java.io.File(pDel)); rm(new java.io.File(pRef))
  }

  test("bucketed shingle store: pruned probe == flat decisions across append/delete/compact/purge") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles match {
        case null => ()
        case kids => kids.foreach(rm)
      }
      f.delete(); ()
    }
    val pB = s"${sys.props("java.io.tmpdir")}/graft_shingle_spec_bkt"
    val pF = s"${sys.props("java.io.tmpdir")}/graft_shingle_spec_bkt_ref"
    rm(new java.io.File(pB)); rm(new java.io.File(pF))
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val odds = docs.filter(col("doc_id") % 2 === 1)
    val oddSh = Dedup.shingleTable(odds, "doc_id", "text", 3).localCheckpoint()
    // same corpus, two layouts; append half so the bucketed append path
    // (layout-read, sb-partitioned dfs/postings) is exercised too
    def build(p: String, buckets: Int): Unit = {
      Dedup.writeStoredIndex(
        Dedup.buildShingleIndex(evens.filter(col("doc_id") % 4 === 0),
          "doc_id", "text", 3), "doc_id", p, shBuckets = buckets)
      Dedup.appendToStoredIndex(
        Dedup.shingleTable(evens.filter(col("doc_id") % 4 === 2),
          "doc_id", "text", 3),
        evens.filter(col("doc_id") % 4 === 2).select(col("doc_id")),
        "doc_id", p)
    }
    build(pB, 16); build(pF, 0)
    // the bucketed relation is physically partitioned
    assert(new java.io.File(s"$pB/postings").listFiles
      .exists(_.getName.startsWith("sb=")), "postings must be sb-partitioned")
    def probePruned() = Dedup.dedupAgainstStoredIndex(oddSh, "doc_id", pB,
        threshold = 0.5, maxShingleDf = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    def probeFlat(p: String) = Dedup.dedupAgainstIndex(oddSh,
        Dedup.readStoredIndex(spark, "doc_id", p), "doc_id",
        threshold = 0.5, maxShingleDf = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    val ref = probeFlat(pF)
    assert(ref.nonEmpty)
    assert(probePruned() == ref, "pruned probe must equal the flat layout's")
    assert(probeFlat(pB) == ref, "full read of the bucketed store must agree too")
    // the partition IN-list must land as a PartitionFilters entry
    val plan = Dedup.dedupAgainstStoredIndex(oddSh, "doc_id", pB,
        threshold = 0.5, maxShingleDf = 1000)
      .queryExecution.executedPlan.toString
    val scan = plan.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("sb"))
    assert(scan.isDefined, s"no sb PartitionFilters entry in the probe scan:\n$plan")
    // delete + compact + purge preserve decisions under the layout
    val doomed = evens.filter(col("doc_id") % 8 === 0).select(col("doc_id"))
    Dedup.deleteFromStoredIndex(doomed, "doc_id", pB)
    Dedup.deleteFromStoredIndex(doomed, "doc_id", pF)
    val refDel = probeFlat(pF)
    assert(probePruned() == refDel, "masked bucketed probe must track the flat one")
    Dedup.compactStoredDfs(spark, pB)
    assert(probePruned() == refDel, "bucketed dfs compaction must be semantics-neutral")
    Dedup.purgeStoredIndex(spark, "doc_id", pB)
    assert(probePruned() == refDel, "bucketed purge must be semantics-neutral")
    assert(new java.io.File(s"$pB/postings").listFiles
      .exists(_.getName.startsWith("sb=")),
      "purge must rewrite under the same bucketed layout")
    rm(new java.io.File(pB)); rm(new java.io.File(pF))
  }

  test("bm25 delete: tombstone mask == never-ingested; purge physical; double-delete no-op") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val query = Seq("vector", "stream", "window")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles match {
        case null => ()
        case kids => kids.foreach(rm)
      }
      f.delete(); ()
    }
    def top(p: String) = Retrieval.bm25FromIndex(spark, p, "doc_id", query, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val pDel = s"${sys.props("java.io.tmpdir")}/graft_bm25_spec_del"
    val pRef = s"${sys.props("java.io.tmpdir")}/graft_bm25_spec_del_ref"
    rm(new java.io.File(pDel)); rm(new java.io.File(pRef))
    val survivors = docs.filter(col("doc_id") % 5 =!= 2)
    val doomedIds = docs.filter(col("doc_id") % 5 === 2).select(col("doc_id"))
    Retrieval.writeBm25Index(docs, "doc_id", "text", pDel, termBuckets = 8)
    Retrieval.writeBm25Index(survivors, "doc_id", "text", pRef, termBuckets = 8)
    val ref = top(pRef)
    // tombstone-masked serving == an index that never saw the docs
    Retrieval.deleteFromBm25Index(doomedIds, "doc_id", pDel)
    assert(top(pDel) == ref, "masked serve must equal never-ingested")
    // double delete and unknown-id delete: no-ops (stats must not go
    // double-negative; tombstones must not duplicate)
    Retrieval.deleteFromBm25Index(doomedIds, "doc_id", pDel)
    Retrieval.deleteFromBm25Index(
      spark.range(1000000, 1000005).toDF("doc_id"), "doc_id", pDel)
    assert(top(pDel) == ref, "double/unknown delete must change nothing")
    val st = spark.read.parquet(s"$pDel/stats")
      .agg(sum(col("n_docs")), sum(col("sum_dl"))).head()
    assert(st.getLong(0) == survivors.count(),
      "summed stats deltas must equal the surviving doc count")
    // re-ingesting a tombstoned id is blocked until the purge
    Retrieval.appendToBm25Index(docs.filter(col("doc_id") % 5 === 2),
      "doc_id", "text", pDel)
    assert(top(pDel) == ref, "re-append of tombstoned ids must be blocked")
    // OPTIMIZE purges: rows physically gone, tombstones cleared,
    // stats exact over survivors, scores unchanged
    Retrieval.compactBm25Index(spark, pDel, maxFilesPerBucket = 1)
    assert(top(pDel) == ref, "purge must not change any score")
    assert(!new java.io.File(s"$pDel/tombstones").exists,
      "purge must clear the tombstones")
    assert(spark.read.parquet(s"$pDel/postings")
      .filter(col("doc_id") % 5 === 2).count() == 0)
    assert(spark.read.parquet(s"$pDel/lens")
      .filter(col("doc_id") % 5 === 2).count() == 0)
    assert(spark.read.parquet(s"$pDel/stats").count() == 1)
    // after the purge the id is re-ingestable again
    Retrieval.appendToBm25Index(docs.filter(col("doc_id") % 5 === 2),
      "doc_id", "text", pDel)
    val full = s"${sys.props("java.io.tmpdir")}/graft_bm25_spec_del_full"
    rm(new java.io.File(full))
    Retrieval.writeBm25Index(docs, "doc_id", "text", full, termBuckets = 8)
    assert(top(pDel) == top(full),
      "delete -> purge -> re-append must equal the never-deleted index")
    rm(new java.io.File(pDel)); rm(new java.io.File(pRef)); rm(new java.io.File(full))
  }

  test("bm25 OPTIMIZE: one file per relation after compaction, scores unchanged") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val query = Seq("vector", "stream", "window")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles match {
        case null => ()
        case kids => kids.foreach(rm)
      }
      f.delete(); ()
    }
    val p = s"${sys.props("java.io.tmpdir")}/graft_bm25_spec_opt"
    rm(new java.io.File(p))
    // bootstrap through append (the streaming loop's first batch), then
    // three more appends — every relation fragmented
    for (k <- 0 to 3)
      Retrieval.appendToBm25Index(docs.filter(col("doc_id") % 4 === k),
        "doc_id", "text", p, termBucketsIfNew = 16)
    assert(spark.read.parquet(s"$p/stats").count() == 4)
    val before = Retrieval.bm25FromIndex(spark, p, "doc_id", query, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    Retrieval.compactBm25Index(spark, p, maxFilesPerBucket = 1)
    // postconditions: every tb= dir one part file, stats folded to 1 row
    def partFiles(f: java.io.File) = f.listFiles match {
      case null => Array.empty[java.io.File]
      case kids => kids.filter(k => k.isFile && k.getName.startsWith("part-"))
    }
    val tbDirs = new java.io.File(s"$p/postings").listFiles
      .filter(d => d.isDirectory && d.getName.startsWith("tb="))
    assert(tbDirs.nonEmpty)
    tbDirs.foreach(d => assert(partFiles(d).length <= 1,
      s"${d.getName} still fragmented: ${partFiles(d).length} files"))
    assert(partFiles(new java.io.File(s"$p/lens")).length == 1)
    assert(spark.read.parquet(s"$p/stats").count() == 1)
    val after = Retrieval.bm25FromIndex(spark, p, "doc_id", query, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after == before, "OPTIMIZE is layout-only")
    // idempotent: a second pass finds nothing to compact
    Retrieval.compactBm25Index(spark, p, maxFilesPerBucket = 1)
    assert(Retrieval.bm25FromIndex(spark, p, "doc_id", query, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq == before)
    rm(new java.io.File(p))
  }

  test("bm25BatchFromIndex: per-query slices == each query own bm25TopK; scan count batch-invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles match {
        case null => ()
        case kids => kids.foreach(rm)
      }
      f.delete(); ()
    }
    val p = s"${sys.props("java.io.tmpdir")}/graft_bm25_spec_batch"
    rm(new java.io.File(p))
    Retrieval.writeBm25Index(docs, "doc_id", "text", p, termBuckets = 16)
    val batch = Seq(
      7L -> Seq("vector", "stream", "window"),
      9L -> Seq("spark", "join"))
    val out = Retrieval.bm25BatchFromIndex(spark, p, "doc_id", batch, k = 20)
    val byQ = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (q, rows) => q ->
        rows.map(t => (t._2, t._3)).sortBy(t => (-t._2, t._1)).toSeq }
    for ((qid, terms) <- batch) {
      val single = Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 20)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(byQ(qid) == single, s"batch slice for query $qid diverged")
    }
    // batching cost: postings scan count is a CONSTANT of the plan
    // shape (one scan feeds df, one the scoring join — same as the
    // single-query path), NOT |queries| scans
    def postingsScans(qs: Seq[(Long, Seq[String])]) =
      Retrieval.bm25BatchFromIndex(spark, p, "doc_id", qs, k = 20)
        .queryExecution.executedPlan.toString
        .linesIterator.count(l => l.contains("FileScan") && l.contains("postings"))
    assert(postingsScans(batch) == postingsScans(batch.take(1)),
      "postings scan count must not grow with the batch")
    assert(postingsScans(batch) <= 2)
    rm(new java.io.File(p))
  }

  test("bm25TopK: duplicate query terms count once (term-set semantics)") {
    val docs = Seq(
      (1L, "spark spark spark spark filler filler filler filler"),
      (2L, "spark filler filler filler filler filler filler filler"),
    ).toDF("doc_id", "text")
    val once = Retrieval.bm25TopK(docs, "doc_id", "text",
      query = Seq("spark"), k = 10).as[(Long, Double)].collect().toMap
    val dup = Retrieval.bm25TopK(docs, "doc_id", "text",
      query = Seq("spark", "spark", "spark"), k = 10).as[(Long, Double)].collect().toMap
    assert(dup == once, s"duplicated term must not double-score: $dup vs $once")
  }

  test("bm25: 100-term query — same plan shape, same answer as the 3-term subset") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = Seq("vector", "stream", "window")
    // 97 synthetic terms absent from the corpus: they produce no tf rows,
    // so the top-k must be IDENTICAL to the 3-term query
    val wide = base ++ (1 to 97).map(i => s"zzz_absent_term_$i")
    val narrow = Retrieval.bm25TopK(docs, "doc_id", "text", base, k = 20)
      .as[(Long, Double)].collect().toSeq
    val wideOut = Retrieval.bm25TopK(docs, "doc_id", "text", wide, k = 20)
      .as[(Long, Double)].collect().toSeq
    assert(wideOut == narrow, "absent terms must not perturb scores or order")
    // plan parity: the per-doc stats stay relation-shaped — one corpus
    // scan, no per-term counter columns regardless of |query|
    val p = Retrieval.perDocStats(docs, "doc_id", "text", wide)
      .queryExecution.executedPlan.toString
    assert("FileScan".r.findAllIn(p).length == 1,
      s"perDocStats must tokenize the corpus exactly once:\n$p")
    assert(!p.contains("__tf"),
      s"no per-term counter columns — the aggregate must stay narrow:\n$p")
    val aggLines = p.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.nonEmpty &&
      aggLines.forall(l => "count\\(".r.findAllIn(l).length <= 1),
      s"one count aggregate total, not one per term:\n${aggLines.mkString("\n")}")
  }

  // ------------------------------------------------------------- hybrid rrf

  test("rrfFuse: hand-computed reciprocal-rank sums, membership-asymmetric lists") {
    import org.apache.spark.sql.functions.col
    // sparse ranks: a=1, b=2, c=3; dense ranks: b=1, d=2 — b fuses from
    // both lists, the rest from one
    val sparse = Seq(("a", 9.0), ("b", 5.0), ("c", 1.0)).toDF("id", "score")
    val dense = Seq(("b", 0.9), ("d", 0.7)).toDF("id", "sim")
    val out = Retrieval.rrfFuse(sparse, "score", dense, "sim", "id",
        k = 10, kRrf = 60)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Map(
      "a" -> r6(1.0 / 61), "b" -> r6(1.0 / 62 + 1.0 / 61),
      "c" -> r6(1.0 / 63), "d" -> r6(1.0 / 62)))
    // b leads: two mid ranks beat any single top rank at kRrf = 60
    val top = Retrieval.rrfFuse(sparse, "score", dense, "sim", "id",
      k = 1, kRrf = 60).collect().head.getString(0)
    assert(top == "b")
  }

  test("hybridTopK: equals rrfFuse of the two judged pool cuts") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val terms = Seq("vector", "stream", "window")
    val got = Retrieval.hybridTopK(docs, "doc_id", "text",
        emb, "vec_id", "embedding", terms, queryId = 0L, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val expected = Retrieval.rrfFuse(
        Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 20), "score",
        Similarity.knnBrute(emb, "vec_id", "embedding", 0L, k = 20)
          .withColumnRenamed("vec_id", "doc_id"), "sim",
        "doc_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
    // fused scores are valid RRF sums: each ∈ (0, 2/61]
    assert(got.forall { case (_, s) => s > 0 && s <= 2.0 / 61 + 1e-9 })
  }

  // ------------------------------------------------------------- bigram LM

  test("bigramNll: hand-computed Laplace bigram scores; short docs excluded") {
    val docs = Seq(
      (1L, "a b a b"), // bigrams (a,b)(b,a)(a,b)
      (2L, "a a"),     // bigram (a,a)
      (3L, "a"),       // 1 token -> no bigrams -> excluded
      (4L, "")         // empty -> excluded
    ).toDF("doc_id", "text")
    val out = LanguageModel.bigramNll(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // model: cb(a,b)=2 cb(b,a)=1 cb(a,a)=1; c1(a)=3 c1(b)=1; V=2
    // p(b|a)=(2+1)/(3+2)=0.6  p(a|b)=(1+1)/(1+2)=2/3  p(a|a)=(1+1)/(3+2)=0.4
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: BigDecimal) = x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ab = r9(-math.log(3.0 / 5.0)); val ba = r9(-math.log(2.0 / 3.0))
    val aa = r9(-math.log(2.0 / 5.0))
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((3L, r6((ab + ba + ab) / 3))))
    assert(out(2L) == ((1L, r6(aa))))
  }

  test("writeModel/scoreAgainst: frozen model, closed-form held-out Laplace scores") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_lm_spec_model"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles match {
        case null => ()
        case kids => kids.foreach(rm)
      }
      f.delete(); ()
    }
    rm(new java.io.File(path))
    // train on A: "a b a" + "b a" -> cb(a,b)=1 cb(b,a)=2; c1(a)=1
    // c1(b)=2; V = |{a,b}| = 2
    val train = Seq((1L, "a b a"), (2L, "b a")).toDF("doc_id", "text")
    LanguageModel.writeModel(train, "doc_id", "text", path)
    // the stored model is exactly the frozen counts
    val cb = spark.read.parquet(s"$path/cb")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(cb == Map(("a", "b") -> 1L, ("b", "a") -> 2L))
    val c1 = spark.read.parquet(s"$path/c1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c1 == Map("a" -> 1L, "b" -> 2L))
    assert(spark.read.parquet(s"$path/vocab").head().getLong(0) == 2L)
    // score held-out B = "a b c": (a,b) seen -> (1+1)/(1+2);
    // (b,c) unseen bigram, seen history -> (0+1)/(2+2); the OOV token c
    // does NOT grow V (frozen at training time)
    val heldOut = Seq((7L, "a b c")).toDF("doc_id", "text")
    val got = LanguageModel.scoreAgainst(spark, path, heldOut, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: BigDecimal) = x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = r6((r9(-math.log(2.0 / 3.0)) + r9(-math.log(1.0 / 4.0))) / 2)
    assert(got == Map(7L -> ((2L, expected))))
    // fully-unseen history: (c,d) -> (0+1)/(0+2)
    val got2 = LanguageModel.scoreAgainst(spark, path,
        Seq((8L, "c d")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got2 == Map(8L -> r6(r9(-math.log(1.0 / 2.0)))))
    rm(new java.io.File(path))
  }

  test("scoreAgainst(model trained on X) over X == bigramNll(X): the split changes nothing when self-scored") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_lm_spec_self"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles match {
        case null => ()
        case kids => kids.foreach(rm)
      }
      f.delete(); ()
    }
    rm(new java.io.File(path))
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    LanguageModel.writeModel(docs, "doc_id", "text", path)
    val split = LanguageModel.scoreAgainst(spark, path, docs, "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    val fused = LanguageModel.bigramNll(docs, "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    assert(split == fused)
    assert(split.nonEmpty)
    rm(new java.io.File(path))
  }

  // --------------------------------------------------------- robust outliers

  test("LM count store: batch decomposition + compaction + folded retry == bigramNll") {
    val docs = Seq(
      (1L, "a b a b"), (2L, "a a"), (3L, "b c b"), (4L, "c a b"),
      (5L, "a"), (6L, "")
    ).toDF("doc_id", "text")
    val oneShot = LanguageModel.bigramNll(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val path = s"${sys.props("java.io.tmpdir")}/graft_lm_counts_spec"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(new java.io.File(path))
    try {
      LanguageModel.writeCountBatch(docs.filter($"doc_id" <= 2),
        "doc_id", "text", path, "b0")
      LanguageModel.compactCountModel(spark, path)
      // post-compaction retry of the folded batch: must be a no-op
      LanguageModel.writeCountBatch(docs.filter($"doc_id" <= 2),
        "doc_id", "text", path, "b0")
      LanguageModel.writeCountBatch(docs.filter($"doc_id" > 2),
        "doc_id", "text", path, "b1")
      // same-bid retry before compaction: partition overwritten, not doubled
      LanguageModel.writeCountBatch(docs.filter($"doc_id" > 2),
        "doc_id", "text", path, "b1")
      val stored = LanguageModel.scoreFromCounts(spark, path, docs,
          "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
      assert(stored == oneShot)
    } finally rm(new java.io.File(path))
  }

  test("LM count store: a torn batch (cb landed, tc did not) is invisible until retried") {
    val docs = Seq((1L, "a b a b"), (2L, "a a")).toDF("doc_id", "text")
    val path = s"${sys.props("java.io.tmpdir")}/graft_lm_counts_torn"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(new java.io.File(path))
    try {
      LanguageModel.writeCountBatch(docs, "doc_id", "text", path, "b0")
      val torn = Seq((9L, "q q q")).toDF("doc_id", "text")
      LanguageModel.writeCountBatch(torn, "doc_id", "text", path, "torn")
      // the commit marker (tc/, written LAST) vanishes; cb deltas survive
      rm(new java.io.File(s"$path/counts/tc/bid=torn"))
      val before = LanguageModel.scoreFromCounts(spark, path, docs,
          "doc_id", "text").orderBy("doc_id").collect().toSeq
      assert(before == LanguageModel.bigramNll(docs, "doc_id", "text")
        .orderBy("doc_id").collect().toSeq)
      LanguageModel.writeCountBatch(torn, "doc_id", "text", path, "torn")
      val after = LanguageModel.scoreFromCounts(spark, path,
          docs.union(torn), "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
      assert(after == LanguageModel.bigramNll(docs.union(torn),
        "doc_id", "text").orderBy("doc_id").collect().toSeq)
    } finally rm(new java.io.File(path))
  }

  test("LM unlearn: negative deltas == retrain-without; vocab and history shrink; compaction purges zeros") {
    val keep = Seq((1L, "a b a b"), (2L, "a a")).toDF("doc_id", "text")
    val takedown = Seq((3L, "c d c")).toDF("doc_id", "text")
    val path = s"${sys.props("java.io.tmpdir")}/graft_lm_unlearn_spec"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(new java.io.File(path))
    try {
      LanguageModel.writeCountBatch(keep, "doc_id", "text", path, "keep")
      LanguageModel.writeCountBatch(takedown, "doc_id", "text", path, "td")
      LanguageModel.deleteCountBatch(takedown, "doc_id", "text", path, "del-td")
      // tokens c and d existed ONLY in the takedown: V must shrink 4 -> 2
      val unlearned = LanguageModel.scoreFromCounts(spark, path, keep,
          "doc_id", "text").orderBy("doc_id").collect().toSeq
      val retrained = LanguageModel.bigramNll(keep, "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
      assert(unlearned == retrained)
      // compaction physically drops the zero-summed rows
      LanguageModel.compactCountModel(spark, path)
      assert(spark.read.parquet(s"$path/counts/cb")
        .filter($"w1" === "c" || $"w2" === "c").count() == 0)
      assert(spark.read.parquet(s"$path/counts/tc")
        .filter($"tok".isin("c", "d")).count() == 0)
      assert(LanguageModel.scoreFromCounts(spark, path, keep,
          "doc_id", "text").orderBy("doc_id").collect().toSeq == retrained)
    } finally rm(new java.io.File(path))
  }

  test("robustOutliers flags the injected spike and nothing else") {
    val base = (1 to 101).map(i => (i.toLong, "a", 100.0 + (i % 11)))
    val spike = Seq((999L, "a", 10000.0))
    val df = (base ++ spike).toDF("id", "grp", "value")
    val out = Outliers.robustOutliers(df, "grp", "value", threshold = 3.0)
      .select("id").as[Long].collect()
    assert(out.toSeq == Seq(999L))
  }

  test("robustOutliers: median/MAD resist 20% contamination (mean/std would not)") {
    val inliers = (1 to 80).map(i => (i.toLong, "g", 50.0 + (i % 5)))
    val outliers = (81 to 100).map(i => (i.toLong, "g", 100000.0 + i))
    val df = (inliers ++ outliers).toDF("id", "grp", "value")
    val flagged = Outliers.robustOutliers(df, "grp", "value", threshold = 3.0)
      .select("id").as[Long].collect().toSet
    assert(flagged == (81 to 100).map(_.toLong).toSet)
  }

  test("robustOutliers: MAD=0 group flags nothing (undefined z, not Infinity)") {
    // >50% identical values -> mad 0: the naive division would flag every
    // non-median row via Infinity (and value==med via NaN ordering)
    val constantHeavy = (1 to 10).map(i => (i.toLong, "c", 5.0)) ++
      Seq((11L, "c", 6.0), (12L, "c", 1e9))
    val healthy = (1 to 101).map(i => (100L + i, "h", 100.0 + (i % 11))) :+
      (999L, "h", 10000.0)
    val df = (constantHeavy ++ healthy).toDF("id", "grp", "value")
    val out = Outliers.robustOutliers(df, "grp", "value", threshold = 3.0)
      .select("id", "grp").as[(Long, String)].collect()
    assert(out.forall(_._2 == "h"), s"mad=0 group must flag nothing: ${out.toSeq}")
    assert(out.map(_._1).toSeq == Seq(999L), "healthy group still flags its spike")
  }

  // ---------------------------------------------------------------- pagerank

  test("pageRank: ranks sum to ~1 and the hub outranks leaves") {
    // star graph: 1 <-> {2,3,4,5}
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("id_a", "id_b")
    val out = PageRank.pageRank(pairs, iters = 3).as[(Long, Double)].collect().toMap
    assert(out.size == 5)
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
    assert(out(1L) > out(2L) * 2, "hub must dominate leaves")
    assert(Seq(2L, 3L, 4L, 5L).map(out).distinct.size == 1, "leaves are symmetric")
  }

  test("pageRank: uniform on a cycle (regular graph fixed point)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("id_a", "id_b")
    val out = PageRank.pageRank(pairs, iters = 3).as[(Long, Double)].collect().toMap
    out.values.foreach(r => assert(math.abs(r - 0.25) < 1e-9))
  }

  test("pageRank: shuffle regime (broadcastRanksMax=0) is byte-identical to broadcast") {
    // irregular graph so ranks are non-trivial: a hub plus a tail chain
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L), (5L, 6L), (2L, 3L))
      .toDF("id_a", "id_b")
    val broadcastRegime = PageRank.pageRank(pairs, iters = 3)
      .as[(Long, Double)].collect().toMap
    val shuffleRegime = PageRank.pageRank(pairs, iters = 3, broadcastRanksMax = 0L)
      .as[(Long, Double)].collect().toMap
    // the DECIMAL-sum + round(12) discipline makes equality EXACT, not
    // approximate — any drift between regimes is a bug
    assert(shuffleRegime == broadcastRegime,
      s"regimes diverged:\n  broadcast=$broadcastRegime\n  shuffle=$shuffleRegime")
  }

  test("datacard: hand-computed card; a cross-group duplicate counts for BOTH groups") {
    val docs = Seq(
      (1L, "en", "the same text"),
      (2L, "en", "the same text"),          // exact dup of 1, same group
      (3L, "en", "one two three four five six seven eight nine ten"),
      (4L, "de", "the same text"),          // exact dup of 1/2, other group
      (5L, "de", "kurz")                    // short (1 token < 10)
    ).toDF("doc_id", "lang", "text")
    val card = TextAnalysis.datacard(docs, "doc_id", "text", "lang",
        minTokens = 10)
      .orderBy("lang").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(4), r.getDouble(5), r.getLong(6)))).toMap
    // en: 3 docs, 3+3+10 tokens, dups {1,2}, short {1,2} (3 tokens each)
    assert(card("en") == ((3L, 16L, 2L, 0.666667, 2L)))
    // de: the copy of "the same text" is a duplicate HERE too
    assert(card("de") == ((2L, 4L, 1L, 0.5, 2L)))
  }
}
