package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sampling/splitting/chunking suite: hash-split stability, stratified
  * keep semantics, mixture-resample fraction math, quota caps, and the
  * chunk-overlap coverage law.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 400L)
    .map(i => (i, s"src${i % 4}", (i * 37 % 97).toInt))
    .toDF("id", "domain", "score")

  // ------------------------------------------------------------ hashSplit

  test("hashSplit: total, stable under repartitioning, near the asked fractions") {
    val out = Sampling.hashSplit(docs, "id")
    assert(out.filter(col("split").isNull).count() === 0)
    val byLabel = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byLabel.keySet === Set("train", "val", "test"))
    // 400 rows, md5-uniform: 80/10/10 within a loose tolerance
    assert(byLabel("train") > 280 && byLabel("train") < 360)
    assert(byLabel("val") > 10 && byLabel("test") > 10)
    // the same row keeps its split whatever the partitioning
    val again = Sampling.hashSplit(docs.repartition(13), "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    val first = out.select("id", "split").as[(Long, String)].collect().toMap
    assert(again === first)
  }

  test("hashSplit boundaries accumulate exactly (0.8 + 0.1 -> 0.9, not 0.9000…01)") {
    // a key whose u lands in [0.9, 0.9000000000000001) would flip labels
    // under double accumulation; assert label == the exact-decimal rule
    val out = Sampling.hashSplit(docs, "id")
      .withColumn("u", Sampling.hashUniform(col("id")))
      .select("u", "split").as[(Double, String)].collect()
    out.foreach { case (u, label) =>
      val expect = if (u < 0.8) "train" else if (u < 0.9) "val" else "test"
      assert(label === expect, s"u=$u")
    }
  }

  // --------------------------------------------------- stratifiedSample

  test("stratifiedSample: keeps only listed strata, decision is u < fraction") {
    val fr = Map("src0" -> 0.5, "src1" -> 0.25)
    val kept = Sampling.stratifiedSample(docs, "domain", "id", fr)
      .select("id", "domain").as[(Long, String)].collect()
    assert(kept.map(_._2).toSet.subsetOf(Set("src0", "src1")))
    val keptIds = kept.map(_._1).toSet
    docs.withColumn("u", Sampling.hashUniform(col("id")))
      .select("id", "domain", "u").as[(Long, String, Double)].collect()
      .foreach { case (id, dom, u) =>
        val expect = fr.get(dom).exists(u < _)
        assert(keptIds.contains(id) === expect, s"id=$id dom=$dom u=$u")
      }
  }

  // ---------------------------------------------------- mixtureResample

  test("mixtureResample: binding domain keeps all, fractions follow w·T/n") {
    // src0..src3 have 100 rows each; weights 4:3:2:1 -> T = 100/0.4 = 250,
    // f = (w·250)/100 -> src0 keeps 1.0, src1 0.75, src2 0.5, src3 0.25
    val w = Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1)
    val kept = Sampling.mixtureResample(docs, "domain", "id", w)
      .groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(kept("src0") === 100L) // f = 1.0: every row survives u < 1.0
    // others: exact expected counts are data-dependent; assert ordering
    // and rough proportionality of the realized mixture
    assert(kept("src1") < 100L && kept("src2") < kept("src1") &&
      kept("src3") < kept("src2"))
  }

  // ------------------------------------------------- temperatureResample

  test("temperatureResample: smallest domain keeps all, fractions follow (n_min/n)^(1-a)") {
    // skewed domains: 40/80/120/160 rows
    val skewed = (1L to 400L).map { i =>
      val dom = if (i <= 40) "a" else if (i <= 120) "b" else if (i <= 240) "c" else "d"
      (i, dom)
    }.toDF("id", "domain")
    val kept = Sampling.temperatureResample(skewed, "domain", "id", alpha = 0.5)
    val byDom = kept.groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(byDom("a") === 40L) // f = 1.0: the smallest domain survives whole
    // replay the closed form row by row: keep iff u < round((40/n)^0.5, 6)
    val n = Map("a" -> 40.0, "b" -> 80.0, "c" -> 120.0, "d" -> 160.0)
    val keptIds = kept.select("id").as[Long].collect().toSet
    skewed.withColumn("u", Sampling.hashUniform(col("id")))
      .as[(Long, String, Double)].collect().foreach { case (id, dom, u) =>
        val f = BigDecimal(math.pow(40.0 / n(dom), 0.5))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(keptIds.contains(id) === (u < f), s"id=$id dom=$dom u=$u f=$f")
      }
    // alpha = 1 is the identity: natural mixture untouched
    assert(Sampling.temperatureResample(skewed, "domain", "id", alpha = 1.0)
      .count() === 400L)
  }

  // --------------------------------------------------- exactKPerStratum

  test("exactKPerStratum: exactly k per stratum, ranked by hash order, stable under repartitioning") {
    val out = Sampling.exactKPerStratum(docs, "domain", "id", k = 11)
      .select("id", "domain", "sample_rank").as[(Long, String, Int)].collect()
    val byDom = out.groupBy(_._2)
    assert(byDom.keySet === Set("src0", "src1", "src2", "src3"))
    byDom.values.foreach { rows =>
      assert(rows.length === 11) // strata have 100 rows each: k binds
      assert(rows.map(_._3).sorted.toSeq === (1 to 11))
    }
    // membership = the k smallest u values of the stratum
    val u = docs.withColumn("u", Sampling.hashUniform(col("id")))
      .select("id", "domain", "u").as[(Long, String, Double)].collect()
    u.groupBy(_._2).foreach { case (dom, rows) =>
      val expect = rows.sortBy(r => (r._3, r._1)).take(11).map(_._1).toSet
      assert(byDom(dom).map(_._1).toSet === expect, s"dom=$dom")
    }
    val again = Sampling.exactKPerStratum(docs.repartition(13), "domain", "id", k = 11)
      .select("id", "sample_rank").as[(Long, Int)].collect().toMap
    assert(again === out.map(r => (r._1, r._3)).toMap)
  }

  // ----------------------------------------------------------- quotaCap

  test("quotaCap: at most n per group, ordered by score desc with id tiebreak") {
    val out = Sampling.quotaCap(docs, "domain", "score", "id", n = 7)
      .select("domain", "score", "id", "rank_in_domain")
      .as[(String, Int, Long, Int)].collect()
    val byDom = out.groupBy(_._1)
    assert(byDom.forall(_._2.length <= 7))
    byDom.values.foreach { rows =>
      val sorted = rows.sortBy(r => (-r._2, r._3))
      assert(rows.sortBy(_._4).map(r => (r._2, r._3)).toSeq ===
        sorted.map(r => (r._2, r._3)).toSeq)
    }
    // the cut really is the global per-group top: nothing outside beats inside
    import scala.math.Ordering.Implicits._
    val keptMin = out.groupBy(_._1).map { case (d, rs) =>
      d -> rs.map(r => (r._2, -r._3)).min
    }
    val all = docs.as[(Long, String, Int)].collect()
    all.foreach { case (id, dom, score) =>
      val inside = out.exists(r => r._3 == id)
      if (!inside) assert(((score, -id): (Int, Long)) <= keptMin(dom))
    }
  }

  // --------------------------------------------------------- chunkTokens

  test("chunkTokens: stride coverage law — every token appears, overlap = size - stride") {
    val df = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), (2L, ""), (3L, "x"))
      .toDF("id", "text")
    val chunks = Chunking.chunkTokens(df, "id", "text", size = 4, stride = 3)
      .select("id", "chunk_id", "n_toks", "chunk_text")
      .as[(Long, Int, Long, String)].collect().sortBy(c => (c._1, c._2))
    // empty doc -> no chunks; single token -> one 1-token chunk
    assert(!chunks.exists(_._1 == 2L))
    assert(chunks.filter(_._1 == 3L).toSeq == Seq((3L, 0, 1L, "x")))
    val c1 = chunks.filter(_._1 == 1L)
    // starts 0,3,6,9 over 11 tokens
    assert(c1.map(_._2).toSeq == Seq(0, 1, 2, 3))
    assert(c1.map(_._4).toSeq == Seq("t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9", "t9 t10"))
    // adjacent chunks share exactly size - stride = 1 token
    c1.sliding(2).foreach { case Array(a, b) =>
      val overlap = a._4.split(" ").toSet intersect b._4.split(" ").toSet
      assert(overlap.size === 1)
    case _ => ()
    }
  }

  // ---------------------------------------------------- cluster-safe split

  test("clusterSafeSplit: components never straddle; non-dup docs keep hashSplit") {
    val corpus = (1L to 300L).map(i => (i, s"doc$i")).toDF("id", "payload")
    // components {1,2,3} (chain) and {10,11}; everything else singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Sampling.clusterSafeSplit(corpus, "id", pairs)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(out.size == 300)
    // isolation by construction
    assert(out(1L) == out(2L) && out(2L) == out(3L))
    assert(out(10L) == out(11L))
    // clustered docs take the REPRESENTATIVE's hash label
    val rep = Sampling.hashSplit(Seq((1L, 0), (10L, 0)).toDF("id", "x"), "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(out(3L) == rep(1L) && out(11L) == rep(10L))
    // documents in no pair are labeled exactly as plain hashSplit
    val plain = Sampling.hashSplit(corpus, "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    (1L to 300L).filterNot(Set(1L, 2L, 3L, 10L, 11L)).foreach { i =>
      assert(out(i) == plain(i), s"singleton $i must keep its hashSplit label")
    }
  }

  // ------------------------------------------------------ token budget fill

  test("tokenBudgetSelect: greedy per-domain prefix, inclusive boundary, ties total") {
    import spark.implicits._
    // domain A by score desc, id asc: (1,300)(2,300)(3,300)(4,100) —
    // budget 600 keeps exactly {1,2}; 3 overflows and, the sum being
    // monotone, the smaller 4 behind it can never re-enter.
    // domain B: one row at exactly the budget — inclusive, kept.
    // ties: 5 and 6 share score 0.5; id asc puts 5 first.
    val df = Seq(
      ("A", 1L, 300L, 0.9), ("A", 2L, 300L, 0.8), ("A", 3L, 300L, 0.7),
      ("A", 4L, 100L, 0.6),
      ("B", 7L, 600L, 0.9),
      ("C", 5L, 400L, 0.5), ("C", 6L, 400L, 0.5)
    ).toDF("domain", "id", "w", "score")
    val out = Sampling.tokenBudgetSelect(df, "domain", "w", "score", "id", 600L)
      .select("id", "cum_weight").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 300L, 2L -> 600L, 7L -> 600L, 5L -> 400L))
  }

  test("tokenBudgetSelect: invariant to orderBucketWidth (the cumsum is a property of the total order)") {
    import spark.implicits._
    // skewed mix (one fat domain, one tiny), negative scores, exact
    // score ties, and a weight-0 row — everything the bucketing must
    // not disturb
    val rows =
      (1 to 200).map(i => ("web", i.toLong, (i % 7).toLong,
        (i % 13).toDouble / 13.0 - 0.3)) ++
      Seq(("code", 500L, 120L, 0.9), ("code", 501L, 120L, 0.9),
        ("code", 502L, 50L, -0.2))
    val df = rows.toDF("domain", "id", "w", "score")
    def run(width: Double): Set[(Long, Long)] =
      Sampling.tokenBudgetSelect(df, "domain", "w", "score", "id", 250L,
          orderBucketWidth = width)
        .select("id", "cum_weight").as[(Long, Long)].collect().toSet
    // 1e9 puts every row in one bucket — the single-window legacy form;
    // every finer width must reproduce it exactly
    val anchor = run(1e9)
    assert(anchor.nonEmpty)
    Seq(0.01, 0.05, 0.37, 1.0).foreach { w =>
      assert(run(w) == anchor, s"width $w diverged from the order-defined cumsum")
    }
  }

  test("quotaCap/exactKPerStratum: bounded-heap result == the window formulation") {
    import org.apache.spark.sql.expressions.Window
    // quotaCap vs row_number() OVER (PARTITION BY domain ORDER BY
    // score DESC, id ASC) — ties exist (score = i*37 % 97 collides)
    val wq = docs.withColumn("r",
        row_number().over(Window.partitionBy(col("domain"))
          .orderBy(col("score").desc, col("id").asc)))
      .filter(col("r") <= 7)
      .select(col("id"), col("r")).as[(Long, Int)].collect().toMap
    val hq = Sampling.quotaCap(docs, "domain", "score", "id", n = 7)
      .select(col("id"), col("rank_in_domain")).as[(Long, Int)].collect().toMap
    assert(hq == wq)
    // exactKPerStratum vs the hash-order window
    val we = docs.withColumn("r",
        row_number().over(Window.partitionBy(col("domain"))
          .orderBy(Sampling.hashUniform(col("id")).asc, col("id").asc)))
      .filter(col("r") <= 11)
      .select(col("id"), col("r")).as[(Long, Int)].collect().toMap
    val he = Sampling.exactKPerStratum(docs, "domain", "id", k = 11)
      .select(col("id"), col("sample_rank")).as[(Long, Int)].collect().toMap
    assert(he == we)
  }

  // ----------------------------------------------------- empty-input guards

  test("mixtureResample/temperatureResample: clear error on empty input") {
    val empty = docs.filter(col("id") < 0)
    val e1 = intercept[IllegalArgumentException] {
      Sampling.mixtureResample(empty, "domain", "id", Map("src0" -> 1.0))
    }
    assert(e1.getMessage.contains("no rows"))
    // weighted domains absent from a NON-empty frame is the same error
    val e2 = intercept[IllegalArgumentException] {
      Sampling.mixtureResample(docs, "domain", "id", Map("nope" -> 1.0))
    }
    assert(e2.getMessage.contains("nope"))
    val e3 = intercept[IllegalArgumentException] {
      Sampling.temperatureResample(empty, "domain", "id", alpha = 0.5)
    }
    assert(e3.getMessage.contains("no rows"))
  }

  // ------------------------------------------------------ epochShardPlan

  private val shardDocs = (1L to 300L)
    .map(i => (i, (i * 13 % 50 + 1).toInt))
    .toDF("id", "n_tok")

  test("epochShardPlan: distributed two-phase prefix sum == the naive global replay") {
    val out = Sampling.epochShardPlan(shardDocs, "id", col("n_tok"),
        seed = 7L, shardTokens = 100L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    // naive replay: sort by hkey driver-side, running exclusive sum
    val byKey = out.sortBy(_._2)
    var run = 0L
    val expect = byKey.map { case (id, hk, n, _) =>
      val shard = run / 100L; run += n; (id, hk, n, shard)
    }
    assert(out.sortBy(_._1) == expect.sortBy(_._1))
  }

  test("epochShardPlan: stable under repartitioning; a new seed is a new permutation") {
    def plan(df: org.apache.spark.sql.DataFrame, seed: Long) =
      Sampling.epochShardPlan(df, "id", col("n_tok"), seed, 100L)
        .orderBy("id").collect().toSeq
    val a = plan(shardDocs, 7L)
    assert(plan(shardDocs.repartition(13), 7L) == a)
    val b = plan(shardDocs, 8L)
    assert(a != b, "a new seed must reshuffle")
    // …but the CUMULATIVE fill law holds under every seed: tokens
    // through shard k total ≥ (k+1)·budget for every non-final shard
    // (per-shard deficit is bounded by one straddling document)
    for (p <- Seq(a, b)) {
      val byShard = p.groupBy(_.getLong(3)).view
        .mapValues(_.map(_.getLong(2)).sum).toMap
      val last = byShard.keys.max
      var cum = 0L
      for (s <- byShard.keys.toSeq.sorted if s != last) {
        cum += byShard(s)
        assert(cum >= (s + 1) * 100L,
          s"cumulative fill through shard $s short: $cum")
      }
    }
  }
}
