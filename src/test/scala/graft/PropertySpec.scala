package graft

import graft.ops.TextAnalysis
import graft.warehouse.Merge
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.3): merge idempotency and
  * key-dominance, surrogate-key determinism, fingerprint permutation
  * invariance. Generators stay small — each property materializes Spark
  * jobs.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic mini property driver (scalatestplus is not in the
    * offline artifact cache): 10 seeded samples per property.
    */
  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit =
    (1 to 10).foreach { i => f(gen.pureApply(Gen.Parameters.default, Seed(i.toLong))) }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (1 to 10).foreach { i =>
      f(ga.pureApply(Gen.Parameters.default, Seed(i.toLong)),
        gb.pureApply(Gen.Parameters.default, Seed(i.toLong + 1000)))
    }

  private def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f

  private val kvGen: Gen[List[(String, String, Int)]] =
    Gen.listOfN(12, for {
      k <- Gen.oneOf("a", "b", "c", "d", "e")
      v <- Gen.alphaLowerStr.map(_.take(4))
      ver <- Gen.choose(1, 9)
    } yield (k, v, ver))

  test("property: upsert is idempotent — merge(merge(t,s),s) == merge(t,s)") {
    forAll(kvGen, kvGen) { (t, s) =>
      whenever(t.nonEmpty || s.nonEmpty) {
        val target = Merge.dedupLastWins(t.toDF("k", "v", "ver"), Seq("k"), Seq(col("ver")))
        val stage = s.toDF("k", "v", "ver")
        val once = Merge.upsert(target, stage, Seq("k"), Seq(col("ver")))
        val twice = Merge.upsert(once, stage, Seq("k"), Seq(col("ver")))
        assert(once.collect().map(_.toSeq).toSet == twice.collect().map(_.toSeq).toSet)
      }
    }
  }

  test("property: after upsert every stage key maps to its max-version stage row") {
    forAll(kvGen, kvGen) { (t, s) =>
      whenever(s.nonEmpty) {
        val target = Merge.dedupLastWins(t.toDF("k", "v", "ver"), Seq("k"), Seq(col("ver")))
        val merged = Merge.upsert(target, s.toDF("k", "v", "ver"), Seq("k"), Seq(col("ver")))
          .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
        val expect = s.groupBy(_._1).map { case (k, rows) => k -> rows.map(_._3).max }
        expect.foreach { case (k, maxVer) => assert(merged(k) == maxVer) }
        // merged keys = stage keys ∪ target keys
        assert(merged.keySet == (s.map(_._1) ++ t.map(_._1)).toSet)
      }
    }
  }

  test("property: insertNew never changes existing dimension rows") {
    forAll(kvGen, kvGen) { (d, r) =>
      whenever(d.nonEmpty) {
        val dim = Merge.dedupLastWins(d.toDF("k", "v", "ver"), Seq("k"), Seq(col("ver")))
        val dimRows = dim.collect().map(x => x.getString(0) -> x.getString(1)).toMap
        val out = Merge.insertNew(dim, r.toDF("k", "v", "ver"), Seq("k"))
          .collect().map(x => x.getString(0) -> x.getString(1)).toMap
        dimRows.foreach { case (k, v) => assert(out(k) == v) }
      }
    }
  }

  test("property: surrogate key format is deterministic and parseable") {
    val dateGen = Gen.choose(0L, 20000L).map(java.time.LocalDate.ofEpochDay)
    forAll(Gen.choose(1L, 999999L), dateGen) { (id, date) =>
      val df = Seq((id, java.sql.Date.valueOf(date))).toDF("id", "d")
      val key = df.select(concat_ws("_", col("id"), date_format(col("d"), "yyyyMMdd")))
        .head().getString(0)
      val expected = f"${id}_${date.getYear}%04d${date.getMonthValue}%02d${date.getDayOfMonth}%02d"
      assert(key == expected)
    }
  }

  test("property: set fingerprint is invariant under permutation+duplication, rolling is order-sensitive") {
    val tokensGen = Gen.nonEmptyListOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
    forAll(tokensGen) { toks =>
      val shuffled = scala.util.Random.shuffle(toks ++ toks.headOption.toList)
      val df = Seq(toks.mkString(" "), shuffled.mkString(" ")).toDF("text")
      val fps = df.select(TextAnalysis.fingerprint(col("text"))).as[String].collect()
      assert(fps(0) == fps(1))
    }
  }
}
