package graft.ops

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.GraftCacheProbe
import org.apache.spark.sql.functions._

/** Pins the un-persist-on-completion contract
  * ([[CacheLifecycle.resolveAndRelease]]) for every judged query that
  * pins an intermediate relation. Two assertions, in decreasing
  * strength:
  *
  *  1. CACHE-MANAGER EMPTINESS (deterministic): a `Dataset.persist`
  *     entry is a strong reference in the session CacheManager — the
  *     JVM can never collect it, so an operator that returns without
  *     unpersisting has leaked, full stop. After each query the
  *     CacheManager must be empty again.
  *
  *  2. NO RDD-BLOCK ACCUMULATION (bounded, GC-assisted): the operators'
  *     `localCheckpoint` blocks (materialized results, dup-cluster
  *     rounds) are RDD-level storage the ContextCleaner frees once the
  *     RDD object is unreachable. Spark transiently keeps the MOST
  *     RECENT execution's plan reachable (e.g. via the shared
  *     broadcast-exchange pool's thread state), so directly after a
  *     query up to one execution's worth of checkpoint RDDs may linger
  *     — bounded displacement, not accumulation. The spec runs each
  *     query three times and asserts the surviving set stays within
  *     one execution's bound instead of growing per run.
  */
class CacheLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** Replace Spark's most-recent-execution references (incl. the
    * broadcast-exchange pool threads') with trivial plans, then GC-poll
    * until the leaked set stops shrinking — re-displacing periodically,
    * since which pool thread holds the last reference is not
    * deterministic under a full-suite run.
    */
  private def displaceAndDrain(before: Set[Int]): Set[Int] = {
    // CONCURRENT displacing jobs, not sequential: the broadcast-exchange
    // pool reuses its most-recently-idle worker, so 8 sequential tiny
    // joins displace ~1 thread while a full-suite session has dozens of
    // pool threads each still referencing whatever execution last ran
    // on it — the exact scatter that grew q115's surviving set past the
    // escalation allowance (observed 7 → 10 over 5 runs in the
    // 45-suite session; plateaued in isolation). Concurrency forces
    // many workers active at once, so their stale references actually
    // get replaced before the GC poll.
    def displace(): Unit = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      Await.result(Future.sequence((1 to 16).map(_ => Future {
        spark.range(8).toDF("k")
          .join(broadcast(spark.range(3).toDF("k")), "k").count()
      })), 120.seconds)
      ()
    }
    displace()
    val deadline = System.currentTimeMillis() + 25000
    var leaked = persistedIds -- before
    var stable = 0
    var i = 0
    // exit early once the set is empty OR stops shrinking for ~2s — a
    // nonzero-retention query must not burn the whole deadline
    while (leaked.nonEmpty && stable < 8 && System.currentTimeMillis() < deadline) {
      System.gc()
      Thread.sleep(250)
      i += 1
      if (i % 8 == 0) displace()
      val next = persistedIds -- before
      stable = if (next.size < leaked.size) 0 else stable + 1
      leaked = next
    }
    leaked
  }

  for (q <- Seq("q21_minhash_neardup", "q57_dup_clusters", "q67_share_of_total",
      "q82_kmeans", "q84_curation_gate", "q92_ngram_jaccard", "q95_bm25",
      "q97_pagerank", "q106_ngram_containment", "q109_cross_dedup",
      "q113_incremental_index", "q114_curation_pipeline", "q115_semdedup",
      "q131_bigram_lm", "q133_dup_span_frac")) {
    test(s"$q: pins released, no block accumulation across runs") {
      spark.catalog.clearCache() // known-clean CacheManager baseline
      val before = persistedIds
      def runOnce(): Unit = {
        var out = SparkEntry.queries(q)(spark, sfDir)
        out.write.format("noop").mode("overwrite").save()
        out = null // drop the only result reference so its blocks can drain
      }
      // Measure ONE execution's transient retention first (Spark keeps
      // the most recent execution's plan reachable, e.g. via the
      // broadcast-exchange pool's thread state; how many checkpoint
      // RDDs that pins is query- and data-dependent — an iterative
      // query checkpoints once per convergence round, so the corpus
      // shape moves the number). The accumulation bound is RELATIVE to
      // that measurement, not a fixed constant: a round-8 testdata
      // regen pushed q57's per-execution retention past the old
      // hardcoded bound and flaked the suite.
      runOnce()
      val afterOne = displaceAndDrain(before)
      (1 to 2).foreach(_ => runOnce())
      assert(GraftCacheProbe.cacheManagerIsEmpty(spark),
        s"$q left a Dataset.persist pin in the CacheManager")
      // ACCUMULATION over 3 runs would be ~3× one execution's worth
      // and keeps growing with more runs; transient retention plateaus.
      // The bound is 2× + slack, NOT 1×: under a shared full-suite
      // session the retained references are spread across
      // broadcast-exchange POOL THREADS (up to 128), and a query that
      // executes many broadcast exchanges per run touches different
      // threads on different runs — the surviving set then exceeds one
      // run's measurement without accumulating (ProfileRetention shows
      // q114 plateauing at 2 RDDs over 7 runs in a fresh session while
      // this suite context measured 6→12). 2× separates cleanly: a
      // true per-run leak reaches 3× by the third run and keeps going.
      val leaked = displaceAndDrain(before)
      val bound = math.max(2 * afterOne.size + 2, 6)
      if (leaked.size > bound) {
        // Borderline — the one-run measurement can undershoot (a lucky
        // GC cycle drains it to 0, collapsing the bound to the floor
        // while one TRUE execution retains more). Escalate to a direct
        // growth probe: three more runs. A real per-run leak adds ~3 more
        // executions' worth; transient retention stays put.
        // 3 extra runs, not 2: a true 1-RDD-per-run leak grows by +3
        // and must exceed the +2 allowance (with 2 runs it would grow
        // by exactly the allowance and slip through).
        (1 to 3).foreach(_ => runOnce())
        val leaked5 = displaceAndDrain(before)
        assert(leaked5.size <= leaked.size + 2,
          s"5 runs of $q grew the surviving persistent-RDD set " +
            s"${leaked.size} → ${leaked5.size} (one-run retention " +
            s"${afterOne.size}) — accumulation, not Spark's bounded " +
            s"transient retention: $leaked5")
      }
    }
  }
}
