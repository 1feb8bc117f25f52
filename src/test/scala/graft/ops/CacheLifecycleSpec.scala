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
    def displace(): Unit = (1 to 8).foreach { _ =>
      spark.range(8).toDF("k")
        .join(broadcast(spark.range(3).toDF("k")), "k").count()
    }
    displace()
    val deadline = System.currentTimeMillis() + 25000
    var leaked = persistedIds -- before
    var i = 0
    while (leaked.nonEmpty && System.currentTimeMillis() < deadline) {
      System.gc()
      Thread.sleep(250)
      i += 1
      if (i % 8 == 0) displace()
      leaked = persistedIds -- before
    }
    leaked
  }

  for (q <- Seq("q21_minhash_neardup", "q57_dup_clusters", "q67_share_of_total",
      "q82_kmeans", "q84_curation_gate", "q92_ngram_jaccard", "q95_bm25",
      "q97_pagerank", "q106_ngram_containment", "q109_cross_dedup")) {
    test(s"$q: pins released, no block accumulation across runs") {
      spark.catalog.clearCache() // known-clean CacheManager baseline
      val before = persistedIds
      (1 to 3).foreach { _ =>
        var out = SparkEntry.queries(q)(spark, sfDir)
        out.write.format("noop").mode("overwrite").save()
        out = null // drop the only result reference so its blocks can drain
      }
      assert(GraftCacheProbe.cacheManagerIsEmpty(spark),
        s"$q left a Dataset.persist pin in the CacheManager")
      // one execution's transient retention is a handful of RDDs (which
      // pool thread holds the last reference is nondeterministic);
      // ACCUMULATION over the 3 runs would be 12+ — the bound separates
      // the two cleanly without flaking on a single surviving slot
      val leaked = displaceAndDrain(before)
      assert(leaked.size <= 6,
        s"3 runs of $q left ${leaked.size} persistent RDDs — accumulation, " +
          s"not Spark's bounded most-recent-execution retention: $leaked")
    }
  }
}
