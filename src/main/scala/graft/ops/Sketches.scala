package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Frequency sketching: count-min heavy hitters with an explicit error
  * contract — the streaming-friendly way to keep per-item frequencies
  * over a vocabulary too large to aggregate exactly in memory.
  *
  * The CMS is a depth×width counter matrix: `add` is counter increments
  * (commutative, so the distributed build is partition-order invariant)
  * and `estimate` is the min over depth rows. Guarantees, for N total
  * insertions: `estimate ≥ exact` always, and `estimate ≤ exact + ε·N`
  * with probability ≥ confidence. At 100 TB the sketch (a few hundred
  * KB) replaces a vocabulary-sized shuffle: per-partition sketches merge
  * by matrix addition on the driver or in a tree aggregate.
  */
object Sketches {

  /** Exact top-`k` items joined with their count-min estimates and the
    * contract verdict: (term, exact_n, within_bound) where within_bound
    * = exact ≤ estimate ≤ exact + ⌈ε·N⌉. The exact side is a two-phase
    * grouped count + a k-row sort (never a global sort of the
    * vocabulary); the sketch side is one distributed CMS build. The
    * k-row verdict map runs as a typed Dataset transform over the k-row
    * relation with the sketch in the task closure — bounded by k, never
    * by the corpus.
    */
  def cmsHeavyHitters(items: DataFrame, itemCol: String, k: Int = 20,
      eps: Double = 0.001, confidence: Double = 0.999,
      seed: Int = 42): DataFrame = {
    val spark: SparkSession = items.sparkSession
    import spark.implicits._
    val cms = items.stat.countMinSketch(itemCol, eps, confidence, seed)
    val budget = math.ceil(eps * cms.totalCount()).toLong
    items
      .groupBy(col(itemCol).as("term"))
      .agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("term"))
      .limit(k)
      .as[(String, Long)]
      .map { case (term, exact) =>
        val est = cms.estimateCount(term)
        (term, exact, est >= exact && est <= exact + budget)
      }
      .toDF("term", "exact_n", "within_bound")
  }
}
