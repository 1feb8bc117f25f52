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

  /** Rank-error contract for `percentile_approx` — the judged scale
    * path the exact-percentile queries (q42/q48/q96) document as their
    * 100 TB escape hatch: exact percentiles concentrate each group's
    * values into one aggregation buffer, the sketch keeps per-group
    * state at O(accuracy) regardless of group size.
    *
    * Spark's `percentile_approx` is a Greenwald–Khanna summary with a
    * DETERMINISTIC guarantee (unlike the probabilistic CMS/HLL
    * contracts of q94/q56/q69): the returned value is an element of
    * the group whose rank r satisfies |r − p·n| ≤ ε·n with
    * ε = 1/accuracy — always, not with some confidence. The contract
    * verdict re-derives that rank EXACTLY: one broadcast join of the
    * |groups|-row approx relation back onto the data, one conditional
    * count pass (`< approx` and `≤ approx` bound the duplicate-value
    * rank range), and a closed-form bound check with ±1 slack for the
    * floor/ceil boundary conventions. Output: (group, n,
    * within_<name> per requested percentile) — the oracle recomputes
    * n and emits literal TRUE, so a drifting sketch breaks the hash.
    */
  def approxPercentileContract(df: DataFrame, groupCol: String,
      valueCol: String, percentiles: Seq[(String, Double)],
      accuracy: Int = 1000): DataFrame = {
    require(percentiles.nonEmpty, "need at least one percentile")
    val eps = 1.0 / accuracy
    val approx = df.groupBy(col(groupCol))
      .agg(percentile_approx(col(valueCol),
        array(percentiles.map(p => lit(p._2)): _*), lit(accuracy)).as("__ap"))
    val ap = approx.select(
      col(groupCol) +: percentiles.zipWithIndex.map { case ((nm, _), i) =>
        col("__ap")(i).as(s"__ap_$nm")
      }: _*)
    val aggs = count(lit(1)).as("n") +: percentiles.flatMap { case (nm, _) =>
      Seq(count(when(col(valueCol) < col(s"__ap_$nm"), 1)).as(s"__lo_$nm"),
        count(when(col(valueCol) <= col(s"__ap_$nm"), 1)).as(s"__hi_$nm"))
    }
    val counts = df.join(broadcast(ap), groupCol)
      .groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    counts.select(
      col(groupCol) +: col("n") +: percentiles.map { case (nm, p) =>
        // duplicate values give the returned element the rank RANGE
        // (lo, hi]; the guarantee holds iff that range intersects
        // [p·n − ε·n, p·n + ε·n]
        ((col(s"__hi_$nm").cast("double") >= lit(p - eps) * col("n") - 1) &&
          (col(s"__lo_$nm").cast("double") <= lit(p + eps) * col("n") + 1))
          .as(s"within_$nm")
      }: _*)
  }
}
