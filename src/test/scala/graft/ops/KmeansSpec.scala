package graft.ops

import graft.SparkSpec

import scala.math.BigDecimal.RoundingMode

class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, RoundingMode.HALF_UP).toDouble

  /** Naive driver-side k-means with the operator's exact semantics:
    * seed = k lowest ids, cosine rounded to 6 with min-cid tie-break,
    * per-dim means via 12-decimal fixed-point sums rounded to 6.
    */
  private def naive(vecs: Map[Long, Array[Double]], k: Int, iters: Int): Map[Long, Long] = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.zip(y).foldLeft(0.0) { case (acc, (p, q)) => acc + p * q }
      r6(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
    }
    var cents: Map[Long, Array[Double]] =
      vecs.keys.toSeq.sorted.take(k).map(id => id -> vecs(id)).toMap
    def assign(): Map[Long, Long] = vecs.map { case (id, v) =>
      id -> cents.toSeq.map { case (cid, cv) => (cos(v, cv), cid) }
        .maxBy { case (s, cid) => (s, -cid) }._2
    }
    for (_ <- 1 to iters) {
      val a = assign()
      cents = a.groupBy(_._2).map { case (cell, members) =>
        val vs = members.keys.toSeq.map(vecs)
        val dim = vs.head.length
        cell -> Array.tabulate(dim) { d =>
          val sum = vs.map(v => BigDecimal(v(d)).setScale(12, RoundingMode.HALF_UP)).sum
          r6((sum.toDouble) / vs.size)
        }
      }
    }
    assign()
  }

  private val vecs: Map[Long, Array[Double]] = Map(
    // blob A around (10, 1), blob B around (1, 10); seeds 0 and 1 land
    // in different blobs, so one Lloyd round separates them cleanly
    0L -> Array(10.0, 1.0), 1L -> Array(1.0, 10.0),
    2L -> Array(9.0, 2.0), 3L -> Array(11.0, 1.0), 4L -> Array(10.0, 2.0),
    5L -> Array(2.0, 9.0), 6L -> Array(1.0, 11.0), 7L -> Array(2.0, 10.0),
    8L -> Array(12.0, 3.0), 9L -> Array(3.0, 12.0),
  )

  private def run(iters: Int): Map[Long, Long] = {
    val df = vecs.toSeq.sortBy(_._1)
      .map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    Similarity.kmeans(df, "vec_id", "embedding", k = 2, iters = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two separated blobs cluster to their seed centroids") {
    val got = run(1)
    assert(Set(0L, 2L, 3L, 4L, 8L).map(got) == Set(0L))
    assert(Set(1L, 5L, 6L, 7L, 9L).map(got) == Set(1L))
  }

  test("matches the naive reference for 1 and 2 Lloyd iterations") {
    assert(run(1) == naive(vecs, 2, 1))
    assert(run(2) == naive(vecs, 2, 2))
  }
}
