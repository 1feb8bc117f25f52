package graft.ops

import graft.SparkSpec

class DupClustersSpec extends SparkSpec {
  import spark.implicits._

  private def clustersOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.duplicateClusters(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("components get the min id as label") {
    val got = clustersOf(Seq((1L, 2L), (2L, 3L), (10L, 11L), (21L, 20L), (21L, 22L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("long chain converges (diameter > 2 rounds)") {
    val chain = (1L until 12L).map(i => (i, i + 1))
    val got = clustersOf(chain)
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == (1L to 12L).toSet)
  }

  test("edge direction and duplication don't matter") {
    val a = clustersOf(Seq((2L, 1L), (1L, 2L), (2L, 3L)))
    val b = clustersOf(Seq((1L, 2L), (3L, 2L)))
    assert(a == b)
  }

  // ----------------------------------------------- alternating-star variant

  private def starClustersOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.duplicateClustersStar(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference union-find, the third independent algorithm. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("star: components get the min id as label") {
    val got = starClustersOf(Seq((1L, 2L), (2L, 3L), (10L, 11L), (21L, 20L), (21L, 22L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("star: diameter-120 chain converges (propagation's escape hatch)") {
    val chain = (1L until 121L).map(i => (i, i + 1))
    // propagation at default maxRounds=50 must refuse a diameter-120 chain…
    intercept[IllegalStateException](clustersOf(chain))
    // …the star variant contracts it in O(log²) rounds
    val got = starClustersOf(chain)
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == (1L to 121L).toSet)
  }

  test("star ≡ propagation ≡ union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 30 + trial * 20
      val pairs = Seq.fill(n)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
      val expected = unionFind(pairs)
      assert(starClustersOf(pairs) == expected, s"star differs (trial $trial)")
      assert(clustersOf(pairs) == expected, s"propagation differs (trial $trial)")
    }
  }
}
