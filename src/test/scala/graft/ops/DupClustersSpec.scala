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
}
