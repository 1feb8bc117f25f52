package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.storage.StorageLevel

/** Fixed-iteration PageRank over an undirected pair graph — the
  * centrality signal a curation pipeline uses to weight documents by
  * their position in a similarity/link graph (well-connected ≠ worth
  * more than its duplicates say).
  *
  * Scale shape: each iteration is one join (edges ⋈ ranks, both
  * hash-partitioned on the source id — the partitioning is reused
  * across iterations because the keys never change) and one grouped
  * aggregation with map-side partial sums. No collect, no driver-side
  * graph; iteration count is fixed (the power-method convergence knob),
  * so plan lineage stays bounded without checkpoints.
  *
  * Cross-engine determinism (the property that lets an independent SQL
  * engine replay the iteration exactly): per-edge contributions are
  * doubles on identical operands rounded to 12 decimals, SUMMED AS
  * DECIMAL — exact and aggregation-order invariant, where a double sum
  * would vary with partitioning — and each new rank rounds to 12 again.
  */
object PageRank {

  /** Ranks after `iters` power iterations at `damping`, uniform init
    * 1/N over the nodes incident to `pairs`: (id, rank). Every node of
    * an undirected pair graph has degree ≥ 1, so no dangling-mass term
    * is needed.
    */
  def pageRank(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
      iters: Int = 3, damping: Double = 0.85): DataFrame = {
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    // edges ⋈ degree once, outside the loop — every iteration reuses it
    val edgesDeg = edges.join(deg, "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = deg.count()
    val teleport = (1.0 - damping) / n
    var ranks = deg.select(col("src").as("id"), lit(1.0 / n).as("rank"))
    (1 to iters).foreach { _ =>
      val contrib = edgesDeg
        .join(ranks, col("src") === col("id"))
        .select(col("dst"),
          round(col("rank") / col("deg").cast("double"), 12)
            .cast(DecimalType(28, 12)).as("c"))
      ranks = contrib.groupBy(col("dst").as("id"))
        .agg(round(lit(teleport) + lit(damping) * sum(col("c")).cast("double"), 12)
          .as("rank"))
    }
    // materialize the |V|-row rank relation and release the edge pin —
    // the un-persist-on-completion contract ([[CacheLifecycle]]);
    // repeated calls in one session must not accumulate cached blocks
    CacheLifecycle.resolveAndRelease(ranks, edgesDeg)
  }
}
