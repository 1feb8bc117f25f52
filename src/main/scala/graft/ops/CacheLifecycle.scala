package graft.ops

import org.apache.spark.sql.DataFrame

/** Cache-lifecycle contract for multi-consumer operators.
  *
  * Several operators pin an intermediate relation (`Dataset.persist`)
  * because their final plan consumes it more than once — the shingle
  * relation feeding both sides of a pair join, the per-doc statistics
  * feeding both a global aggregate and the scoring join. A bare
  * `persist` has no release point: the entry lives in the session's
  * CacheManager (a strong reference, never garbage-collected) until
  * someone calls `unpersist`, so a long-lived engine session running
  * many queries accumulates pinned blocks until eviction pressure.
  *
  * The contract here: an operator that pins intermediates MUST resolve
  * its result eagerly and release its pins before returning —
  * [[resolveAndRelease]] is that in one call. The result is
  * materialized via `localCheckpoint` (one job; the caches are
  * populated during it and every downstream consumer of the returned
  * frame reads the materialized rows, not the lineage), then every pin
  * is dropped. The checkpointed result itself is RDD-level storage, not
  * a CacheManager entry: when the caller drops the returned frame, the
  * ContextCleaner unpersists its blocks on the next GC — bounded, not
  * a leak. `CacheLifecycleSpec` pins both halves: the CacheManager is
  * empty the moment each cache-using judged query returns, and across
  * repeated runs the surviving checkpoint blocks stay within one
  * execution's worth (Spark transiently keeps the most recent
  * execution's plan reachable, e.g. on the broadcast-exchange pool's
  * threads) instead of growing per run.
  *
  * Scale note: the materialized result is the OPERATOR'S OUTPUT (pair
  * lists, top-k, per-node ranks, the curation gate's keep set) — the
  * relation the pipeline was going to write anyway — never the wide
  * intermediate being released. The trade is one eager job for a
  * deterministic release point.
  */
object CacheLifecycle {

  /** Materialize `result` (eager `localCheckpoint`: executes the plan
    * once, populating the pinned caches it reads), then unpersist every
    * pin. Returns the checkpointed frame — same rows, same schema,
    * lineage cut onto executor-local blocks.
    */
  def resolveAndRelease(result: DataFrame, pinned: DataFrame*): DataFrame = {
    val out = result.localCheckpoint()
    pinned.foreach(_.unpersist(blocking = false))
    out
  }
}
