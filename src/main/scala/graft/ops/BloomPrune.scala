package graft.ops

import java.io.ByteArrayOutputStream

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning: filter the BIG side of a semi/inner join
  * with a sketch of the small side's keys BEFORE any shuffle touches it —
  * the hand-rolled form of the runtime row-level filtering a warehouse
  * engine injects for selective dim→fact joins.
  *
  * Why it matters at 100 TB: a shuffle-based semi join moves the entire
  * fact side over the network even when 1% of rows survive. The bloom
  * probe ([[graft.functions.BloomContains]], codegen'd) runs inside the
  * fact scan's whole-stage-codegen span, so the shuffle (or the join's
  * build-side hashing, if the key side broadcasts) sees only rows that
  * *might* match — the transferred volume drops by roughly the join
  * selectivity, at the cost of one pass over the small side and an
  * in-memory bit array sized `-n·ln(fpp)/ln²2`.
  *
  * Exactness contract: bloom filters have no false negatives, so the
  * exact join that follows sees every true match; its equality test
  * removes the false positives. The composed result is bit-identical to
  * the plain join — the sketch is pure pruning, never semantics.
  */
object BloomPrune {

  /** Serialized bloom filter of `keys.keyCol` (long keys), sized to the
    * key count at `fpp`. Two jobs over the SMALL side only: a distinct
    * count to size the filter, then the distributed sketch build.
    */
  def buildFilter(keys: DataFrame, keyCol: String, fpp: Double = 0.01): Array[Byte] = {
    val distinctKeys = keys.select(col(keyCol)).distinct()
    val n = math.max(distinctKeys.count(), 1L)
    val bf = distinctKeys.stat.bloomFilter(keyCol, n, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `fact ⋉ keys` (left semi) with a bloom pre-filter on the fact side.
    * Result is exactly `fact.join(keys, fact(factKey) === keys(keyCol),
    * "left_semi")` — see class doc for why the plan is cheaper.
    */
  def semiJoin(fact: DataFrame, factKey: String,
      keys: DataFrame, keyCol: String, fpp: Double = 0.01): DataFrame = {
    GraftFunctions.register(fact.sparkSession)
    val bytes = buildFilter(keys, keyCol, fpp)
    val pruned = fact.filter(
      call_function("graft_bloom_contains", col(factKey).cast("long"), lit(bytes)))
    pruned.join(keys.select(col(keyCol)).distinct(),
      pruned(factKey) === col(keyCol), "left_semi")
  }
}
