package graft.ops

import java.io.ByteArrayOutputStream

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}
import org.apache.spark.sql.{Column, DataFrame}

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
  * Exactness contract: bloom filters have no false negatives — PROVIDED
  * insert and probe hash the same representation of equal keys. Both
  * sides therefore go through ONE canonicalization ([[canonicalLong]]):
  * integral keys cast to long (int 5 and bigint 5 insert/probe the same
  * word), everything else `xxhash64` of the string form (a 64-bit hash
  * collision only ADDS a false positive — removed, like every false
  * positive, by the exact join that follows). Mixed integral/
  * non-integral key pairs are rejected loudly: their canonical forms
  * would disagree and silently DROP true matches.
  */
object BloomPrune {

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** The single long representation both the filter build and the probe
    * use: integral columns cast to long; any other type hashed to a
    * long via `xxhash64` of its canonical string form (type-width
    * differences erased BEFORE hashing — `xxhash64` itself hashes int
    * and long inputs differently).
    */
  private[ops] def canonicalLong(dt: DataType, c: Column): Column =
    if (isIntegral(dt)) c.cast("long") else xxhash64(c.cast("string"))

  /** Serialized bloom filter of `keys.keyCol` under [[canonicalLong]],
    * sized to the key count at `fpp`. Two jobs over the SMALL side only:
    * a distinct count to size the filter, then the distributed sketch
    * build.
    */
  def buildFilter(keys: DataFrame, keyCol: String, fpp: Double = 0.01): Array[Byte] = {
    val canon = canonicalLong(keys.schema(keyCol).dataType, col(keyCol))
    val distinctKeys = keys.select(canon.as("__k")).distinct()
    val n = math.max(distinctKeys.count(), 1L)
    val bf = distinctKeys.stat.bloomFilter("__k", n, fpp)
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
    val factDt = fact.schema(factKey).dataType
    val keyDt = keys.schema(keyCol).dataType
    // a mixed pair would canonicalize the two sides differently —
    // false NEGATIVES, i.e. silently dropped true matches. Fail loudly.
    require(isIntegral(factDt) == isIntegral(keyDt),
      s"bloom semi join requires both key columns integral or both " +
        s"non-integral; got $factKey: ${factDt.simpleString} vs " +
        s"$keyCol: ${keyDt.simpleString}")
    GraftFunctions.register(fact.sparkSession)
    val bytes = buildFilter(keys, keyCol, fpp)
    val pruned = fact.filter(
      call_function("graft_bloom_contains",
        canonicalLong(factDt, col(factKey)), lit(bytes)))
    pruned.join(keys.select(col(keyCol)).distinct(),
      pruned(factKey) === col(keyCol), "left_semi")
  }
}
