package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-handling utilities: salted shuffle joins for hot keys.
  *
  * AQE's skew-join splitting (left on) handles most cases at runtime;
  * explicit salting remains the deterministic tool when the skew is known
  * up front (a `status` column with 3 values, a null-heavy foreign key):
  * the skewed side's hot key is spread across `salts` sub-keys and the
  * small side is replicated once per salt, so no single task receives an
  * entire hot key's rows.
  */
object Skew {

  /** Join `large` (skewed) to `small` on `keys`, salting the shuffle.
    *
    * @param saltBy deterministic expression on `large` used to derive the
    *   salt (e.g. a unique id) — deterministic so retries/replays land on
    *   identical partitions; never `rand()`, which breaks task retry
    *   idempotency.
    * @param salts fan-out per key; `small` grows by this factor.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      saltBy: Column, salts: Int = 16): DataFrame = {
    require(salts > 0)
    val saltedLarge = large.withColumn("__salt", pmod(hash(saltBy), lit(salts)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(saltedSmall, keys :+ "__salt").drop("__salt")
  }
}
