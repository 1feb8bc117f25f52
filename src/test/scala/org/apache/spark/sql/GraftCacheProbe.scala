package org.apache.spark.sql

/** Test-only bridge into the session's CacheManager (`private[sql]`):
  * lets the cache-lifecycle spec assert the strong-reference contract
  * directly — a `Dataset.persist` pin lives in the CacheManager until
  * explicitly unpersisted (the JVM can never collect it), so "the
  * operator released every pin" is exactly `cacheManager.isEmpty`.
  */
object GraftCacheProbe {
  def cacheManagerIsEmpty(spark: SparkSession): Boolean =
    spark.sharedState.cacheManager.isEmpty
}
