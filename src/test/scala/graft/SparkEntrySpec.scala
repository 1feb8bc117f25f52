package graft

/** Driver-contract smoke: `entry` returns rows; every query has an
  * oracle; every (query, oracle) key pair lines up.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry (flagship star join) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has oracle SQL and vice versa") {
    // includes the sketch queries: q56/q69 are judged via epsilon
    // contracts (exact values + within_bound booleans), so the full
    // surface is oracle-backed
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
    assert(SparkEntry.queries.nonEmpty)
  }

  test("every query builds a plan against sf0.001 (no analysis errors)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.columns.nonEmpty, name)
    }
  }
}
