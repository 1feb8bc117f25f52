package graft

/** Driver-contract smoke: `entry` returns rows; every query has an
  * oracle; every (query, oracle) key pair lines up.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry (flagship star join) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // Queries that deliberately ship without an oracle (approximate
  // estimators have no portable exact form; the driver records a
  // rows-only check and a spec pins the error bound instead).
  private val rowsOnly = Set("q56_approx_sketch", "q69_hll_merge")

  test("every query has oracle SQL and vice versa") {
    assert(SparkEntry.queries.keySet -- rowsOnly == SparkEntry.oracleSql.keySet)
    assert(rowsOnly.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.nonEmpty)
  }

  test("every query builds a plan against sf0.001 (no analysis errors)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.columns.nonEmpty, name)
    }
  }
}
