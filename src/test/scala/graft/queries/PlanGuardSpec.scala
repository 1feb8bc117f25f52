package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Pins the PHYSICAL-plan properties the scale story depends on — the
  * oracle proves results, but only the plan proves a query would
  * survive a 100× scale-up. Each assertion here is a property SCALE.md
  * claims and a regression would silently un-ship: dimension broadcasts
  * on the star join, filter pushdown reaching the parquet scan, column
  * pruning keeping fact scans narrow, and the broadcast (never
  * cartesian) shape of the knn query side.
  *
  * The assertions run on the INITIAL executed plan (AQE re-plans at
  * runtime, but pushdown/pruning/broadcast-hint decisions are visible
  * before execution).
  */
class PlanGuardSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q13 star join: dims broadcast, date filter pushed, fact scan pruned") {
    val p = planOf("q13_star_join")
    assert(p.contains("BroadcastHashJoin"), s"dims must broadcast:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      s"the order-date filter must reach the orders parquet scan:\n$p")
    // the lineitem scan must read only the revenue columns — a scan line
    // mentioning l_extendedprice must not also read quantity/partkey
    val lineitemScan = p.linesIterator
      .find(l => l.contains("ReadSchema") && l.contains("l_extendedprice"))
    assert(lineitemScan.isDefined, s"no lineitem scan found:\n$p")
    assert(!lineitemScan.get.contains("l_quantity") && !lineitemScan.get.contains("l_partkey"),
      s"lineitem scan must be pruned to the 3 revenue columns:\n${lineitemScan.get}")
  }

  test("q01 projection: scan pruned to exactly the projected columns") {
    val p = planOf("q01_projection")
    val scan = p.linesIterator.find(_.contains("ReadSchema"))
    assert(scan.isDefined, p)
    val schema = scan.get.substring(scan.get.indexOf("ReadSchema"))
    Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
      .foreach(c => assert(schema.contains(c), s"$c missing from $schema"))
    Seq("l_partkey", "l_suppkey", "l_discount", "l_shipdate")
      .foreach(c => assert(!schema.contains(c), s"$c not pruned in $schema"))
  }

  test("q02 dim lookup: both dimension joins are broadcast hash joins") {
    val p = planOf("q02_dim_lookup")
    val n = "BroadcastHashJoin".r.findAllIn(p).length
    assert(n >= 2, s"expected 2 broadcast dim joins, found $n:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim lookups must not sort-merge:\n$p")
  }

  test("q26 knn: query side broadcast, never a cartesian product") {
    val p = planOf("q26_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row query side must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian product allowed:\n$p")
  }
}
