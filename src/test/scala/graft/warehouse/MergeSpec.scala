package graft.warehouse

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import Merge._

  private def df(rows: (String, String, Int)*) = {
    import spark.implicits._
    rows.toDF("k", "v", "ver")
  }

  test("upsert: update path + insert path") {
    val target = df(("a", "old", 1), ("b", "keep", 1))
    val stage = df(("a", "new", 2), ("c", "ins", 2))
    val out = upsert(target, stage, Seq("k")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a" -> "new", "b" -> "keep", "c" -> "ins"))
  }

  test("upsert: idempotent — merging the same stage twice is a no-op") {
    val target = df(("a", "old", 1))
    val stage = df(("a", "new", 2), ("b", "ins", 2))
    val once = upsert(target, stage, Seq("k"))
    val twice = upsert(once, stage, Seq("k"))
    assert(once.collect().map(_.toSeq).toSet == twice.collect().map(_.toSeq).toSet)
  }

  test("upsert: stage-internal duplicates resolved last-wins by version") {
    val target = df(("a", "old", 1))
    val stage = df(("a", "v2", 2), ("a", "v3", 3))
    val out = upsert(target, stage, Seq("k"), version = Seq(col("ver")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a" -> "v3"))
  }

  test("insertNew: appends only unseen keys, never updates") {
    val dim = df(("a", "orig", 1))
    val rows = df(("a", "changed", 2), ("b", "new", 2), ("b", "new", 2))
    val out = insertNew(dim, rows, Seq("k")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a" -> "orig", "b" -> "new"))
  }

  test("verifyCounts: staged == merged after successful upsert") {
    val target = df(("a", "old", 1), ("b", "keep", 1))
    val stage = df(("a", "new", 2), ("c", "ins", 2))
    val merged = upsert(target, stage, Seq("k"))
    val (stagedN, mergedN) = verifyCounts(merged, stage, "k")
    assert(stagedN == 2 && mergedN == 2)
  }
}
