package graft.warehouse

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("buildHistory collapses attribute runs with correct validity") {
    val df = Seq(
      (1L, "A", ts("2024-01-01"), 1L),
      (1L, "A", ts("2024-01-05"), 2L),
      (1L, "B", ts("2024-02-01"), 3L),
      (1L, "A", ts("2024-03-01"), 4L),
      (2L, "X", ts("2024-01-10"), 5L),
    ).toDF("k", "attr", "t", "tie")
    val h = Scd2.buildHistory(df, "k", "attr", "t", "tie")
      .select("k", "attr", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4))).toSet
    assert(h == Set(
      (1L, "A", ts("2024-01-01"), Some(ts("2024-02-01")), false),
      (1L, "B", ts("2024-02-01"), Some(ts("2024-03-01")), false),
      (1L, "A", ts("2024-03-01"), None, true),
      (2L, "X", ts("2024-01-10"), None, true),
    ))
  }

  test("same-timestamp changes order by the tie column") {
    val df = Seq(
      (1L, "A", ts("2024-01-01"), 1L),
      (1L, "B", ts("2024-01-01"), 2L),
    ).toDF("k", "attr", "t", "tie")
    val h = Scd2.buildHistory(df, "k", "attr", "t", "tie")
    assert(h.filter(col("is_current")).select("attr").as[String].collect().toSeq == Seq("B"))
    assert(h.count() == 2)
  }

  test("applySnapshot closes changed keys, appends new, is idempotent") {
    val dim = Seq(
      (1L, "A", ts("2024-01-01"), null.asInstanceOf[Timestamp], true),
      (2L, "X", ts("2024-01-01"), null.asInstanceOf[Timestamp], true),
    ).toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val snap = Seq((1L, "B"), (2L, "X"), (3L, "Z")).toDF("k", "attr")
    val once = Scd2.applySnapshot(dim, snap, "k", "attr", lit(ts("2024-02-01")))
    val cur = once.filter(col("is_current"))
      .select("k", "attr").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(cur == Set((1L, "B"), (2L, "X"), (3L, "Z")))
    // key 1's old row is closed at the snapshot time
    val closed = once.filter(col("k") === 1L && !col("is_current")).collect()
    assert(closed.map(_.getAs[Timestamp]("valid_to")).toSeq == Seq(ts("2024-02-01")))
    // re-applying the identical snapshot changes nothing
    val twice = Scd2.applySnapshot(once, snap, "k", "attr", lit(ts("2024-03-01")))
    assert(twice.count() == once.count())
    assert(twice.filter(col("is_current")).count() == 3)
  }

  test("applySnapshot is null-safe: NULL attr changes detected, NULL->NULL idempotent") {
    val dim = Seq(
      (1L, "A", ts("2024-01-01"), null.asInstanceOf[Timestamp], true),
      (2L, null.asInstanceOf[String], ts("2024-01-01"), null.asInstanceOf[Timestamp], true),
    ).toDF("k", "attr", "valid_from", "valid_to", "is_current")
    // key 1 changes TO null, key 2 stays null (no change)
    val snap = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
      .toDF("k", "attr")
    val once = Scd2.applySnapshot(dim, snap, "k", "attr", lit(ts("2024-02-01")))
    assert(once.count() == 3) // key 1 closed + new null row; key 2 untouched
    val cur = once.filter(col("is_current")).select("k", "attr")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(cur == Set((1L, None), (2L, None)))
    // idempotency with null attributes
    val twice = Scd2.applySnapshot(once, snap, "k", "attr", lit(ts("2024-03-01")))
    assert(twice.count() == 3)
  }
}
