package graft.warehouse

import graft.SparkSpec

import java.nio.file.Files

class BucketedWarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("merge touches only the buckets the stage hashes into; untouched files survive byte-identical") {
    val root = Files.createTempDirectory("graft_bucketed").toString
    val wh = new BucketedWarehouse(spark, root, numBuckets = 8)

    // initial load: 64 keys spread across all 8 buckets
    val init = (1 to 64).map(i => (s"k$i", s"v$i")).toDF("k", "v")
    wh.mergeInto("t", init, Seq("k"))
    assert(wh.bucketDirs("t").nonEmpty)
    val before: Map[Int, Set[String]] =
      wh.bucketDirs("t").map(b => b -> wh.dataFiles("t", b)).toMap

    // incremental: one update + one insert — hashes into at most 2 buckets
    val stage = Seq(("k1", "v1_new"), ("k999", "fresh")).toDF("k", "v")
    wh.mergeInto("t", stage, Seq("k"))

    val out = wh.read("t").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out.size == 65)
    assert(out("k1") == "v1_new")
    assert(out("k999") == "fresh")
    assert(out("k2") == "v2")

    // untouched bucket partitions must still contain the original files
    val after = wh.bucketDirs("t").map(b => b -> wh.dataFiles("t", b)).toMap
    val changed = before.keys.filter(b => before(b) != after.getOrElse(b, Set.empty)).toSeq
    assert(changed.size <= 2, s"expected <=2 rewritten buckets, got $changed")
    (before.keySet -- changed).foreach { b =>
      assert(before(b) == after(b), s"bucket $b was rewritten unnecessarily")
    }
  }

  test("merge is idempotent under re-delivery") {
    val root = Files.createTempDirectory("graft_bucketed2").toString
    val wh = new BucketedWarehouse(spark, root, numBuckets = 4)
    val init = (1 to 10).map(i => (s"k$i", i)).toDF("k", "n")
    wh.mergeInto("t", init, Seq("k"))
    val stage = Seq(("k3", 33), ("k11", 11)).toDF("k", "n")
    wh.mergeInto("t", stage, Seq("k"))
    val first = wh.read("t").collect().map(_.toSeq).toSet
    wh.mergeInto("t", stage, Seq("k"))
    assert(wh.read("t").collect().map(_.toSeq).toSet == first)
  }
}
