package graft.queries

import graft.SparkSpec
import graft.queries.RefQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The judged streaming queries (q72-q75) must equal their batch
  * semantics — the same equality the DuckDB oracle checks externally,
  * proven here in-JVM at sf0.001 so a contract break fails fast in
  * `sbt test` rather than at verify time.
  */
class StreamingQueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String): DataFrame =
    graft.SparkEntry.queries(name)(spark, sfDir)

  private def batchEvents: DataFrame =
    RefQueries.normalizeEventTs(spark.read.parquet(s"$sfDir/events.parquet"))

  private def assertSame(streaming: DataFrame, batch: DataFrame): Unit = {
    val s = streaming.collect().map(_.toString)
    val b = batch.collect().map(_.toString)
    assert(s.length == b.length, s"row counts differ: ${s.length} vs ${b.length}")
    assert(s.sameElements(b),
      s.zip(b).filter { case (x, y) => x != y }.take(5).mkString("first diffs:\n", "\n", ""))
  }

  test("q72 streaming dedup equals batch SELECT DISTINCT") {
    assertSame(run("q72_stream_dedup"),
      batchEvents.select("user_id", "event_type").distinct()
        .orderBy("user_id", "event_type"))
  }

  test("q73 streaming sessions equal batch session_window") {
    assertSame(run("q73_stream_sessions"),
      batchEvents
        .groupBy(session_window(col("ts"), "1 hour"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"), col("n_events"))
        .orderBy("user_id", "session_start"))
  }

  test("q203 crawl-curate loop: kept ⊆ gated, exact pairs resolved, cross-batch near-dups resolved") {
    import graft.ops.Dedup
    val out = run("q203_stream_crawl_curate").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // universe: every non-benchmark document, exactly once
    assert(out.length == docs.filter(col("doc_id") % 20 =!= 7).count())
    assert(out.map(_._1).distinct.length == out.length)
    // a doc the gate dropped can never be admitted
    out.foreach { case (id, gated, kept) =>
      assert(!kept || gated, s"doc $id kept without being gated")
    }
    val keptIds = out.filter(_._3).map(_._1)
    assert(keptIds.nonEmpty && keptIds.length < out.length)
    import spark.implicits._
    val keptDocs = docs.join(keptIds.toSeq.toDF("doc_id"), Seq("doc_id"), "left_semi")
    // exact dedup: no two admitted docs share a text hash
    assert(keptDocs.count() ==
      keptDocs.select(md5(col("text"))).distinct().count())
    // near dedup: no admitted pair from DIFFERENT batches at Jaccard
    // >= 0.5 (the loop checks batch-vs-index only, so same-batch pairs
    // are outside its contract)
    val crossBatch = Dedup.jaccardNearDup(keptDocs, "doc_id", "text",
        threshold = 0.5, shingleK = 3, maxShingleDf = 1000)
      .filter(pmod(col("id_a"), lit(4)) =!= pmod(col("id_b"), lit(4)))
      .count()
    assert(crossBatch == 0, s"$crossBatch surviving cross-batch near-dup pairs")
  }

  test("q206 media crawl loop: batch-0 admitted, staged dups dropped, cross-modal coupling observable") {
    val out = run("q206_stream_media_crawl").collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(out.length == docs.count())
    assert(out.map(_._1).distinct.length == out.length)
    // batch 0 probes three empty stores: everything is admitted
    out.filter(_._1 % 4 == 0).foreach { case (id, kept) =>
      assert(kept, s"batch-0 doc $id not admitted")
    }
    // the staged image duplicate (8g+1 vs its batch-0 anchor 8g) and
    // the staged video duplicate (8g+5 vs 8g) are ALWAYS dropped —
    // their anchors are admitted in batch 0 unconditionally
    out.filter(t => t._1 % 8 == 1 || t._1 % 8 == 5).foreach {
      case (id, kept) => assert(!kept, s"staged duplicate $id survived")
    }
    // CROSS-MODAL COUPLING: 8g+3's audio anchor 8g+1 was image-dropped
    // in batch 1, so its signature never entered the audio store and
    // 8g+3 survives batch 3. Three independent per-modality loops
    // (each storing every batch's signatures) would drop ALL of them.
    val coupled = out.filter(_._1 % 8 == 3)
    assert(coupled.count(_._2) > coupled.length / 2,
      s"coupling invisible: ${coupled.count(_._2)}/${coupled.length} of " +
        "the anchor-dropped audio duplicates survived")
  }

  test("q74 streaming interval join equals batch interval join") {
    val ev = batchEvents
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("user_id_c"),
        col("ts").as("click_ts"))
    val batch = p.join(c,
        col("user_id") === col("user_id_c") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
          col("click_ts") <= col("purchase_ts"))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("click_id"), col("click_ts"))
      .orderBy("purchase_id", "click_id")
    assertSame(run("q74_stream_interval_join"), batch)
  }

  test("q75 streaming windowed agg equals batch day-window agg") {
    assertSame(run("q75_stream_windowed"),
      batchEvents
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
        .select(col("window.start").as("day_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("day_start", "event_type"))
  }
}
