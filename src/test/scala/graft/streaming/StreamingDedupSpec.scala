package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import java.sql.Timestamp

class StreamingDedupSpec extends SparkSpec {

  private def ev(ts: String, k: String) = (Timestamp.valueOf(ts), k)

  test("dropDuplicatesWithinWatermark: dups within the delay dropped, state evicted after") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "event_key")
    val query = StreamingAnalytics.streamingDedup(df, "ts", Seq("event_key"), "30 minutes")
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    // batch 1: A, a duplicate of A ten minutes later (dropped), and B
    input.addData(ev("2024-12-23 00:00:00", "A"), ev("2024-12-23 00:10:00", "A"),
      ev("2024-12-23 00:05:00", "B"))
    query.processAllAvailable()
    // batch 2: far-future row advances the watermark hours past A's state
    input.addData(ev("2024-12-23 06:00:00", "C"))
    query.processAllAvailable()
    // batch 3: A re-arrives AFTER its dedup state was evicted — emitted again
    // (bounded-state semantics: dedup guarantees hold within the watermark)
    input.addData(ev("2024-12-23 06:05:00", "A"))
    query.processAllAvailable()
    query.stop()

    val keys = spark.table("stream_dedup").collect()
      .map(_.getAs[String]("event_key")).toSeq
    assert(keys.count(_ == "A") == 2, s"got $keys") // once per watermark epoch
    assert(keys.count(_ == "B") == 1)
    assert(keys.count(_ == "C") == 1)
    assert(keys.size == 4)
  }
}
