package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import java.sql.Timestamp

class StreamStreamJoinSpec extends SparkSpec {

  private def ev(ts: String, k: String, v: Double) = (Timestamp.valueOf(ts), k, v)

  test("stream-stream interval join matches only within the lookback window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val errors = MemoryStream[(Timestamp, String, Double)]
    val clicks = MemoryStream[(Timestamp, String, Double)]
    val errDf = errors.toDF().toDF("ts", "user", "ecode")
    val clkDf = clicks.toDF().toDF("ts", "user", "cval")
    val query = StreamingAnalytics.streamStreamIntervalJoin(
        errDf, clkDf, "user", "ts", lookback = "30 minutes", watermark = "1 hour")
      .selectExpr("user", "ts", "ts_r", "cval_r")
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    clicks.addData(
      ev("2024-12-23 00:00:00", "u1", 1.0),   // 40 min before error — outside lookback
      ev("2024-12-23 00:20:00", "u1", 2.0),   // 20 min before — inside
      ev("2024-12-23 00:35:00", "u1", 3.0),   // 5 min before — inside
      ev("2024-12-23 00:50:00", "u1", 4.0),   // AFTER the error — excluded
      ev("2024-12-23 00:30:00", "u2", 9.0))   // other user
    errors.addData(ev("2024-12-23 00:40:00", "u1", 500.0))
    query.processAllAvailable()
    // advance both watermarks so results flush in append mode
    clicks.addData(ev("2024-12-23 06:00:00", "u9", 0.0))
    errors.addData(ev("2024-12-23 06:00:00", "u9", 0.0))
    query.processAllAvailable()
    query.stop()

    val got = spark.table("ss_join")
      .filter($"user" === "u1")
      .collect().map(_.getAs[Double]("cval_r")).toSet
    assert(got == Set(2.0, 3.0), s"got $got")
  }
}
