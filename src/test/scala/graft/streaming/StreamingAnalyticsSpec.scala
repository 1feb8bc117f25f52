package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.sql.Timestamp

class StreamingAnalyticsSpec extends SparkSpec {

  private def hourRow(ts: String, loc: String, temp: Double, precip: Double) =
    (Timestamp.valueOf(ts), loc, temp, precip)

  test("windowedStats: tumbling event-time windows with watermark, late data dropped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String, Double, Double)]
    val hourFeed = input.toDF()
      .toDF("forecast_datetime", "location_id", "temp_c", "precip_mm")
    val query = StreamingAnalytics.windowedStats(hourFeed, watermark = "1 hour", windowLen = "6 hours")
      .writeStream.format("memory").queryName("windowed_stats")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    // batch 1: two cities in the 00:00-06:00 window, plus a row far ahead
    // that advances the watermark past that window on the next batch
    input.addData(
      hourRow("2024-12-23 00:00:00", "DEL", 10.0, 0.0),
      hourRow("2024-12-23 05:00:00", "DEL", 20.0, 1.5),
      hourRow("2024-12-23 01:00:00", "MUM", 25.0, 0.0))
    query.processAllAvailable()
    input.addData(hourRow("2024-12-23 12:00:00", "DEL", 30.0, 0.0))
    query.processAllAvailable()
    // batch 3: a LATE row for the already-closed 00:00 window — must be dropped
    input.addData(hourRow("2024-12-23 00:30:00", "DEL", 99.0, 9.9))
    query.processAllAvailable()
    // close remaining windows
    input.addData(hourRow("2024-12-24 12:00:00", "DEL", 15.0, 0.0))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("windowed_stats")
      .filter(col("window_start") === "2024-12-23 00:00:00")
      .collect().map(r => r.getAs[String]("location_id") ->
        (r.getAs[Double]("avg_temp_c"), r.getAs[Double]("max_temp_c"), r.getAs[Long]("n_obs")))
      .toMap
    assert(rows("DEL") == ((15.0, 20.0, 2L))) // late 99.0 row NOT included
    assert(rows("MUM") == ((25.0, 25.0, 1L)))
  }

  test("sessionStats over a watermarked stream: close sessions emit after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String, Double, Double)]
    val feed = input.toDF().toDF("forecast_datetime", "location_id", "temp_c", "precip_mm")
    val query = StreamingAnalytics.sessionStats(feed, "forecast_datetime", "location_id",
        gap = "30 minutes", watermark = Some("10 minutes"))
      .writeStream.format("memory").queryName("session_stats")
      .outputMode("append").start()
    // two bursts 2h apart -> two sessions; a far-future row closes them
    input.addData(
      hourRow("2024-12-23 00:00:00", "DEL", 10.0, 0.0),
      hourRow("2024-12-23 00:10:00", "DEL", 11.0, 0.0),
      hourRow("2024-12-23 02:00:00", "DEL", 12.0, 0.0))
    query.processAllAvailable()
    input.addData(hourRow("2024-12-24 00:00:00", "DEL", 0.0, 0.0))
    query.processAllAvailable()
    query.stop()
    val sessions = spark.table("session_stats")
      .collect().map(r => (r.getAs[Timestamp]("session_start").toString,
        r.getAs[Timestamp]("session_end").toString, r.getAs[Long]("n_events")))
      .sorted
    assert(sessions.contains(("2024-12-23 00:00:00.0", "2024-12-23 00:40:00.0", 2L)))
    assert(sessions.contains(("2024-12-23 02:00:00.0", "2024-12-23 02:30:00.0", 1L)))
  }

  test("temperatureAlerts: one alert per excursion, hysteresis across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String, Double, Double)]
    val feed = input.toDF().toDF("forecast_datetime", "location_id", "temp_c", "precip_mm")
    val query = StreamingAnalytics.temperatureAlerts(feed, threshold = 35.0)
      .writeStream.format("memory").queryName("temp_alerts")
      .outputMode("append").start()

    input.addData(hourRow("2024-12-23 00:00:00", "DEL", 30.0, 0.0)) // below
    query.processAllAvailable()
    input.addData(hourRow("2024-12-23 01:00:00", "DEL", 36.0, 0.0)) // crosses -> alert
    query.processAllAvailable()
    input.addData(hourRow("2024-12-23 02:00:00", "DEL", 38.0, 0.0)) // still hot -> suppressed
    query.processAllAvailable()
    input.addData(hourRow("2024-12-23 03:00:00", "DEL", 20.0, 0.0)) // cools -> reset
    query.processAllAvailable()
    input.addData(hourRow("2024-12-23 04:00:00", "DEL", 40.0, 0.0)) // crosses again -> alert
    query.processAllAvailable()
    query.stop()

    val alerts = spark.table("temp_alerts").collect()
      .map(r => r.getAs[String]("locationId") -> r.getAs[Double]("maxTemp")).toSeq.sorted
    assert(alerts == Seq("DEL" -> 36.0, "DEL" -> 40.0))
  }

  test("runningExtremes: state accumulates across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String, Double, Double)]
    val hourFeed = input.toDF()
      .toDF("forecast_datetime", "location_id", "temp_c", "precip_mm")
    val query = StreamingAnalytics.runningExtremes(hourFeed)
      .writeStream.format("memory").queryName("running_extremes")
      .outputMode("update").start()

    input.addData(hourRow("2024-12-23 00:00:00", "DEL", 10.0, 0.0))
    query.processAllAvailable()
    input.addData(
      hourRow("2024-12-23 01:00:00", "DEL", 35.0, 0.0),
      hourRow("2024-12-23 01:00:00", "MUM", 22.0, 0.0))
    query.processAllAvailable()
    query.stop()

    val last = spark.table("running_extremes")
      .groupBy("locationId")
      .agg(max("nObs").as("n"), max("maxTemp").as("mx"), min("minTemp").as("mn"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(last("DEL") == ((2L, 35.0, 10.0)))
    assert(last("MUM") == ((1L, 22.0, 22.0)))
  }
}
