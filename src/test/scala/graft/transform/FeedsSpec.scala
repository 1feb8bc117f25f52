package graft.transform

import graft.SparkSpec
import graft.schema.Fixtures
import org.apache.spark.sql.functions._

import java.time.LocalDate

class FeedsSpec extends SparkSpec {

  private lazy val raw = Fixtures.rawForecast(
    spark,
    cities = Seq("New Delhi", "Mumbai"),
    fetchDates = Seq(LocalDate.of(2024, 12, 22)),
  ).cache()

  test("locationFeed: one row per city with mapped 3-letter key") {
    val rows = Feeds.locationFeed(raw).collect()
    assert(rows.length == 2)
    val byName = rows.map(r => r.getAs[String]("name") -> r.getAs[String]("location_id")).toMap
    assert(byName("New Delhi") == "DEL")
    assert(byName("Mumbai") == "MUM")
  }

  test("currentWeatherFeed: surrogate key {loc}_{yyyyMMdd} and corrected humidity") {
    val rows = Feeds.currentWeatherFeed(raw).collect()
    assert(rows.length == 2)
    val del = rows.find(_.getAs[String]("location_id") == "DEL").get
    assert(del.getAs[String]("current_weather_id") == "DEL_20241222")
    assert(del.getAs[java.sql.Date]("weather_date").toString == "2024-12-22")
  }

  test("currentWeatherFeed: faithful mode reads humidity from cloud") {
    val feed = Feeds.currentWeatherFeed(raw, faithfulHumidityBug = true)
    feed.collect().foreach { r =>
      assert(r.getAs[Int]("humidity") == r.getAs[Int]("cloud"))
    }
  }

  test("forecastDayFeed: exactly days 1,2 kept; index 0 discarded; key format") {
    val rows = Feeds.forecastDayFeed(raw).collect()
    assert(rows.length == 4) // 2 cities × 2 days
    val dates = rows.filter(_.getAs[String]("location_id") == "DEL")
      .map(_.getAs[java.sql.Date]("forecast_date").toString).sorted
    assert(dates.toSeq == Seq("2024-12-23", "2024-12-24")) // not 12-22
    val keys = rows.map(_.getAs[String]("forecast_day_weather_id")).toSet
    assert(keys.contains("DEL_20241223") && keys.contains("MUM_20241224"))
  }

  test("forecastDayFeed: column order matches the reference feed") {
    assert(Feeds.forecastDayFeed(raw).columns.toSeq == Seq(
      "forecast_date", "max_temp_c", "avg_temp_c", "min_temp_c",
      "max_wind_kph", "total_precip_mm", "total_snow_cm", "avg_humidity",
      "daily_will_it_rain", "daily_chance_of_rain", "daily_will_it_snow",
      "daily_chance_of_snow", "uv", "sunrise_time", "sunset_time",
      "moonrise_time", "moonset_time", "condition_code", "location_id",
      "forecast_day_weather_id"))
  }

  test("forecastHourFeed: 3 slots × 2 days per city; unpadded slot in key") {
    val rows = Feeds.forecastHourFeed(raw).collect()
    assert(rows.length == 12) // 2 cities × 2 days × 3 hours
    val delKeys = rows.filter(_.getAs[String]("location_id") == "DEL")
      .map(_.getAs[String]("forecast_hour_weather_id")).sorted.toSeq
    assert(delKeys == Seq(
      "DEL_20241223_0", "DEL_20241223_10", "DEL_20241223_20",
      "DEL_20241224_0", "DEL_20241224_10", "DEL_20241224_20"))
    // hour slot in the key equals hour-of-day of forecast_datetime
    rows.foreach { r =>
      val slot = r.getAs[String]("forecast_hour_weather_id").split("_").last.toInt
      val ts = r.getAs[java.sql.Timestamp]("forecast_datetime")
      assert(ts.toLocalDateTime.getHour == slot)
    }
  }

  test("conditionFeed: distinct codes per file, first-occurrence text wins") {
    val feed = Feeds.conditionFeed(raw)
    val rows = feed.collect()
    // per file no duplicate codes
    val dupes = rows.groupBy(r => (r.getAs[String]("file_id"), r.getAs[Int]("condition_code")))
      .filter(_._2.length > 1)
    assert(dupes.isEmpty)
    // current's condition must be present with current's text (rank 0 wins)
    val cur = raw.select(col("location.name"), col("current.condition.code").as("code"),
      col("current.condition.text").as("text")).collect()
    val feedByCode = rows.map(r => (r.getAs[String]("file_id").take(3), r.getAs[Int]("condition_code")) ->
      r.getAs[String]("condition_name")).toMap
    cur.foreach { c =>
      val locId = graft.schema.WeatherSchema.locationMap.toMap.apply(c.getString(0))
      assert(feedByCode((locId, c.getInt(1))) == c.getString(2))
    }
  }

  test("unknown city keeps flowing with a null location_id (left dim lookup, not a crash)") {
    val unknown = Fixtures.rawForecast(spark, cities = Seq("Atlantis"),
      fetchDates = Seq(java.time.LocalDate.of(2024, 12, 22)))
    val rows = Feeds.currentWeatherFeed(unknown).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("location_id") == null)
  }

  test("normalizeConditionName: code 1000 → Sunny, others unchanged") {
    import spark.implicits._
    val df = Seq((1000, "Clear"), (1003, "Partly cloudy")).toDF("code", "name")
      .select(Feeds.normalizeConditionName(col("code"), col("name")).as("n"))
    assert(df.as[String].collect().sorted.toSeq == Seq("Partly cloudy", "Sunny"))
  }
}
