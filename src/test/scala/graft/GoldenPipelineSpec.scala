package graft

import graft.schema.Fixtures
import graft.transform.Feeds
import graft.warehouse.Merge
import org.apache.spark.sql.functions._

import java.time.LocalDate

/** Golden end-to-end test (SURVEY.md §5.2): the deterministic fixture for
  * (New Delhi, 2024-12-22, seed 42) must transform to exactly these
  * values, batch after batch, release after release. A change here means
  * the transform semantics or the fixture generator changed — both are
  * breaking.
  */
class GoldenPipelineSpec extends SparkSpec {

  private lazy val raw = Fixtures.rawForecast(
    spark, Seq("New Delhi"), Seq(LocalDate.of(2024, 12, 22))).cache()

  test("golden: location feed") {
    val r = Feeds.locationFeed(raw).head()
    assert(r.toSeq == Seq("DEL", "New Delhi", "New Delhi Region", "India", 28.81, 78.37))
  }

  test("golden: current weather feed") {
    val r = Feeds.currentWeatherFeed(raw).head()
    assert(r.getAs[String]("current_weather_id") == "DEL_20241222")
    assert(r.getAs[Int]("condition_code") == 1009)
    assert(r.getAs[Double]("temperature_c") == 19.6)
    assert(r.getAs[Double]("wind_kph") == 12.0)
    assert(r.getAs[String]("wind_dir") == "SW")
    assert(r.getAs[Int]("humidity") == 24) // corrected semantics: NOT cloud (69)
    assert(r.getAs[Int]("cloud") == 69)
    assert(r.getAs[java.sql.Date]("weather_date").toString == "2024-12-22")
  }

  test("golden: forecast day feed (day 1)") {
    val r = Feeds.forecastDayFeed(raw)
      .filter(col("forecast_day_weather_id") === "DEL_20241223").head()
    assert(r.getAs[Double]("max_temp_c") == 34.0)
    assert(r.getAs[Double]("avg_temp_c") == 19.7)
    assert(r.getAs[Double]("min_temp_c") == 10.6)
    assert(r.getAs[Double]("max_wind_kph") == 37.2)
    assert(r.getAs[Double]("total_precip_mm") == 50.2)
    assert(r.getAs[Double]("avg_humidity") == 54.083333333333336)
    assert(r.getAs[Int]("daily_chance_of_rain") == 92)
    assert(r.getAs[String]("sunrise_time") == "06:46 AM")
    assert(r.getAs[Int]("condition_code") == 1063)
  }

  test("golden: forecast hour feed (slot 10 of day 1)") {
    val r = Feeds.forecastHourFeed(raw)
      .filter(col("forecast_hour_weather_id") === "DEL_20241223_10").head()
    assert(r.getAs[java.sql.Timestamp]("forecast_datetime").toString == "2024-12-23 10:00:00.0")
    assert(r.getAs[Int]("condition_code") == 1063)
    assert(r.getAs[Double]("temp_c") == 23.1)
    assert(r.getAs[Int]("is_day") == 1)
    assert(r.getAs[String]("forecast_day_weather_id") == "DEL_20241223")
  }

  test("golden: condition feed — the exact harvested set") {
    val got = Feeds.conditionFeed(raw).collect()
      .map(r => r.getAs[Int]("condition_code") -> r.getAs[String]("condition_name"))
      .toMap
    assert(got == Map(
      1000 -> "Clear", 1003 -> "Partly cloudy", 1006 -> "Cloudy",
      1009 -> "Overcast", 1063 -> "Patchy rain possible", 1183 -> "Light rain"))
  }

  test("golden: two-round merge — revision overwrites, no duplicates, update beats insert") {
    val round1 = Feeds.forecastDayFeed(raw)
    val raw2 = Fixtures.rawForecast(spark, Seq("New Delhi"), Seq(LocalDate.of(2024, 12, 23)))
    val round2 = Feeds.forecastDayFeed(raw2)

    val target1 = Merge.dedupLastWins(round1, Seq("forecast_day_weather_id"), Nil)
    val target2 = Merge.upsert(target1, round2, Seq("forecast_day_weather_id"))

    val keys = target2.select("forecast_day_weather_id").collect().map(_.getString(0)).sorted
    assert(keys.toSeq == Seq("DEL_20241223", "DEL_20241224", "DEL_20241225"))

    // DEL_20241224 appears in both rounds: round 2's revision must win
    val expected24 = round2.filter(col("forecast_day_weather_id") === "DEL_20241224")
      .head().getAs[Double]("max_temp_c")
    val merged24 = target2.filter(col("forecast_day_weather_id") === "DEL_20241224")
      .head().getAs[Double]("max_temp_c")
    assert(merged24 == expected24)
    // and differ from round 1's value (the fixture revises forecasts)
    val old24 = round1.filter(col("forecast_day_weather_id") === "DEL_20241224")
      .head().getAs[Double]("max_temp_c")
    assert(old24 != expected24)
  }
}
