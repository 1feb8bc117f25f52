package graft.transform

import graft.SparkSpec
import graft.schema.Fixtures

import java.time.LocalDate

class TypedFeedsSpec extends SparkSpec {

  private lazy val raw = Fixtures.rawForecast(
    spark, Seq("New Delhi"), Seq(LocalDate.of(2024, 12, 22)))

  test("typed views decode every feed with the case-class encoders") {
    val loc = TypedFeeds.location(raw).collect()
    assert(loc.map(_.location_id).toSeq == Seq("DEL"))

    val cur = TypedFeeds.currentWeather(raw).head()
    assert(cur.current_weather_id == "DEL_20241222")
    assert(cur.weather_date.toString == "2024-12-22")

    val days = TypedFeeds.forecastDay(raw).collect()
    assert(days.map(_.forecast_day_weather_id).sorted.toSeq ==
      Seq("DEL_20241223", "DEL_20241224"))

    val hours = TypedFeeds.forecastHour(raw).collect()
    assert(hours.length == 6)
    hours.foreach(h => assert(h.forecast_hour_weather_id.startsWith(h.forecast_day_weather_id)))

    val conds = TypedFeeds.condition(raw).collect()
    assert(conds.map(_.condition_code).distinct.length == conds.length)
  }

  test("typed API composes: Dataset filter + map on decoded objects") {
    val warm = TypedFeeds.forecastHour(raw)
      .filter(_.temp_c > 0)
      .map(h => h.location_id -> h.temp_c)(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.scalaDouble))
      .collect()
    assert(warm.length == 6)
    assert(warm.forall(_._1 == "DEL"))
  }
}
