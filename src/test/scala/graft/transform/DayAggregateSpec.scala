package graft.transform

import graft.SparkSpec
import graft.schema.Fixtures

import java.time.LocalDate

/** G2 consistency: the day fact's pass-through pre-aggregates must equal
  * the aggregates recomputed from the 24 hourly records (the fixture
  * derives day.* from hour.* exactly as the WeatherAPI does).
  */
class DayAggregateSpec extends SparkSpec {

  test("recomputed day aggregates match the day feed's pass-through measures") {
    val raw = Fixtures.rawForecast(spark,
      cities = Seq("New Delhi", "Kolkata"),
      fetchDates = Seq(LocalDate.of(2024, 12, 22)))
    val dayFeed = Feeds.forecastDayFeed(raw).collect()
      .map(r => (r.getAs[String]("location_id"), r.getAs[java.sql.Date]("forecast_date").toString) -> r)
      .toMap
    val recomputed = Feeds.recomputeDayAggregates(raw).collect()
    assert(recomputed.length == 4) // 2 cities x days 1,2
    recomputed.foreach { r =>
      val key = (r.getAs[String]("location_id"), r.getAs[java.sql.Date]("forecast_date").toString)
      val day = dayFeed(key)
      def close(a: Double, b: Double) = math.abs(a - b) < 1e-9
      assert(close(r.getAs[Double]("max_temp_c"), day.getAs[Double]("max_temp_c")))
      assert(close(r.getAs[Double]("avg_temp_c"), day.getAs[Double]("avg_temp_c")))
      assert(close(r.getAs[Double]("min_temp_c"), day.getAs[Double]("min_temp_c")))
      assert(close(r.getAs[Double]("max_wind_kph"), day.getAs[Double]("max_wind_kph")))
      assert(close(r.getAs[Double]("total_precip_mm"), day.getAs[Double]("total_precip_mm")))
      assert(close(r.getAs[Double]("total_snow_cm"), day.getAs[Double]("total_snow_cm")))
      assert(close(r.getAs[Double]("avg_humidity"), day.getAs[Double]("avg_humidity")))
      assert(r.getAs[Int]("daily_will_it_rain") == day.getAs[Int]("daily_will_it_rain"))
      assert(r.getAs[Int]("daily_chance_of_rain") == day.getAs[Int]("daily_chance_of_rain"))
      assert(r.getAs[Int]("daily_will_it_snow") == day.getAs[Int]("daily_will_it_snow"))
      assert(r.getAs[Int]("daily_chance_of_snow") == day.getAs[Int]("daily_chance_of_snow"))
    }
  }
}
