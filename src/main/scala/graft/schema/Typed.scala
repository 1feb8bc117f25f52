package graft.schema

import java.sql.{Date, Timestamp}

/** Case-class model of the five feed relations — the typed `Dataset[T]`
  * surface for callers that want compile-time safety over the
  * `DataFrame` feeds (the driver contract stays DataFrame-based; both
  * views share one schema, see `TypedFeeds`).
  */
object Typed {

  final case class Location(
      location_id: String, name: String, region: String, country: String,
      latitude: Double, longitude: Double)

  final case class Condition(condition_code: Int, condition_name: String)

  final case class CurrentWeather(
      current_weather_id: String, location_id: String, condition_code: Int,
      temperature_c: Double, is_day: Int, wind_kph: Double, wind_dir: String,
      pressure_mb: Double, precip_mm: Double, humidity: Int, cloud: Int,
      dewpoint_c: Double, gust_kph: Double, weather_date: Date)

  final case class ForecastDay(
      forecast_date: Date, max_temp_c: Double, avg_temp_c: Double,
      min_temp_c: Double, max_wind_kph: Double, total_precip_mm: Double,
      total_snow_cm: Double, avg_humidity: Double, daily_will_it_rain: Int,
      daily_chance_of_rain: Int, daily_will_it_snow: Int,
      daily_chance_of_snow: Int, uv: Double, sunrise_time: String,
      sunset_time: String, moonrise_time: String, moonset_time: String,
      condition_code: Int, location_id: String, forecast_day_weather_id: String)

  final case class ForecastHour(
      forecast_datetime: Timestamp, condition_code: Int, temp_c: Double,
      is_day: Int, wind_kph: Double, wind_dir: String, pressure_mb: Double,
      precip_mm: Double, humidity: Int, cloud: Int, dewpoint_c: Double,
      gust_kph: Double, will_it_rain: Int, chance_of_rain: Int,
      will_it_snow: Int, chance_of_snow: Int, snow_cm: Double, uv: Double,
      location_id: String, forecast_day_weather_id: String,
      forecast_hour_weather_id: String)
}
