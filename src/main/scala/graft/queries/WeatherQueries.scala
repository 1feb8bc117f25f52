package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The analysis layer over the weather star schema — the queries the
  * reference's warehouse exists to serve (README.md:4 "loads it into
  * Snowflake for further analysis"; FK edges in Data Model.png). Each
  * takes the warehouse root written by `PipelineMain`/`StreamingPipeline`
  * and follows the star-join discipline: facts stream, dims broadcast.
  */
object WeatherQueries {

  private def t(s: SparkSession, wh: String, table: String): DataFrame =
    s.read.parquet(s"$wh/$table")

  /** Current conditions per city: the M6 flagship (fact ⋈ both dims). */
  def currentByCity(s: SparkSession, wh: String): DataFrame =
    t(s, wh, "fact_current_day_weather")
      .join(broadcast(t(s, wh, "dim_location")), "location_id")
      .join(broadcast(t(s, wh, "dim_condition")), "condition_code")
      .select(col("name"), col("weather_date"), col("temperature_c"),
        col("humidity"), col("wind_kph"), col("condition_name"))
      .orderBy("name", "weather_date")

  /** Hottest city per forecast day (top-1 per group via max_by). */
  def hottestCityPerDay(s: SparkSession, wh: String): DataFrame =
    t(s, wh, "fact_forecast_day_weather")
      .join(broadcast(t(s, wh, "dim_location")), "location_id")
      .groupBy(col("forecast_date"))
      .agg(max_by(col("name"), struct(col("max_temp_c"), col("name"))).as("hottest_city"),
        max(col("max_temp_c")).as("max_temp_c"))
      .orderBy("forecast_date")

  /** Rain outlook: chance-of-rain distribution per city across the
    * forecast horizon.
    */
  def rainOutlook(s: SparkSession, wh: String): DataFrame =
    t(s, wh, "fact_forecast_day_weather")
      .join(broadcast(t(s, wh, "dim_location")), "location_id")
      .groupBy(col("name"))
      .agg(avg(col("daily_chance_of_rain")).as("avg_chance_of_rain"),
        max(col("daily_chance_of_rain")).as("max_chance_of_rain"),
        sum(col("daily_will_it_rain")).as("rainy_days"))
      .orderBy("name")

  /** Day/hour fact integrity: every hour row joins its day row (the
    * FORECAST_DAY_WEATHER_ID FK, reference: forecast_hour_weather.sql:28)
    * — returns orphaned hour keys (expected empty).
    */
  def orphanedHourRows(s: SparkSession, wh: String): DataFrame =
    t(s, wh, "fact_forecast_hour_weather")
      .join(t(s, wh, "fact_forecast_day_weather").select("forecast_day_weather_id"),
        Seq("forecast_day_weather_id"), "left_anti")
      .select("forecast_hour_weather_id")

  /** Condition distribution across the sampled forecast hours. */
  def conditionDistribution(s: SparkSession, wh: String): DataFrame =
    t(s, wh, "fact_forecast_hour_weather")
      .join(broadcast(t(s, wh, "dim_condition")), "condition_code")
      .groupBy(col("condition_name"))
      .agg(count(lit(1)).as("n_hours"),
        avg(col("temp_c")).as("avg_temp_c"))
      .orderBy(col("n_hours").desc, col("condition_name"))
}
