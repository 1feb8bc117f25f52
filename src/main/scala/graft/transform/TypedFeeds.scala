package graft.transform

import graft.schema.Typed._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed `Dataset[T]` views over the feed relations: same plans as
  * [[Feeds]] (`.as[T]` adds no execution step, only compile-time
  * checking via the case-class encoders).
  */
object TypedFeeds {

  private def as[T: org.apache.spark.sql.Encoder](df: DataFrame): Dataset[T] = df.as[T]

  def location(raw: DataFrame): Dataset[Location] = {
    val spark = raw.sparkSession; import spark.implicits._
    as[Location](Feeds.locationFeed(raw))
  }

  def condition(raw: DataFrame): Dataset[Condition] = {
    val spark = raw.sparkSession; import spark.implicits._
    as[Condition](Feeds.conditionFeed(raw).select("condition_code", "condition_name"))
  }

  def currentWeather(raw: DataFrame): Dataset[CurrentWeather] = {
    val spark = raw.sparkSession; import spark.implicits._
    as[CurrentWeather](Feeds.currentWeatherFeed(raw))
  }

  def forecastDay(raw: DataFrame): Dataset[ForecastDay] = {
    val spark = raw.sparkSession; import spark.implicits._
    as[ForecastDay](Feeds.forecastDayFeed(raw))
  }

  def forecastHour(raw: DataFrame): Dataset[ForecastHour] = {
    val spark = raw.sparkSession; import spark.implicits._
    as[ForecastHour](Feeds.forecastHourFeed(raw))
  }
}
