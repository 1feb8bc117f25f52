package graft.transform

import graft.schema.WeatherSchema
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The transform layer: pure `DataFrame => DataFrame` functions, one per
  * staging feed of the reference pipeline
  * (reference: DataTransformation.py:126-247). Input is the raw forecast
  * relation with schema [[WeatherSchema.root]] — one row per raw file
  * (city × fetch day).
  *
  * Spark-first notes, per feed:
  *  - no `json_normalize` flatten step exists: nested fields are read in
  *    place (`$"current.condition.code"`), which lets Catalyst's nested
  *    schema pruning push the narrow read into the scan;
  *  - the city→key dict (reference: DataTransformation.py:10-21) is a
  *    broadcast-joined dimension, not a literal `CASE`: at 100 TB the
  *    lookup table may grow past literal-expression sizes, and a broadcast
  *    hash join keeps the probe side shuffle-free;
  *  - array sampling (`day[1,2]`, `hour[0,10,20]`,
  *    reference: DataTransformation.py:96-97,202-205) is `posexplode` +
  *    positional filter, evaluated inside whole-stage codegen.
  */
object Feeds {

  /** Tiny city→code dimension used by every feed (E1). */
  def locationKeys(spark: SparkSession): DataFrame = {
    import spark.implicits._
    WeatherSchema.locationMap.toDF("city_name", "location_id")
  }

  private def withLocationId(raw: DataFrame): DataFrame = {
    val keys = locationKeys(raw.sparkSession)
    // Broadcast: the dim is tiny; keeps the (huge) raw side un-shuffled.
    raw.join(broadcast(keys), raw("location.name") === keys("city_name"), "left")
      .drop("city_name")
  }

  /** DIM_LOCATION feed: one row per city
    * (reference: DataTransformation.py:153-164).
    */
  def locationFeed(raw: DataFrame): DataFrame =
    withLocationId(raw).select(
      col("location_id"),
      col("location.name").as("name"),
      col("location.region").as("region"),
      col("location.country").as("country"),
      col("location.lat").as("latitude"),
      col("location.lon").as("longitude"),
    ).dropDuplicates("location_id")

  /** FACT_CURRENT_DAY_WEATHER feed
    * (reference: DataTransformation.py:168-198). Surrogate key
    * `{loc}_{yyyyMMdd(last_updated)}` (E5).
    *
    * @param faithfulHumidityBug reproduce the reference's
    *   humidity←cloud mix-up (reference: DataTransformation.py:189);
    *   default is the corrected semantics (SURVEY.md §2.3 note).
    */
  def currentWeatherFeed(raw: DataFrame, faithfulHumidityBug: Boolean = false): DataFrame = {
    val ts = to_timestamp(col("current.last_updated"), "yyyy-MM-dd HH:mm")
    val humidity =
      if (faithfulHumidityBug) col("current.cloud") else col("current.humidity")
    withLocationId(raw).select(
      concat_ws("_", col("location_id"), date_format(ts, "yyyyMMdd"))
        .as("current_weather_id"),
      col("location_id"),
      col("current.condition.code").as("condition_code"),
      col("current.temp_c").as("temperature_c"),
      col("current.is_day").as("is_day"),
      col("current.wind_kph").as("wind_kph"),
      col("current.wind_dir").as("wind_dir"),
      col("current.pressure_mb").as("pressure_mb"),
      col("current.precip_mm").as("precip_mm"),
      humidity.as("humidity"),
      col("current.cloud").as("cloud"),
      col("current.dewpoint_c").as("dewpoint_c"),
      col("current.gust_kph").as("gust_kph"),
      to_date(ts).as("weather_date"),
    )
  }

  /** Exploded forecast days with positions, shared by the day/hour feeds.
    * Keeps only array indices 1,2 — tomorrow and day-after; index 0 is
    * discarded although fetched (reference: DataTransformation.py:202-205).
    */
  private def explodedDays(raw: DataFrame): DataFrame =
    withLocationId(raw)
      .select(col("location_id"), posexplode(col("forecast.forecastday")).as(Seq("day_pos", "fd")))
      .filter(col("day_pos").isin(1, 2))

  /** FACT_FORECAST_DAY_WEATHER feed (A1/A2 + P1-P3 + E2/E6)
    * (reference: DataTransformation.py:76-91). Column order matches the
    * reference CSV: measures … condition_code, location_id,
    * forecast_day_weather_id.
    */
  def forecastDayFeed(raw: DataFrame): DataFrame =
    explodedDays(raw).select(
      to_date(col("fd.date"), "yyyy-MM-dd").as("forecast_date"),
      col("fd.day.maxtemp_c").as("max_temp_c"),
      col("fd.day.avgtemp_c").as("avg_temp_c"),
      col("fd.day.mintemp_c").as("min_temp_c"),
      col("fd.day.maxwind_kph").as("max_wind_kph"),
      col("fd.day.totalprecip_mm").as("total_precip_mm"),
      col("fd.day.totalsnow_cm").as("total_snow_cm"),
      col("fd.day.avghumidity").as("avg_humidity"),
      col("fd.day.daily_will_it_rain").as("daily_will_it_rain"),
      col("fd.day.daily_chance_of_rain").as("daily_chance_of_rain"),
      col("fd.day.daily_will_it_snow").as("daily_will_it_snow"),
      col("fd.day.daily_chance_of_snow").as("daily_chance_of_snow"),
      col("fd.day.uv").as("uv"),
      col("fd.astro.sunrise").as("sunrise_time"),
      col("fd.astro.sunset").as("sunset_time"),
      col("fd.astro.moonrise").as("moonrise_time"),
      col("fd.astro.moonset").as("moonset_time"),
      col("fd.day.condition.code").as("condition_code"),
      col("location_id"),
      concat_ws("_", col("location_id"),
        date_format(to_date(col("fd.date"), "yyyy-MM-dd"), "yyyyMMdd"))
        .as("forecast_day_weather_id"),
    )

  /** FACT_FORECAST_HOUR_WEATHER feed (A3 + P4/P5 + E3/E7)
    * (reference: DataTransformation.py:95-113). Hour slots 0/10/20 of each
    * kept day; `forecast_hour_weather_id = {loc}_{yyyyMMdd}_{slot}` with
    * the un-padded slot index, exactly as the reference f-string builds it.
    */
  def forecastHourFeed(raw: DataFrame): DataFrame = {
    val ts = to_timestamp(col("h.time"), "yyyy-MM-dd HH:mm")
    val dayKey = concat_ws("_", col("location_id"), date_format(ts, "yyyyMMdd"))
    explodedDays(raw)
      .select(col("location_id"), posexplode(col("fd.hour")).as(Seq("hour_pos", "h")))
      .filter(col("hour_pos").isin(0, 10, 20))
      .select(
        ts.as("forecast_datetime"),
        col("h.condition.code").as("condition_code"),
        col("h.temp_c").as("temp_c"),
        col("h.is_day").as("is_day"),
        col("h.wind_kph").as("wind_kph"),
        col("h.wind_dir").as("wind_dir"),
        col("h.pressure_mb").as("pressure_mb"),
        col("h.precip_mm").as("precip_mm"),
        col("h.humidity").as("humidity"),
        col("h.cloud").as("cloud"),
        col("h.dewpoint_c").as("dewpoint_c"),
        col("h.gust_kph").as("gust_kph"),
        col("h.will_it_rain").as("will_it_rain"),
        col("h.chance_of_rain").as("chance_of_rain"),
        col("h.will_it_snow").as("will_it_snow"),
        col("h.chance_of_snow").as("chance_of_snow"),
        col("h.snow_cm").as("snow_cm"),
        col("h.uv").as("uv"),
        col("location_id"),
        dayKey.as("forecast_day_weather_id"),
        concat_ws("_", dayKey, col("hour_pos")).as("forecast_hour_weather_id"),
      )
  }

  /** DIM_CONDITION feed (D1): distinct (code, text) pairs harvested from
    * current + kept days + sampled hours, first-occurrence-wins in the
    * reference's accumulation order — current, then day1, day1 hours
    * (0,10,20), then day2, day2 hours
    * (reference: DataTransformation.py:69-73,80,100,173-176).
    *
    * First-wins is a window `row_number() = 1` over an explicit harvest
    * rank — a single shuffle on (file, code), no driver-side state.
    */
  def conditionFeed(raw: DataFrame): DataFrame = {
    val base = withLocationId(raw)
      .withColumn("file_id",
        concat_ws("_", col("location_id"), col("current.last_updated")))

    val fromCurrent = base.select(
      col("file_id"),
      col("current.condition.code").as("condition_code"),
      col("current.condition.text").as("condition_name"),
      lit(0L).as("harvest_rank"),
    )

    val days = base.select(col("file_id"),
        posexplode(col("forecast.forecastday")).as(Seq("day_pos", "fd")))
      .filter(col("day_pos").isin(1, 2))

    // day d occupies rank 1 + (d-1)*4; its hour slots the 3 ranks after it
    val fromDays = days.select(
      col("file_id"),
      col("fd.day.condition.code").as("condition_code"),
      col("fd.day.condition.text").as("condition_name"),
      (lit(1L) + (col("day_pos") - 1) * 4).as("harvest_rank"),
    )

    val fromHours = days
      .select(col("file_id"), col("day_pos"), posexplode(col("fd.hour")).as(Seq("hour_pos", "h")))
      .filter(col("hour_pos").isin(0, 10, 20))
      .select(
        col("file_id"),
        col("h.condition.code").as("condition_code"),
        col("h.condition.text").as("condition_name"),
        (lit(1L) + (col("day_pos") - 1) * 4 + (col("hour_pos") / 10) + 1)
          .cast("long").as("harvest_rank"),
      )

    val unioned = fromCurrent.unionByName(fromDays).unionByName(fromHours)
    val w = Window.partitionBy(col("file_id"), col("condition_code"))
      .orderBy(col("harvest_rank"))
    unioned
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("condition_code"), col("condition_name"), col("file_id"))
  }

  /** G2: recompute the API's pre-aggregated day measures from the full
    * 24-hour records (SURVEY.md §2.7) — the natural hash-aggregate over
    * the hourly grain, checkable against the day fact. One shuffle on
    * (location, date) with map-side partial aggregation.
    */
  def recomputeDayAggregates(raw: DataFrame): DataFrame =
    explodedDays(raw)
      .select(col("location_id"), to_date(col("fd.date"), "yyyy-MM-dd").as("forecast_date"),
        posexplode(col("fd.hour")).as(Seq("hour_pos", "h")))
      .groupBy(col("location_id"), col("forecast_date"))
      .agg(
        max(col("h.temp_c")).as("max_temp_c"),
        avg(col("h.temp_c")).as("avg_temp_c"),
        min(col("h.temp_c")).as("min_temp_c"),
        max(col("h.wind_kph")).as("max_wind_kph"),
        sum(col("h.precip_mm")).as("total_precip_mm"),
        sum(col("h.snow_cm")).as("total_snow_cm"),
        avg(col("h.humidity")).as("avg_humidity"),
        max(col("h.will_it_rain")).as("daily_will_it_rain"),
        max(col("h.chance_of_rain")).as("daily_chance_of_rain"),
        max(col("h.will_it_snow")).as("daily_will_it_snow"),
        max(col("h.chance_of_snow")).as("daily_chance_of_snow"),
      )

  /** The faithful stringly-typed staging shape: every column cast to
    * string, mirroring the reference warehouse where every column of
    * every table is VARCHAR(255) (reference: location.sql:1-18,
    * current_weather.sql:1-34 et al., SURVEY.md §1.3). The typed layer
    * stays canonical; this is a formatting projection for byte-faithful
    * CSV interchange.
    */
  def asVarcharStage(feed: DataFrame): DataFrame =
    feed.select(feed.columns.map(c => col(c).cast("string").as(c)).toSeq: _*)

  /** E8: the condition-name normalization applied on warehouse load —
    * `CASE WHEN code = 1000 THEN 'Sunny' ELSE name END`
    * (reference: condition.sql:57-66).
    */
  def normalizeConditionName(code: Column, name: Column): Column =
    when(code.cast("string") === "1000", lit("Sunny")).otherwise(name)
}
