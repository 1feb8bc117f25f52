package graft.schema

import org.apache.spark.sql.types._

/** Explicit schema for the WeatherAPI `forecast.json` payload.
  *
  * Field set = exactly the paths the reference transform reads
  * (reference: DataTransformation.py:26-51,150-205); shape documented in
  * FIXTURES.md §1. Declaring the schema up front (instead of
  * `spark.read.json` inference) matters at scale: schema inference is a
  * full extra pass over the input, and an inferred schema can drift
  * per-batch. With an explicit `StructType` the JSON scan is a single
  * pass and nested-schema pruning can drop unread subtrees at the
  * source.
  */
object WeatherSchema {

  val condition: StructType = StructType(Seq(
    StructField("code", IntegerType),
    StructField("text", StringType),
  ))

  val location: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("region", StringType),
    StructField("country", StringType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
  ))

  val current: StructType = StructType(Seq(
    StructField("last_updated", StringType), // "yyyy-MM-dd HH:mm"
    StructField("temp_c", DoubleType),
    StructField("is_day", IntegerType),
    StructField("wind_kph", DoubleType),
    StructField("wind_dir", StringType),
    StructField("pressure_mb", DoubleType),
    StructField("precip_mm", DoubleType),
    StructField("humidity", IntegerType),
    StructField("cloud", IntegerType),
    StructField("dewpoint_c", DoubleType),
    StructField("gust_kph", DoubleType),
    StructField("condition", condition),
  ))

  val day: StructType = StructType(Seq(
    StructField("maxtemp_c", DoubleType),
    StructField("avgtemp_c", DoubleType),
    StructField("mintemp_c", DoubleType),
    StructField("maxwind_kph", DoubleType),
    StructField("totalprecip_mm", DoubleType),
    StructField("totalsnow_cm", DoubleType),
    StructField("avghumidity", DoubleType),
    StructField("daily_will_it_rain", IntegerType),
    StructField("daily_chance_of_rain", IntegerType),
    StructField("daily_will_it_snow", IntegerType),
    StructField("daily_chance_of_snow", IntegerType),
    StructField("uv", DoubleType),
    StructField("condition", condition),
  ))

  val astro: StructType = StructType(Seq(
    StructField("sunrise", StringType),
    StructField("sunset", StringType),
    StructField("moonrise", StringType),
    StructField("moonset", StringType),
  ))

  val hour: StructType = StructType(Seq(
    StructField("time", StringType), // "yyyy-MM-dd HH:mm"
    StructField("temp_c", DoubleType),
    StructField("is_day", IntegerType),
    StructField("wind_kph", DoubleType),
    StructField("wind_dir", StringType),
    StructField("pressure_mb", DoubleType),
    StructField("precip_mm", DoubleType),
    StructField("humidity", IntegerType),
    StructField("cloud", IntegerType),
    StructField("dewpoint_c", DoubleType),
    StructField("gust_kph", DoubleType),
    StructField("will_it_rain", IntegerType),
    StructField("chance_of_rain", IntegerType),
    StructField("will_it_snow", IntegerType),
    StructField("chance_of_snow", IntegerType),
    StructField("snow_cm", DoubleType),
    StructField("uv", DoubleType),
    StructField("condition", condition),
  ))

  val forecastDay: StructType = StructType(Seq(
    StructField("date", StringType), // "yyyy-MM-dd"
    StructField("day", day),
    StructField("astro", astro),
    StructField("hour", ArrayType(hour)),
  ))

  /** Root schema of one raw file ({city}_{yyyymmdd}.json,
    * reference: DataExtraction.py:61-69).
    */
  val root: StructType = StructType(Seq(
    StructField("location", location),
    StructField("current", current),
    StructField("forecast", StructType(Seq(
      StructField("forecastday", ArrayType(forecastDay)),
    ))),
  ))

  /** City → 3-letter dimension key, the `location_map`
    * (reference: DataTransformation.py:10-21). Kept as data, not code:
    * at scale this is a broadcast dimension, not a literal expression.
    */
  val locationMap: Seq[(String, String)] = Seq(
    "New Delhi" -> "DEL",
    "Bangalore" -> "BAN",
    "Chennai" -> "CHE",
    "Pune" -> "PUN",
    "Mumbai" -> "MUM",
    "Hyderabad" -> "HYD",
    "Jaipur" -> "JAI",
    "Kochi" -> "KOC",
    "Kolkata" -> "KOL",
    "Ahmedabad" -> "ADB",
  )
}
