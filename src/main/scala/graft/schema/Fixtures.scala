package graft.schema

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import java.time.LocalDate
import java.time.format.DateTimeFormatter
import scala.util.Random

/** Deterministic WeatherAPI-shaped fixture generator (FIXTURES.md §1).
  *
  * Stands in for the live REST call (reference: DataExtraction.py:32-40) in
  * this offline environment: one row per (city, fetch-day), shaped exactly
  * like the `forecast.json` response with `days=3`
  * (reference: DataExtraction.py:49). `hour(i).time` always carries
  * hour-of-day i so positional sampling (0,10,20) and
  * `hour(timestamp)`-based filtering agree
  * (reference: DataTransformation.py:96-97).
  */
object Fixtures {

  private val dirs = Seq("N", "NNE", "NE", "E", "SE", "S", "SW", "W")
  private val conditions = Seq(
    1000 -> "Clear", 1003 -> "Partly cloudy", 1006 -> "Cloudy",
    1009 -> "Overcast", 1030 -> "Mist", 1063 -> "Patchy rain possible",
    1183 -> "Light rain", 1195 -> "Heavy rain",
  )
  private val dateFmt = DateTimeFormatter.ISO_LOCAL_DATE

  /** Raw forecast rows for `cities` × `fetchDates`, `days` forecast days
    * each. `humidityEqualsCloud=true` reproduces the reference's
    * humidity-from-cloud quirk bit-faithfully
    * (reference: DataTransformation.py:189) by making the two fields equal.
    */
  def rawForecast(
      spark: SparkSession,
      cities: Seq[String] = WeatherSchema.locationMap.map(_._1),
      fetchDates: Seq[LocalDate] = Seq(LocalDate.of(2024, 12, 22)),
      days: Int = 3,
      seed: Long = 42L,
      humidityEqualsCloud: Boolean = false,
  ): DataFrame = {
    val rows = for {
      city <- cities
      fetchDate <- fetchDates
    } yield {
      val rng = new Random(seed ^ city.hashCode.toLong ^ (fetchDate.toEpochDay << 16))
      def cond() = conditions(rng.nextInt(conditions.length))
      def temp() = math.rint((10 + rng.nextDouble() * 25) * 10) / 10
      def wind() = math.rint(rng.nextDouble() * 400) / 10
      val cloudPct = rng.nextInt(101)
      val humid = if (humidityEqualsCloud) cloudPct else rng.nextInt(101)
      val (ccode, ctext) = cond()

      def hourRow(date: LocalDate, h: Int): Row = {
        val (hc, ht) = cond()
        Row(
          f"${date.format(dateFmt)} $h%02d:00", temp(), if (h >= 6 && h < 18) 1 else 0,
          wind(), dirs(rng.nextInt(dirs.length)), 990.0 + rng.nextInt(40),
          math.rint(rng.nextDouble() * 50) / 10, rng.nextInt(101), rng.nextInt(101),
          temp() - 5, wind() + 4, rng.nextInt(2), rng.nextInt(101), rng.nextInt(2),
          rng.nextInt(101), math.rint(rng.nextDouble() * 20) / 10,
          math.rint(rng.nextDouble() * 110) / 10, Row(hc, ht),
        )
      }

      def dayRow(offset: Int): Row = {
        val date = fetchDate.plusDays(offset.toLong)
        val (dc, dt) = cond()
        val hours = (0 until 24).map(h => hourRow(date, h))
        // day.* rollups are DERIVED from the 24 hourly records, exactly as
        // the WeatherAPI computes them — this makes the reference's
        // pass-through pre-aggregates (G2, SURVEY.md §2.7) recomputable
        // and checkable from the hour records.
        def hd(i: Int) = hours.map(_.getDouble(i))
        def hi(i: Int) = hours.map(_.getInt(i))
        Row(
          date.format(dateFmt),
          Row(
            hd(1).max, // maxtemp_c  <- hour.temp_c
            hd(1).sum / 24.0, // avgtemp_c
            hd(1).min, // mintemp_c
            hd(3).max, // maxwind_kph <- hour.wind_kph
            hd(6).sum, // totalprecip_mm <- hour.precip_mm
            hd(15).sum, // totalsnow_cm <- hour.snow_cm
            hi(7).sum / 24.0, // avghumidity <- hour.humidity
            hi(11).max, // daily_will_it_rain <- any hour
            hi(12).max, // daily_chance_of_rain <- max chance
            hi(13).max, // daily_will_it_snow
            hi(14).max, // daily_chance_of_snow
            math.rint(rng.nextDouble() * 110) / 10, Row(dc, dt)),
          Row("06:4%d AM".format(rng.nextInt(10)), "05:3%d PM".format(rng.nextInt(10)),
            "09:1%d PM".format(rng.nextInt(10)), "08:2%d AM".format(rng.nextInt(10))),
          hours,
        )
      }

      Row(
        Row(city, s"$city Region", "India", math.rint(rng.nextDouble() * 3000) / 100,
          math.rint((70 + rng.nextDouble() * 20) * 100) / 100),
        Row(
          s"${fetchDate.format(dateFmt)} 09:15", temp(), 1, wind(),
          dirs(rng.nextInt(dirs.length)), 990.0 + rng.nextInt(40),
          math.rint(rng.nextDouble() * 50) / 10, humid, cloudPct,
          temp() - 5, wind() + 4, Row(ccode, ctext),
        ),
        Row((0 until days).map(dayRow)),
      )
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.size / 4)),
      WeatherSchema.root)
  }

  /** Write raw fixtures as one JSON file per (city, date) —
    * `{city}_{yyyyMMdd}.json` naming per reference DataExtraction.py:61 —
    * for exercising the file-arrival streaming source.
    */
  def writeRawJsonFiles(spark: SparkSession, dir: String,
      cities: Seq[String] = WeatherSchema.locationMap.map(_._1),
      fetchDates: Seq[LocalDate] = Seq(LocalDate.of(2024, 12, 22)),
      seed: Long = 42L): Unit = {
    import org.apache.spark.sql.functions._
    val fmt = DateTimeFormatter.ofPattern("yyyyMMdd")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    for (city <- cities; d <- fetchDates) {
      val df = rawForecast(spark, Seq(city), Seq(d), seed = seed)
      val json = df.select(to_json(struct(col("location"), col("current"), col("forecast"))))
        .collect().map(_.getString(0)).mkString("\n")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s"${city.replace(" ", "_")}_${d.format(fmt)}.json"),
        json.getBytes("UTF-8"))
    }
  }
}
