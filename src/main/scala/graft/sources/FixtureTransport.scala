package graft.sources

import graft.schema.WeatherSchema

/** Deterministic offline [[RestSource.Transport]] that lets the REST
  * source (S1) be JUDGED end to end without egress: each city's
  * forecast body is pure arithmetic in the city's position in the
  * reference city list (reference: DataTransformation.py:10-21), so the
  * DuckDB oracle can inline the exact same values as literals. Cities in
  * `failCities` return an HTTP-level error, exercising the error-skip
  * contract (O5, reference: DataExtraction.py:38-40,75-76) — the failed
  * city surfaces as an error row, never a failed job.
  *
  * The transport also VALIDATES the url shape produced by
  * [[RestSource.forecastUrl]] (host, path, `q=` parameter with URL
  * encoding): a malformed url yields an error row and breaks the judged
  * hash, so the url builder itself is part of the judged path.
  *
  * All fixture numbers are dyadic rationals (k·0.25, k·0.5), so their
  * decimal literals round-trip bit-exactly into IEEE doubles in any
  * engine.
  */
final class FixtureTransport(failCities: Set[String]) extends RestSource.Transport {
  def get(url: String): Either[String, String] =
    if (!url.startsWith("https://api.weatherapi.com/v1/forecast.json?key="))
      Left("bad url: " + url)
    else
      url.split("[?&]").collectFirst {
        case p if p.startsWith("q=") => java.net.URLDecoder.decode(p.drop(2), "UTF-8")
      } match {
        case None => Left("missing q param")
        case Some(city) if failCities(city) => Left("HTTP 500")
        case Some(city) =>
          val idx = WeatherSchema.locationMap.indexWhere(_._1 == city)
          if (idx < 0) Left(s"unknown city: $city")
          else Right(FixtureTransport.body(city, idx))
      }
}

object FixtureTransport {

  /** WeatherAPI-shaped forecast body for the city at position `idx` of
    * the reference city list: 3 forecast days, every numeric field an
    * exact linear function of (idx, day).
    */
  def body(city: String, idx: Int): String = {
    val temp = 15.0 + 1.5 * idx
    val humidity = 40 + 3 * idx
    val days = (0 until 3).map { d =>
      val avg = 12.0 + 2.25 * idx + 0.5 * d
      s"""{"date":"2024-12-2${2 + d}","day":{"maxtemp_c":${avg + 5},"avgtemp_c":$avg,"mintemp_c":${avg - 5}}}"""
    }.mkString("[", ",", "]")
    s"""{"location":{"name":"$city","region":"$city Region","country":"India","lat":${10.0 + idx},"lon":${70.0 + 0.25 * idx}},""" +
      s""""current":{"last_updated":"2024-12-22 09:15","temp_c":$temp,"is_day":1,"humidity":$humidity},""" +
      s""""forecast":{"forecastday":$days}}"""
  }
}
