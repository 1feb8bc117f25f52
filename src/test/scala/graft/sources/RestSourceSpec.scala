package graft.sources

import graft.SparkSpec
import graft.schema.Fixtures
import graft.transform.Feeds
import org.apache.spark.sql.functions._

import java.time.LocalDate

/** Canned transport: serves driver-precomputed fixture JSON per city
  * (a transport must not touch the SparkSession — it runs in tasks, and
  * must not capture the spec instance, which is not serializable),
  * failing one city to exercise error-skip.
  */
private case class CannedTransport(bodies: Map[String, String], failCity: String)
    extends RestSource.Transport {
  def get(url: String): Either[String, String] = {
    val q = url.split("[?&]").find(_.startsWith("q=")).get.drop(2)
    val city = java.net.URLDecoder.decode(q, "UTF-8")
    if (city == failCity) Left("HTTP 500")
    else bodies.get(city).toRight(s"no fixture for $city")
  }
}

class RestSourceSpec extends SparkSpec {

  private def fixtureBodies(cities: Seq[String]): Map[String, String] =
    cities.map { city =>
      val df = Fixtures.rawForecast(spark, Seq(city), Seq(LocalDate.of(2024, 12, 22)))
      city -> df.select(to_json(struct(col("location"), col("current"), col("forecast"))))
        .head().getString(0)
    }.toMap

  test("forecastUrl matches the reference's endpoint shape") {
    val url = RestSource.forecastUrl("KEY", "New Delhi", 3)
    assert(url == "https://api.weatherapi.com/v1/forecast.json?key=KEY&q=New+Delhi&days=3")
  }

  test("distributed fetch: per-city error-skip, survivors parse to the raw relation") {
    val cities = Seq("New Delhi", "Mumbai", "Chennai")
    val fetched = RestSource.fetchForecasts(spark, cities, "KEY",
      transport = CannedTransport(fixtureBodies(cities), failCity = "Mumbai"))
    val errors = fetched.filter(col("error").isNotNull)
      .select("city", "error").collect().map(r => (r.getString(0), r.getString(1)))
    assert(errors.toSeq == Seq(("Mumbai", "HTTP 500")))

    val raw = RestSource.toRawRelation(fetched)
    assert(raw.schema == graft.schema.WeatherSchema.root)
    // the surviving raw relation feeds the normal transform layer
    val loc = Feeds.locationFeed(raw).collect().map(_.getAs[String]("location_id")).sorted
    assert(loc.toSeq == Seq("CHE", "DEL"))
  }
}
