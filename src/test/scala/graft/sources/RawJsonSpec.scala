package graft.sources

import graft.SparkSpec
import graft.schema.Fixtures
import graft.transform.Feeds

import java.nio.file.{Files, Paths}
import java.time.LocalDate

class RawJsonSpec extends SparkSpec {

  test("corrupt lines are quarantined, good files keep flowing") {
    val dir = Files.createTempDirectory("graft_rawjson").toString
    Fixtures.writeRawJsonFiles(spark, dir, Seq("New Delhi", "Mumbai"),
      Seq(LocalDate.of(2024, 12, 22)))
    Files.write(Paths.get(dir, "poison_20241222.json"),
      "{ this is not json".getBytes("UTF-8"))

    val (good, quarantine) = RawJson.split(RawJson.read(spark, dir))
    assert(good.count() == 2)
    assert(good.schema == graft.schema.WeatherSchema.root)
    val q = quarantine.collect().map(_.getString(0))
    assert(q.length == 1 && q.head.startsWith("{ this is not"))
    // the good relation feeds the normal transform layer untouched
    assert(Feeds.locationFeed(good).count() == 2)
  }

  test("asVarcharStage: every column becomes string, values format stably") {
    val raw = Fixtures.rawForecast(spark, Seq("New Delhi"), Seq(LocalDate.of(2024, 12, 22)))
    val staged = Feeds.asVarcharStage(Feeds.currentWeatherFeed(raw))
    assert(staged.schema.fields.forall(_.dataType.typeName == "string"))
    val r = staged.head()
    assert(r.getAs[String]("current_weather_id") == "DEL_20241222")
    assert(r.getAs[String]("weather_date") == "2024-12-22")
  }

  test("conditionFeed is invariant under input row order (first-wins is semantic, not positional)") {
    val raw = Fixtures.rawForecast(spark,
      Seq("New Delhi", "Mumbai", "Chennai"), Seq(LocalDate.of(2024, 12, 22)))
    val a = Feeds.conditionFeed(raw).collect().map(_.toSeq).toSet
    val b = Feeds.conditionFeed(raw.repartition(7)).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
