package graft.queries

import graft.SparkSpec
import graft.schema.Fixtures
import graft.streaming.StreamingPipeline

import java.nio.file.Files
import java.time.LocalDate

class WeatherQueriesSpec extends SparkSpec {

  /** Build a real warehouse once via the streaming pipeline. */
  private lazy val wh: String = {
    val raw = Files.createTempDirectory("graft_wq_raw").toString
    val whDir = Files.createTempDirectory("graft_wq_wh").toString
    val ck = Files.createTempDirectory("graft_wq_ck").toString
    Fixtures.writeRawJsonFiles(spark, raw,
      Seq("New Delhi", "Mumbai", "Chennai", "Kolkata"),
      Seq(LocalDate.of(2024, 12, 22)))
    StreamingPipeline.run(spark, raw, whDir, ck).awaitTermination()
    whDir
  }

  test("currentByCity: one row per city, dims resolved") {
    val rows = WeatherQueries.currentByCity(spark, wh).collect()
    assert(rows.length == 4)
    assert(rows.forall(_.getAs[String]("condition_name") != null))
  }

  test("hottestCityPerDay: one winner per forecast day") {
    val rows = WeatherQueries.hottestCityPerDay(spark, wh).collect()
    assert(rows.length == 2) // days 1,2
    rows.foreach(r => assert(r.getAs[Double]("max_temp_c") > 0))
  }

  test("rainOutlook: per-city aggregates bounded correctly") {
    val rows = WeatherQueries.rainOutlook(spark, wh).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val avg = r.getAs[Double]("avg_chance_of_rain")
      assert(avg >= 0.0 && avg <= 100.0)
      assert(r.getAs[Long]("rainy_days") <= 2)
    }
  }

  test("orphanedHourRows: referential integrity holds after merge") {
    assert(WeatherQueries.orphanedHourRows(spark, wh).count() == 0)
  }

  test("conditionDistribution: covers all sampled hours") {
    val rows = WeatherQueries.conditionDistribution(spark, wh).collect()
    assert(rows.map(_.getAs[Long]("n_hours")).sum == 24) // 4 cities x 6 hours
  }
}
