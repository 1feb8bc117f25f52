package graft.streaming

import graft.SparkSpec
import graft.schema.Fixtures
import graft.warehouse.ParquetWarehouse

import java.nio.file.Files
import java.time.LocalDate

class StreamingPipelineSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("file-arrival stream: drains pending files, merges exactly once, resumes incrementally") {
    val rawDir = tmp("graft_stream_raw")
    val whDir = tmp("graft_stream_wh")
    val ckDir = tmp("graft_stream_ck")
    val cities = Seq("New Delhi", "Mumbai", "Chennai")

    // batch 1: three cities, one fetch day
    Fixtures.writeRawJsonFiles(spark, rawDir, cities, Seq(LocalDate.of(2024, 12, 22)))
    StreamingPipeline.run(spark, rawDir, whDir, ckDir).awaitTermination()

    val wh = new ParquetWarehouse(spark, whDir)
    assert(wh.read("dim_location").count() == 3)
    assert(wh.read("fact_current_day_weather").count() == 3)
    assert(wh.read("fact_forecast_day_weather").count() == 6)
    assert(wh.read("fact_forecast_hour_weather").count() == 18)

    // restart with no new files: checkpoint prevents re-processing
    StreamingPipeline.run(spark, rawDir, whDir, ckDir).awaitTermination()
    assert(wh.read("fact_current_day_weather").count() == 3)

    // batch 2: next-day fetch for one city — overlapping forecast day is
    // an update (6 per-city days total -> +1 new day for New Delhi only)
    Fixtures.writeRawJsonFiles(spark, rawDir, Seq("New Delhi"), Seq(LocalDate.of(2024, 12, 23)))
    StreamingPipeline.run(spark, rawDir, whDir, ckDir).awaitTermination()
    assert(wh.read("fact_current_day_weather").count() == 4) // new day key
    assert(wh.read("fact_forecast_day_weather").count() == 7) // 6 + day 12-25, 12-24 merged
    val delDays = wh.read("fact_forecast_day_weather")
      .filter(org.apache.spark.sql.functions.col("location_id") === "DEL").count()
    assert(delDays == 3) // 23, 24 (revised), 25
  }
}
