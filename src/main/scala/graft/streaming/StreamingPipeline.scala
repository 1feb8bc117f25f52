package graft.streaming

import graft.schema.WeatherSchema
import graft.transform.Feeds
import graft.warehouse.ParquetWarehouse
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Structured-Streaming variant of the pipeline: the file-arrival
  * semantics of the reference — S3 `ObjectCreated` → transform Lambda,
  * Snowpipe `AUTO_INGEST` → stage, 4-hourly task → MERGE
  * (reference: DataTransformation.py:142, location.sql:22-26,87-91) —
  * collapse naturally onto Spark's checkpointed file source +
  * `foreachBatch` merge:
  *
  *  - file source discovers newly arrived raw JSON exactly once
  *    (checkpointed file log = Snowpipe's load history);
  *  - `cleanSource=archive` reproduces the archive-and-delete step
  *    (reference: DataTransformation.py:233-247) as a source option;
  *  - `foreachBatch` applies the same [[Feeds]] + MERGE as batch mode —
  *    one code path for both cadences;
  *  - `Trigger.AvailableNow` = the cron task (drain everything pending,
  *    stop); `Trigger.ProcessingTime` = a standing 4-hourly cadence.
  *
  * The count-verify-truncate protocol (reference: location.sql:36-79) is
  * subsumed: a micro-batch is a snapshot, its file-log commit is the
  * verified consume. [[graft.warehouse.Merge.verifyCounts]] remains
  * available for parity audits.
  */
object StreamingPipeline {

  /** Checkpointed raw-file source over `{city}_{yyyymmdd}.json` arrivals. */
  def rawStream(spark: SparkSession, rawDir: String,
      archiveDir: Option[String] = None,
      maxFilesPerTrigger: Int = 100): DataFrame = {
    val base = spark.readStream
      .schema(WeatherSchema.root)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
    val withArchive = archiveDir.fold(base) { dir =>
      base.option("cleanSource", "archive").option("sourceArchiveDir", dir)
    }
    withArchive.json(rawDir)
  }

  /** Apply the five feeds + warehouse merges to one micro-batch — the
    * same semantics as the batch pipeline, factored for `foreachBatch`.
    */
  def mergeBatch(warehouse: ParquetWarehouse)(batch: DataFrame, batchId: Long): Unit = {
    if (!batch.isEmpty) {
      val raw = batch.cache()
      try {
        warehouse.mergeInto("dim_location", Feeds.locationFeed(raw), Seq("location_id"))
        warehouse.mergeInto("fact_current_day_weather",
          Feeds.currentWeatherFeed(raw), Seq("current_weather_id"))
        warehouse.mergeInto("fact_forecast_day_weather",
          Feeds.forecastDayFeed(raw), Seq("forecast_day_weather_id"))
        warehouse.mergeInto("fact_forecast_hour_weather",
          Feeds.forecastHourFeed(raw), Seq("forecast_hour_weather_id"))
        val cond = Feeds.conditionFeed(raw)
          .withColumn("condition_name",
            Feeds.normalizeConditionName(col("condition_code"), col("condition_name")))
          .select("condition_code", "condition_name")
        warehouse.insertNewInto("dim_condition", cond, Seq("condition_code"))
      } finally raw.unpersist()
    }
  }

  /** Run the streaming pipeline. `Trigger.AvailableNow` drains pending
    * files and stops (task-style catch-up); a processing-time trigger
    * keeps it standing.
    */
  def run(spark: SparkSession, rawDir: String, warehouseDir: String,
      checkpointDir: String, trigger: Trigger = Trigger.AvailableNow(),
      archiveDir: Option[String] = None): StreamingQuery = {
    val warehouse = new ParquetWarehouse(spark, warehouseDir)
    rawStream(spark, rawDir, archiveDir).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(mergeBatch(warehouse) _)
      .start()
  }
}
