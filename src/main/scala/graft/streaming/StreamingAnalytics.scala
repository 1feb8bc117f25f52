package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Event-time streaming analytics over the weather feeds — the streaming
  * surface the reference's warehouse implies but never builds (its
  * "analysis" stops at MERGE; README.md:4 "loads it into Snowflake for
  * further analysis"). Three canonical shapes:
  *
  *  - watermarked tumbling-window aggregation (late data beyond the
  *    watermark is dropped, state is bounded — the scale-safe default);
  *  - sliding-window variant for smoothed rollups;
  *  - arbitrary stateful processing via `mapGroupsWithState` (running
  *    per-city extremes across batches — state the windowed API cannot
  *    express).
  *
  * All operate on the hour-grain feed relation (forecast_datetime,
  * location_id, temp_c, precip_mm, …) whether it arrives from a stream
  * or a batch frame — event-time semantics are identical.
  */
object StreamingAnalytics {

  /** Tumbling per-`windowLen` stats per location with a `watermark`
    * bound on out-of-order arrival. State per (location, window) only.
    */
  def windowedStats(hourFeed: DataFrame, watermark: String = "2 hours",
      windowLen: String = "6 hours"): DataFrame =
    hourFeed
      .withWatermark("forecast_datetime", watermark)
      .groupBy(window(col("forecast_datetime"), windowLen), col("location_id"))
      .agg(
        avg(col("temp_c")).as("avg_temp_c"),
        max(col("temp_c")).as("max_temp_c"),
        min(col("temp_c")).as("min_temp_c"),
        sum(col("precip_mm")).as("total_precip_mm"),
        count(lit(1)).as("n_obs"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("location_id"), col("avg_temp_c"), col("max_temp_c"), col("min_temp_c"),
        col("total_precip_mm"), col("n_obs"))

  /** Sliding-window variant (length `windowLen`, slide `slide`). */
  def slidingStats(hourFeed: DataFrame, watermark: String = "2 hours",
      windowLen: String = "12 hours", slide: String = "6 hours"): DataFrame =
    hourFeed
      .withWatermark("forecast_datetime", watermark)
      .groupBy(window(col("forecast_datetime"), windowLen, slide), col("location_id"))
      .agg(avg(col("temp_c")).as("avg_temp_c"), count(lit(1)).as("n_obs"))
      .select(col("window.start").as("window_start"), col("location_id"),
        col("avg_temp_c"), col("n_obs"))

  /** Session windows: events within `gap` of each other merge into one
    * session per key; the window closes `gap` after the last event.
    * Works identically over batch frames and watermarked streams (state
    * per open session only).
    */
  def sessionStats(events: DataFrame, timeCol: String, keyCol: String,
      gap: String = "1 hour", watermark: Option[String] = None): DataFrame = {
    val base = watermark.fold(events)(w => events.withWatermark(timeCol, w))
    base
      .groupBy(session_window(col(timeCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
  }

  /** Running state per city. */
  case class CityExtremes(locationId: String, minTemp: Double, maxTemp: Double, nObs: Long)

  private def updateExtremes(key: String, rows: Iterator[(String, Double)],
      state: GroupState[CityExtremes]): CityExtremes = {
    val temps = rows.map(_._2).toSeq
    val prev = state.getOption.getOrElse(
      CityExtremes(key, Double.MaxValue, Double.MinValue, 0L))
    val next =
      if (temps.isEmpty) prev
      else CityExtremes(key, math.min(prev.minTemp, temps.min),
        math.max(prev.maxTemp, temps.max), prev.nObs + temps.length)
    state.update(next)
    next
  }

  /** Arbitrary stateful op: running min/max temperature per city across
    * all batches — `mapGroupsWithState`, update mode. State size is one
    * record per city; no timeout (dimension-bounded cardinality).
    */
  def runningExtremes(hourFeed: DataFrame): Dataset[CityExtremes] = {
    val spark = hourFeed.sparkSession
    import spark.implicits._
    hourFeed.select(col("location_id"), col("temp_c"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateExtremes)
  }

  /** A threshold-crossing alert. */
  case class TempAlert(locationId: String, maxTemp: Double, batchPeak: Boolean = true)

  /** Per-city alert latch (public: encoder codegen needs accessor
    * visibility on state classes).
    */
  case class AlertState(alerted: Boolean)

  private def alertFn(threshold: Double)(key: String, rows: Iterator[(String, Double)],
      state: GroupState[AlertState]): Iterator[TempAlert] = {
    val temps = rows.map(_._2).toSeq
    if (temps.isEmpty) Iterator.empty
    else {
      val peak = temps.max
      val wasAlerted = state.getOption.exists(_.alerted)
      val isHot = peak >= threshold
      state.update(AlertState(isHot))
      // hysteresis: one alert per excursion above the threshold — repeats
      // are suppressed until the city cools below it again
      if (isHot && !wasAlerted) Iterator.single(TempAlert(key, peak))
      else Iterator.empty
    }
  }

  /** `flatMapGroupsWithState` (0..n outputs per group per batch):
    * temperature threshold alerts with hysteresis — fires once per
    * excursion, resets when the city drops below the threshold. State is
    * one boolean per city.
    */
  def temperatureAlerts(hourFeed: DataFrame, threshold: Double): Dataset[TempAlert] = {
    val spark = hourFeed.sparkSession
    import spark.implicits._
    hourFeed.select(col("location_id"), col("temp_c"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        alertFn(threshold))
  }

  /** Streaming exact dedup with bounded state: duplicates of a key are
    * dropped as long as they arrive within the watermark delay of the
    * first occurrence; key state is evicted once the watermark passes it
    * (`dropDuplicatesWithinWatermark`). This is the streaming face of
    * the batch exact-dedup operator ([[graft.ops.Dedup.exactDupGroups]])
    * — at 100 TB/day of events, unbounded `dropDuplicates` state is not
    * an option; the watermark bound makes dedup state O(keys per delay
    * window), the same contract the reference's keyed MERGE gives batch
    * re-deliveries.
    */
  def streamingDedup(events: DataFrame, timeCol: String, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Watermarked stream-stream interval join: each left event matched to
    * right events for the same key within `[left.ts - lookback, left.ts]`.
    * Both sides carry watermarks and the join condition bounds event-time
    * distance, so Spark can size and expire the join state — the two
    * requirements (SPARK docs: "time constraints + watermarks") without
    * which stream-stream joins accumulate state forever. Column names on
    * the right side are suffixed to avoid ambiguity.
    */
  def streamStreamIntervalJoin(left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String, lookback: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val r = right.columns.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"${c}_r"))
    left.withWatermark(timeCol, watermark)
      .join(r.withWatermark(s"${timeCol}_r", watermark),
        col(keyCol) === col(s"${keyCol}_r") &&
          col(s"${timeCol}_r") >= col(timeCol) - expr(s"INTERVAL $lookback") &&
          col(s"${timeCol}_r") <= col(timeCol))
  }

  /** Output mode each shape needs when written as a stream. */
  val windowedOutputMode: OutputMode = OutputMode.Append()
  val statefulOutputMode: OutputMode = OutputMode.Update()
}
