package graft.tools

import graft.schema.Fixtures
import graft.transform.Feeds
import org.apache.spark.sql.SparkSession

import java.time.LocalDate

/** Scratch: print the transform outputs for one fixture city/date so the
  * golden spec can pin exact values.
  */
object DumpGolden {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raw = Fixtures.rawForecast(spark, Seq("New Delhi"), Seq(LocalDate.of(2024, 12, 22)))
    Seq(
      "location" -> Feeds.locationFeed(raw),
      "current" -> Feeds.currentWeatherFeed(raw),
      "day" -> Feeds.forecastDayFeed(raw),
      "hour" -> Feeds.forecastHourFeed(raw),
      "condition" -> Feeds.conditionFeed(raw),
    ).foreach { case (n, df) =>
      println(s"===== $n =====")
      df.orderBy(df.columns.head, df.columns.tail.toIndexedSeq: _*).show(50, truncate = false)
    }
    spark.stop()
  }
}
