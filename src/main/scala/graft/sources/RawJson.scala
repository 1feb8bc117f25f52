package graft.sources

import graft.schema.WeatherSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Raw-layer JSON reader with corrupt-record quarantine.
  *
  * The reference's transform assumes every landed file parses; a bad
  * byte kills the Lambda invocation for that file
  * (reference: DataTransformation.py:148 — bare `json.loads`). At 100 TB
  * a poisoned record must never fail a batch: PERMISSIVE mode captures
  * unparseable lines in a corrupt-record column, [[split]] separates the
  * good relation from the quarantine, and the pipeline continues —
  * the file-level analog of the per-city error-skip (O5).
  */
object RawJson {

  val corruptCol = "_corrupt_record"

  /** Read raw forecast JSON with the explicit schema + quarantine column. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .schema(WeatherSchema.root.add(corruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(dir)

  /** (good rows without the quarantine column, quarantined raw lines). */
  def split(raw: DataFrame): (DataFrame, DataFrame) = {
    // Spark requires caching/materialization before filtering on the
    // corrupt-record column of the same scan.
    val cached = raw.cache()
    val good = cached.filter(col(corruptCol).isNull).drop(corruptCol)
    val quarantine = cached.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw_line"))
    (good, quarantine)
  }
}
