package graft.sources

import java.io.{FileInputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.Properties

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S2: configuration/secret source — the engine counterpart of the
  * reference's secrets-manager API-key lookup (reference:
  * DataExtraction.py:8-28, the `get_secret()` call that feeds the REST
  * extractor). This engine is cloud-agnostic, so the source is a
  * provider CHAIN over the two public mechanisms every deployment has —
  * an explicit override map (tests / job conf), JVM environment
  * variables, and Java `.properties` files — with the same contract a
  * secrets manager gives: key → value resolution plus non-leaking
  * display. A cloud secrets backend slots in as one more provider
  * without touching callers.
  *
  * Scale/safety notes:
  *  - config is DRIVER-side by design: values feed session/transport
  *    construction (e.g. [[RestSource]]'s endpoint + key), they are
  *    never a distributed dataset. The DataFrame view exists for
  *    inspection/audit queries and is built from a local Seq — no
  *    cluster reads a secrets file from executors;
  *  - secret VALUES never appear in the DataFrame view or in logs —
  *    [[asDataFrame]] masks any key matching [[secretKeyPattern]]
  *    before the value reaches a Row (there is nothing to redact
  *    downstream because the plaintext never enters the plan);
  *  - resolution order is explicit-first (overrides > env > file), the
  *    conventional precedence (job conf overrides machine env overrides
  *    checked-in defaults).
  */
object ConfigSource {

  /** Keys whose values are masked in any surfaced view. */
  val secretKeyPattern: scala.util.matching.Regex =
    "(?i).*(key|secret|token|password|credential).*".r

  def isSecretKey(key: String): Boolean =
    secretKeyPattern.pattern.matcher(key).matches()

  val Mask = "********"

  /** Java `.properties` file → Map (UTF-8; missing file is an error —
    * a silently-empty config source masks deployment mistakes).
    */
  def loadProperties(path: String): Map[String, String] = {
    val props = new Properties()
    val in = new InputStreamReader(new FileInputStream(path), StandardCharsets.UTF_8)
    try props.load(in) finally in.close()
    import scala.jdk.CollectionConverters._
    props.asScala.toMap
  }

  /** Resolve one key through the chain: overrides > env > properties
    * file (if given). None when absent everywhere — callers decide
    * whether that is fatal, with [[require]] for the fail-fast path.
    */
  def resolve(key: String, overrides: Map[String, String] = Map.empty,
      env: Map[String, String] = sys.env,
      propertiesPath: Option[String] = None): Option[String] =
    overrides.get(key)
      .orElse(env.get(key))
      .orElse(propertiesPath.flatMap(p => loadProperties(p).get(key)))

  /** [[resolve]] that fails loudly with the SEARCHED LOCATIONS (never
    * any value) when the key is missing — the error a 2am operator
    * needs.
    */
  def require(key: String, overrides: Map[String, String] = Map.empty,
      env: Map[String, String] = sys.env,
      propertiesPath: Option[String] = None): String =
    resolve(key, overrides, env, propertiesPath).getOrElse {
      val where = Seq("overrides", "env") ++ propertiesPath.map(p => s"properties($p)")
      throw new NoSuchElementException(
        s"config key '$key' not found in: ${where.mkString(", ")}")
    }

  /** Audit view of a resolved config map: (key, value, is_secret), with
    * secret values masked BEFORE row construction — the plaintext never
    * enters a Spark plan, cache, or UI.
    */
  def asDataFrame(spark: SparkSession, config: Map[String, String]): DataFrame = {
    import spark.implicits._
    config.toSeq.sortBy(_._1).map { case (k, v) =>
      val secret = isSecretKey(k)
      (k, if (secret) Mask else v, secret)
    }.toDF("key", "value", "is_secret")
  }

  /** Masked single-value display for logs/exceptions. */
  def display(key: String, value: String): String =
    s"$key=${if (isSecretKey(key)) Mask else value}"

  /** Validation: one message per required key that resolves nowhere in
    * the chain — run at job construction so a missing credential fails
    * the submit, not the 3rd micro-batch.
    */
  def validate(required: Seq[String], overrides: Map[String, String] = Map.empty,
      env: Map[String, String] = sys.env,
      propertiesPath: Option[String] = None): Seq[String] =
    required.flatMap { k =>
      if (resolve(k, overrides, env, propertiesPath).isEmpty)
        Some(s"missing required config key '$k'")
      else None
    }
}
