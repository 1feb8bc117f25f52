package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkSpec

class ConfigSourceSpec extends SparkSpec {

  private def propsFile(content: String): String = {
    val f = Files.createTempFile("graft_cfg", ".properties")
    Files.write(f, content.getBytes(StandardCharsets.UTF_8))
    f.toFile.deleteOnExit()
    f.toString
  }

  test("resolution precedence: overrides > env > properties") {
    val p = propsFile("endpoint=file-endpoint\napi_key=file-key\n")
    assert(ConfigSource.resolve("endpoint",
      overrides = Map("endpoint" -> "override-endpoint"),
      env = Map("endpoint" -> "env-endpoint"),
      propertiesPath = Some(p)).contains("override-endpoint"))
    assert(ConfigSource.resolve("endpoint",
      env = Map("endpoint" -> "env-endpoint"),
      propertiesPath = Some(p)).contains("env-endpoint"))
    assert(ConfigSource.resolve("endpoint", env = Map.empty,
      propertiesPath = Some(p)).contains("file-endpoint"))
    assert(ConfigSource.resolve("absent", env = Map.empty,
      propertiesPath = Some(p)).isEmpty)
  }

  test("require names the searched locations, never a value") {
    val e = intercept[NoSuchElementException](
      ConfigSource.require("missing_key", env = Map("other" -> "supersecret")))
    assert(e.getMessage.contains("missing_key"))
    assert(!e.getMessage.contains("supersecret"))
  }

  test("secret keys are masked in the DataFrame view and display") {
    val cfg = Map("api_key" -> "hunter2", "endpoint" -> "https://example.test",
      "DB_PASSWORD" -> "pw", "region" -> "eu")
    val rows = ConfigSource.asDataFrame(spark, cfg)
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSet
    assert(rows == Set(
      ("DB_PASSWORD", ConfigSource.Mask, true),
      ("api_key", ConfigSource.Mask, true),
      ("endpoint", "https://example.test", false),
      ("region", "eu", false)))
    assert(ConfigSource.display("api_key", "hunter2") == s"api_key=${ConfigSource.Mask}")
    assert(ConfigSource.display("region", "eu") == "region=eu")
  }

  test("validate reports each missing required key") {
    val p = propsFile("endpoint=x\n")
    val missing = ConfigSource.validate(Seq("endpoint", "api_key"),
      env = Map.empty, propertiesPath = Some(p))
    assert(missing == Seq("missing required config key 'api_key'"))
  }
}
