package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Synthesize an sf1-scale dataset (10× sf0.1) for the scale smoke:
  * each table is unioned `factor` times with key offsets chosen to keep
  * referential integrity (orders→customer, lineitem→orders/part/supplier,
  * events→user, embeddings/documents ids), while the fixed dims
  * (region/nation) stay as-is.
  *
  * Content perturbation keeps workload shape realistic at 10×:
  *  - document tokens get a per-copy suffix, so the corpus grows 10×
  *    with the SAME intra-copy near-dup structure instead of turning
  *    every doc into a 10-way exact-dup clique (which would blow the
  *    LSH bucket sizes quadratically — a different workload, not a
  *    bigger one);
  *  - embeddings get a deterministic per-copy, per-coordinate jitter
  *    (sin-based — no RNG) so cross-copy cosines fall below the
  *    near-dup threshold for most pairs, same reasoning;
  *  - events keep their timestamps (the time axis doesn't grow with
  *    corpus size) but get fresh event/user ids.
  *
  * Bench-only data: correctness stays judged on the driver's parquet.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft-sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    def copies(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => f(df, i)).reduce(_ unionByName _)

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"$name -> ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    // fixed dims — unchanged
    write("region", t("region"))
    write("nation", t("nation"))

    val custN = 100000L // offsets: comfortably past each table's max key
    val suppN = 10000L
    val partN = 100000L
    val orderN = 10000000L
    val userN = 100000L
    val docN = 100000L
    val vecN = 100000L

    write("customer", copies(t("customer")) { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * custN))
    })
    write("supplier", copies(t("supplier")) { (df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(i * suppN))
    })
    write("part", copies(t("part")) { (df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i * partN))
    })
    write("orders", copies(t("orders")) { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * orderN))
        .withColumn("o_custkey", col("o_custkey") + lit(i * custN))
    })
    write("lineitem", copies(t("lineitem")) { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * orderN))
        .withColumn("l_partkey", col("l_partkey") + lit(i * partN))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * suppN))
    })
    write("events", copies(t("events")) { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * 1000000L))
        .withColumn("user_id", col("user_id") + lit(i * userN))
    })
    write("documents", copies(t("documents")) { (df, i) =>
      val text =
        if (i == 0) col("text")
        else array_join(
          transform(split(col("text"), " "), tok => concat(tok, lit(s"_$i"))), " ")
      df.withColumn("doc_id", col("doc_id") + lit(i * docN))
        .withColumn("text", text)
        .withColumn("n_chars", length(text))
    })
    write("embeddings", copies(t("embeddings")) { (df, i) =>
      val emb =
        if (i == 0) col("embedding")
        else transform(col("embedding"), (x, j) =>
          (x + sin(j.cast("double") * 13.0 + lit(i * 37.0)) * 0.5f).cast("float"))
      df.withColumn("vec_id", col("vec_id") + lit(i * vecN))
        .withColumn("embedding", emb)
    })
    spark.stop()
  }
}
