package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The judged q56/q69 queries assert a 5% epsilon contract against exact
  * aggregates (the DuckDB oracle checks the booleans); this spec pins the
  * TIGHTER per-estimator bounds the 5% band is derived from.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("HLL++ count-distinct and t-digest median sit within error bounds") {
    val df = (1L to 20000L)
      .map(i => (if (i % 2 == 0) "A" else "B", i % 3000, i.toDouble / 7.0))
      .toDF("g", "k", "v")
    val exact = df.groupBy("g")
      .agg(count_distinct(col("k")).as("nd"),
        expr("percentile(v, 0.5)").as("med"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val approx = df.groupBy("g")
      .agg(approx_count_distinct(col("k"), rsd = 0.01).as("nd"),
        percentile_approx(col("v"), lit(0.5), lit(10000)).as("med"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    for ((g, (nd, med)) <- exact) {
      val (andv, amed) = approx(g)
      assert(math.abs(andv - nd).toDouble / nd <= 0.05, s"$g count-distinct: $andv vs $nd")
      // t-digest at accuracy 10000 over 10k values: median within 1% of range
      assert(math.abs(amed - med) <= 1.0, s"$g median: $amed vs $med")
    }
  }

  test("per-group HLL sketches unioned estimate the global distinct within 5%") {
    val df = (1L to 30000L)
      .map(i => (i % 30, i % 4096))
      .toDF("day", "user_id")
    val exact = df.agg(count_distinct(col("user_id"))).head.getLong(0)
    val est = df.groupBy("day").agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .head.getLong(0)
    assert(math.abs(est - exact).toDouble / exact <= 0.05, s"$est vs $exact")
  }
}
