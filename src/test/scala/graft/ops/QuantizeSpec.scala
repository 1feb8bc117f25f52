package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, ArrayType}

/** The int8 quantization contracts ([[Quantize]] scaladoc): range,
  * reconstruction bound, power-of-two scale invariance, zero-vector
  * guard, and the approximation quality of quantized cosine vs exact —
  * the properties q119 relies on but its oracle (which pins the scheme,
  * not its quality) cannot express.
  */
class QuantizeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val q = Quantize.quantize(emb, "vec_id", "embedding").cache()

  test("storage type is array<tinyint> + float scale (the 4x at-rest cut)") {
    val sch = q.schema
    assert(sch("qv").dataType == ArrayType(ByteType, containsNull = false) ||
      sch("qv").dataType.asInstanceOf[ArrayType].elementType == ByteType)
    assert(sch("scale").dataType.typeName == "float")
  }

  test("range: every component in [-127, 127]; -128 never produced") {
    val bad = q.select(explode(col("qv")).as("x"))
      .filter(col("x") > 127 || col("x") < -127).count()
    assert(bad == 0L)
    // and the max-abs component saturates: every non-zero vector has a +-127
    val n = q.filter(array_max(transform(col("qv"), x => abs(x))) =!= 127)
      .join(emb.filter(aggregate(col("embedding"),
        lit(0.0), (a, x) => a + abs(x)) > 0), "vec_id")
      .count()
    assert(n == 0L, "a non-zero vector without a saturated component")
  }

  test("reconstruction: |qv*scale - x| <= scale/2 (+eps) per component") {
    val viol = q.join(emb, "vec_id")
      .select(col("scale"),
        zip_with(col("qv"), Similarity.toDoubleVec(col("embedding")),
          (qc, xc) => abs(qc.cast("double") * col("scale") - xc)).as("err"))
      .select(array_max(col("err")).as("maxerr"), col("scale"))
      // scale is FLOAT while the bound math ran in double — allow 1 ulp-ish
      .filter(col("maxerr") > col("scale") * 0.5 + 1e-6)
      .count()
    assert(viol == 0L)
  }

  test("power-of-two scale invariance: quantize(4*v) == quantize(v)") {
    val scaled = emb.select(col("vec_id"),
      transform(col("embedding"), x => x * 4.0f).as("embedding"))
    val a = q.select(col("vec_id"), col("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    val b = Quantize.quantize(scaled, "vec_id", "embedding")
      .select(col("vec_id"), col("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(a == b)
  }

  test("zero vector quantizes to all zeros with scale 0") {
    import spark.implicits._
    val z = Seq((1L, Array(0.0f, 0.0f, 0.0f)), (2L, Array(1.0f, -2.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val rows = Quantize.quantize(z, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    assert(rows(0).getSeq[Byte](1) == Seq[Byte](0, 0, 0))
    assert(rows(0).getFloat(2) == 0.0f)
    assert(rows(1).getSeq[Byte](1) == Seq[Byte](64, -127, 32))
  }

  test("two-tier == exact brute when the candidate cut covers the corpus") {
    // with overfetch spanning every row, tier 1 filters nothing and the
    // re-rank IS knnBrute — the composition law that makes overfetch a
    // pure recall/IO dial
    val n = emb.count().toInt
    val twoTier = Quantize
      .topKTwoTier(emb, "vec_id", "embedding", queryId = 0L, k = 10,
        overfetch = n / 10 + 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = Similarity
      .knnBrute(emb, "vec_id", "embedding", queryId = 0L, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(twoTier == brute)
  }

  test("two-tier results carry EXACT similarities over candidate ids") {
    val cand = Quantize
      .topKQuantized(emb, "vec_id", "embedding", queryId = 0L, k = 40)
      .collect().map(_.getLong(0)).toSet
    val exact = Similarity
      .knnBrute(emb, "vec_id", "embedding", queryId = 0L, k = emb.count().toInt)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val out = Quantize
      .topKTwoTier(emb, "vec_id", "embedding", queryId = 0L, k = 10,
        overfetch = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.nonEmpty)
    out.foreach { case (id, sim) =>
      assert(cand.contains(id), s"vec $id outside the tier-1 candidate cut")
      assert(sim == exact(id), s"vec $id: re-rank sim $sim != exact ${exact(id)}")
    }
  }

  test("quantized cosine tracks exact cosine within int8 noise") {
    // 64-dim int8: per-component error <= 1/254 of max-abs; empirical
    // top-10 sims at this sf agree within ~0.01 — bound at 0.02
    val exact = Similarity
      .knnBrute(emb, "vec_id", "embedding", queryId = 0L, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val quant = Quantize
      .topKQuantized(emb, "vec_id", "embedding", queryId = 0L, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(quant.nonEmpty)
    val common = exact.keySet intersect quant.keySet
    assert(common.nonEmpty, "quantized top-10 shares nothing with exact top-10")
    common.foreach { id =>
      assert(math.abs(exact(id) - quant(id)) <= 0.02,
        s"vec $id: exact ${exact(id)} vs quantized ${quant(id)}")
    }
  }
}
