package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The product-quantization contracts ([[ProductQuantize]] scaladoc):
  * codebook shape, Lloyd-round fit improvement, the reconstruction
  * bound q146's oracle (which pins the scheme, not its quality) cannot
  * express, determinism of training, and the two-tier composition law.
  */
class ProductQuantizeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private val M = 4
  private val K = 8
  private lazy val cb = ProductQuantize.train(emb, "vec_id", "embedding",
    m = M, k = K, iters = 1)

  private def qvec0 = emb.filter(col("vec_id") === 0L)
    .select(Similarity.toDoubleVec(col("embedding")))
    .head().getSeq[Double](0).toArray

  test("codebook shape: m subspaces x k codewords of dim/m values each") {
    val rows = cb.collect()
    assert(rows.length == M * K)
    assert(rows.map(r => (r.getInt(r.fieldIndex("sub")),
      r.getLong(r.fieldIndex("cid")))).distinct.length == M * K)
    assert(rows.forall(_.getSeq[Double](2).length == 64 / M))
  }

  test("every vector gets exactly m codes, each a valid codeword id") {
    val codes = ProductQuantize.encode(emb, "vec_id", "embedding", cb, m = M)
    val n = emb.count()
    assert(codes.count() == n * M)
    assert(codes.groupBy("vec_id").agg(count(lit(1)).as("c"))
      .filter(col("c") =!= M).count() == 0L)
    // codes reference existing (sub, cid) codebook entries only
    assert(codes.join(cb.select(col("sub"), col("cid").as("code")),
      Seq("sub", "code"), "left_anti").count() == 0L)
  }

  test("one Lloyd round strictly improves reconstruction over the raw seeds") {
    val seedCb = ProductQuantize.train(emb, "vec_id", "embedding",
      m = M, k = K, iters = 0)
    val mseSeed = ProductQuantize.reconstructionMse(emb, "vec_id",
      "embedding", seedCb, m = M)
    val mseLloyd = ProductQuantize.reconstructionMse(emb, "vec_id",
      "embedding", cb, m = M)
    assert(mseLloyd < mseSeed,
      s"Lloyd MSE $mseLloyd !< seed MSE $mseSeed")
    // and the fit is nontrivial: better than encoding everything to a
    // single shared codeword per subspace (k = 1 collapses the
    // codebook to the per-subspace seed row)
    val oneCw = ProductQuantize.train(emb, "vec_id", "embedding",
      m = M, k = 1, iters = 1)
    val mseOne = ProductQuantize.reconstructionMse(emb, "vec_id",
      "embedding", oneCw, m = M)
    assert(mseLloyd < mseOne, s"k=$K no better than k=1")
  }

  test("codebook drift contract: aligned no-fire, re-embedded fires, retrain + re-profile recovers") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_pqdrift_spec_" +
      s"${ProcessHandle.current().pid()}"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles match {
        case null => ()
        case kids => kids.foreach(rm)
      }
      f.delete(); ()
    }
    rm(new java.io.File(path))
    try {
      IvfIndex.writePq(emb, "vec_id", "embedding", path,
        numCentroids = 8, m = M, k = K, pqIters = 1)
      ProductQuantize.writeQuantizationDriftProfile(emb, "vec_id",
        "embedding", path, tau = 2.0)
      def fired(batch: org.apache.spark.sql.DataFrame): Boolean =
        ProductQuantize.quantizationDrift(batch, "vec_id", "embedding", path)
          .head().getBoolean(4)
      val reEmbedded = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double") * lit(3.0))
          .as("embedding"))
      // a batch from the build distribution must not trigger a retrain
      assert(!fired(emb.filter(col("vec_id") % 2 === 1)))
      // a rescaled corpus reconstructs ~9x worse under frozen codewords
      assert(fired(reEmbedded))
      // and the monitors are complementary: the cosine cell assignment
      // is scale-invariant, so q202's balance monitor stays silent on
      // the exact batch that fires the reconstruction monitor
      IvfIndex.writeDriftProfile(spark, path)
      assert(!IvfIndex.driftCheck(reEmbedded, "vec_id", "embedding", path)
        .head().getBoolean(4))
      // recovery: retrain on the shifted corpus + re-profile (tau must
      // scale with the new distortion regime), then the batch is clean
      rm(new java.io.File(path))
      IvfIndex.writePq(reEmbedded, "vec_id", "embedding", path,
        numCentroids = 8, m = M, k = K, pqIters = 1)
      ProductQuantize.writeQuantizationDriftProfile(reEmbedded, "vec_id",
        "embedding", path, tau = 18.0)
      assert(!fired(reEmbedded))
    } finally rm(new java.io.File(path))
  }

  test("training is deterministic: identical codebooks across runs") {
    val again = ProductQuantize.train(emb, "vec_id", "embedding",
      m = M, k = K, iters = 1)
    val a = cb.collect().map(r => (r.getInt(0), r.getLong(1),
      r.getSeq[Double](2))).sortBy(t => (t._1, t._2))
    val b = again.collect().map(r => (r.getInt(0), r.getLong(1),
      r.getSeq[Double](2))).sortBy(t => (t._1, t._2))
    assert(a.toSeq == b.toSeq)
  }

  test("two-tier == ADC cut composed with the exact re-rank (composition law)") {
    val codes = ProductQuantize.encode(emb, "vec_id", "embedding", cb, m = M)
    val k = 7; val overfetch = 3
    val fromOp = ProductQuantize.topKTwoTier(codes, cb, emb, "vec_id",
        "embedding", qvec0, k = k, overfetch = overfetch,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val candIds = ProductQuantize.adcTopK(codes, cb, "vec_id", qvec0,
        k = k * overfetch, excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSet
    graft.functions.GraftFunctions.register(spark)
    val ndot = graft.functions.GraftFunctions.dotNative _
    val qv = typedlit(qvec0.toSeq)
    val expected = emb
      .filter(col("vec_id").isin(candIds.toSeq.map(x => x: Any): _*))
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(ndot(col("v"), col("v"))))
      .select(col("vec_id"),
        round(ndot(col("v"), qv) /
          (col("nrm") * sqrt(ndot(qv, qv))), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromOp == expected)
    assert(fromOp.size == k)
  }

  test("pq recall contract: all three rows green on the judged corpus") {
    val rows = ProductQuantize.pqRecallContract(emb, "vec_id", "embedding")
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(rows == Map("ivfpq" -> true, "pq_adc" -> true, "pq_two_tier" -> true),
      s"contract rows: $rows")
  }

  test("pq recall contract BITES: a degenerate codebook fails every row") {
    // one shared codeword per subspace: every vector encodes to the same
    // codes, ADC collapses to an id-tiebreak ranking ≈ a random ranking —
    // the corrupted-quantizer failure mode the contract exists to catch
    val degenerate = ProductQuantize.train(emb, "vec_id", "embedding",
      m = 8, k = 1, iters = 0)
    val n = emb.count()
    val hits = ProductQuantize.pqRecallHits(emb, "vec_id", "embedding",
      degenerate, probeEvery = 50, probeOffset = 7, k = 10, m = 8,
      numCentroids = 8, nprobe = 4,
      overfetch = math.max(8, ((n + 124) / 125).toInt))
    val rows = ProductQuantize.contractRows(hits, k = 10, n = n,
        adcChanceFactor = 5, ivfPqChanceFactor = 5, twoTierBound = 0.6)
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(rows.values.forall(_ == false),
      s"degenerate codebook must fail every bound: $rows")
  }

  test("residual recall contract: all three rows green; degenerate codebook fails the lossy tiers") {
    val rows = ProductQuantize.residualRecallContract(emb, "vec_id", "embedding")
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(rows == Map("ivfpq_residual" -> true, "residual_adc" -> true,
      "residual_two_tier" -> true), s"contract rows: $rows")
    // the contract bites: a single-codeword residual codebook collapses
    // every residual to one reconstruction per cell — ADC degenerates
    // to a per-cell constant + id tiebreak, ≈ random within cells
    val n = emb.count()
    val (res, corpus, cents) = ProductQuantize.residualBase(
      emb, "vec_id", "embedding", numCentroids = 8, kmeansIters = 1)
    val degenerate = ProductQuantize.train(res, "id", "rv",
      m = 8, k = 1, iters = 0)
    val hits = ProductQuantize.residualRecallHits(corpus, cents, res,
      degenerate, probeEvery = 50, probeOffset = 7, k = 10, m = 8,
      nprobe = 4, overfetch = math.max(8, ((n + 124) / 125).toInt))
    val broken = ProductQuantize.contractRows(hits, k = 10, n = n,
        adcChanceFactor = 5, ivfPqChanceFactor = 5, twoTierBound = 0.6,
        adcName = "residual_adc", ivfName = "ivfpq_residual",
        ttName = "residual_two_tier")
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    // the raw lossy tiers MUST fail their chance floors; the two-tier
    // row may survive (the corpus-scaled overfetch re-ranks exactly —
    // with one codeword per subspace the cut is near-random but wide)
    assert(broken("residual_adc") == false && broken("ivfpq_residual") == false,
      s"degenerate residual codebook must fail the lossy tiers: $broken")
    corpus.unpersist()
  }

  test("ADC candidate quality: the exact top-1 neighbor survives the overfetched cut") {
    // the serving claim: an ADC cut at k*overfetch keeps what the exact
    // re-rank needs — pin the minimal version (the true top-1 is in the
    // top-40 ADC candidates) so a broken LUT/assignment cannot hide
    val codes = ProductQuantize.encode(emb, "vec_id", "embedding", cb, m = M)
    val adcIds = ProductQuantize.adcTopK(codes, cb, "vec_id", qvec0,
        k = 40, excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSet
    val exactTop1 = Similarity.knnBrute(emb, "vec_id", "embedding",
        queryId = 0L, k = 1)
      .collect().map(_.getLong(0)).head
    assert(adcIds.contains(exactTop1),
      s"exact top-1 $exactTop1 missing from the ADC top-40")
  }
}
