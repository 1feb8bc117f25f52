package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The at-rest IVF index's contracts: (1) layout cannot change
  * results — the probe's top-k equals [[Similarity.ivfQuery]]'s over
  * the same corpus/centroids; (2) every stored row sits in the cell
  * the in-plan argmax assigns (so a probe always looks in the right
  * directories); (3) the `_centroids` side table is invisible to the
  * data scan.
  */
class IvfIndexSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val path = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_ivf_index_spec"
    IvfIndex.write(emb, "vec_id", "embedding", p, numCentroids = 8)
    p
  }
  private def qvec0 = emb.filter(col("vec_id") === 0L)
    .select(Similarity.toDoubleVec(col("embedding")))
    .head().getSeq[Double](0).toArray

  test("probe == ivfQuery: index layout cannot change the top-k") {
    val fromIndex = IvfIndex
      .probe(spark, path, "vec_id", qvec0, k = 5, nprobe = 2,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val inPlan = Similarity
      .ivfQuery(emb, "vec_id", "embedding", queryId = 0L, k = 5,
        numCentroids = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromIndex == inPlan)
    assert(fromIndex.nonEmpty)
  }

  test("every stored row sits in its argmax cell; _centroids invisible to the scan") {
    val data = spark.read.parquet(path)
    // the centroid side table must NOT leak into the data scan
    assert(!data.columns.contains("cid") && !data.columns.contains("cv"))
    assert(data.count() == emb.count())
    val stored = data.select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = IvfIndex
      .assignmentOf(emb, "vec_id", "embedding", numCentroids = 8)
      .collect().map(r => r.getLong(0) -> s"c${r.getLong(1)}").toMap
    assert(stored == expected)
    // and the centroid table itself reads back with the full seed set
    val cents = spark.read.parquet(s"$path/_centroids")
    assert(cents.count() == 8)
    assert(cents.select("cid").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 8L))
  }

  test("append against frozen centroids == write-built: ingest cannot change the top-k") {
    val p2 = s"${sys.props("java.io.tmpdir")}/graft_ivf_index_spec_append"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(p2))
    // build from the half that CONTAINS the seed ids (0..7), then fold
    // the other half in against the stored centroids — the frozen
    // quantizer then equals the full-corpus one, so probes must agree
    IvfIndex.write(emb.filter(col("vec_id") < 250), "vec_id", "embedding",
      p2, numCentroids = 8)
    IvfIndex.append(spark, emb.filter(col("vec_id") >= 250), "vec_id",
      "embedding", p2)
    def top(p: String) = IvfIndex
      .probe(spark, p, "vec_id", qvec0, k = 5, nprobe = 2,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top(p2) == top(path))
    // the appended index holds the full corpus, and the centroid table
    // was never rewritten (still the 8 seed rows)
    assert(spark.read.parquet(p2).count() == emb.count())
    assert(spark.read.parquet(s"$p2/_centroids").count() == 8)
    // every appended row landed in the cell the frozen quantizer
    // assigns — cell sets agree with the write-built layout per vector
    val a = spark.read.parquet(p2).select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = spark.read.parquet(path).select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    rm(new java.io.File(p2))
  }

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles match {
      case null => ()
      case kids => kids.foreach(rm)
    }
    f.delete(); ()
  }

  test("probeQuantized == in-plan quantized ranking within the probed cells") {
    val p2 = s"${sys.props("java.io.tmpdir")}/graft_ivf_index_spec_quant"
    rm(new java.io.File(p2))
    IvfIndex.writeQuantized(emb, "vec_id", "embedding", p2, numCentroids = 8)
    // storage is int8-only: no float vector column at rest
    val data = spark.read.parquet(p2)
    assert(data.columns.sorted.toSeq == Seq("cell", "qnrm", "qv", "scale", "vec_id"))
    assert(data.count() == emb.count())
    // cells are the FLOAT assignment — candidate membership is exactly
    // the float layout's
    val cellsStored = data.select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val cellsFloat = spark.read.parquet(path).select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cellsStored == cellsFloat)
    // the probe equals quantized ranking over the same nprobe cells,
    // computed in-plan from first principles (Quantize.quantize +
    // the float cell assignment)
    val probeCells = IvfIndex.probeCellsOf(spark, p2, qvec0, nprobe = 2)
    val fromIndex = IvfIndex
      .probeQuantized(spark, p2, "vec_id", qvec0, k = 5, nprobe = 2,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    graft.functions.GraftFunctions.register(spark)
    val ndot = graft.functions.GraftFunctions.dotNative _
    val assign = IvfIndex.assignmentOf(emb, "vec_id", "embedding", 8)
      .select(col("vec_id"), concat(lit("c"), col("cell")).as("cell"))
    val m = qvec0.map(math.abs).max
    val qq = qvec0.map(x => BigDecimal(x * 127.0 / m)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val qv = typedlit(qq.toSeq)
    val inPlan = Quantize.quantize(emb, "vec_id", "embedding")
      .join(assign, "vec_id")
      .filter(col("cell").isin(probeCells: _*) && col("vec_id") =!= 0L)
      .withColumn("qd", transform(col("qv"), x => x.cast("double")))
      .filter(ndot(col("qd"), col("qd")) > 0)
      .select(col("vec_id"),
        round(ndot(col("qd"), qv) /
          (sqrt(ndot(col("qd"), col("qd"))) * sqrt(ndot(qv, qv))), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromIndex == inPlan)
    assert(fromIndex.nonEmpty)
    rm(new java.io.File(p2))
  }

  test("appendQuantized against frozen centroids == writeQuantized-built") {
    val pW = s"${sys.props("java.io.tmpdir")}/graft_ivf_spec_qw"
    val pA = s"${sys.props("java.io.tmpdir")}/graft_ivf_spec_qa"
    rm(new java.io.File(pW)); rm(new java.io.File(pA))
    IvfIndex.writeQuantized(emb, "vec_id", "embedding", pW, numCentroids = 8)
    IvfIndex.writeQuantized(emb.filter(col("vec_id") < 250), "vec_id",
      "embedding", pA, numCentroids = 8)
    IvfIndex.appendQuantized(spark, emb.filter(col("vec_id") >= 250),
      "vec_id", "embedding", pA)
    def top(p: String) = IvfIndex
      .probeQuantized(spark, p, "vec_id", qvec0, k = 5, nprobe = 2,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top(pA) == top(pW))
    assert(top(pA).nonEmpty)
    assert(spark.read.parquet(pA).count() == emb.count())
    assert(spark.read.parquet(s"$pA/_centroids").count() == 8)
    rm(new java.io.File(pW)); rm(new java.io.File(pA))
  }

  test("probeTwoTier == tier-1 quantized cell cut composed with an exact float re-rank") {
    val p2 = s"${sys.props("java.io.tmpdir")}/graft_ivf_spec_twotier"
    rm(new java.io.File(p2))
    IvfIndex.writeQuantized(emb, "vec_id", "embedding", p2, numCentroids = 8)
    val k = 7; val overfetch = 3
    val fromIndex = IvfIndex
      .probeTwoTier(spark, p2, emb, "vec_id", "embedding", qvec0,
        k = k, overfetch = overfetch, nprobe = 2, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // expected: the tier-1 op's own cut, re-ranked by exact cosine
    // in-plan — composition must equal its parts
    val candIds = IvfIndex
      .probeQuantized(spark, p2, "vec_id", qvec0, k = k * overfetch,
        nprobe = 2, excludeId = Some(0L))
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
    assert(fromIndex == expected)
    assert(fromIndex.size == k)
    rm(new java.io.File(p2))
  }

  test("writePq: codes-only storage, float cell membership, probe == in-plan ADC over the probed cells") {
    val pP = s"${sys.props("java.io.tmpdir")}/graft_ivf_spec_pq"
    rm(new java.io.File(pP))
    IvfIndex.writePq(emb, "vec_id", "embedding", pP, numCentroids = 8,
      m = 4, k = 8, pqIters = 1)
    val data = spark.read.parquet(pP)
    // storage is codes only — no float vector anywhere in the rows
    assert(data.columns.sorted.toSeq == Seq("cell", "code", "sub", "vec_id"))
    assert(data.count() == emb.count() * 4)
    // cell membership is exactly the FLOAT layout's
    val cellsStored = data.select("vec_id", "cell").distinct()
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val cellsFloat = spark.read.parquet(path).select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cellsStored == cellsFloat)
    // codes equal the in-plan encoding against the STORED codebook
    val storedCb = spark.read.parquet(s"$pP/_codebook")
    assert(storedCb.count() == 4 * 8)
    val codesStored = data.select("vec_id", "sub", "code")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val codesInPlan = ProductQuantize
      .encode(emb, "vec_id", "embedding", storedCb, m = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(codesStored == codesInPlan)
    // probe == ADC ranking over the in-plan codes restricted to the
    // probed cells — the composition must equal its parts
    val probeCells = IvfIndex.probeCellsOf(spark, pP, qvec0, nprobe = 2)
    val fromIndex = IvfIndex
      .probePq(spark, pP, "vec_id", qvec0, k = 5, nprobe = 2,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val cellOf = spark.read.parquet(path).select("vec_id", "cell")
    val inPlan = ProductQuantize.adcTopK(
        ProductQuantize.encode(emb, "vec_id", "embedding", storedCb, m = 4)
          .join(cellOf.filter(col("cell").isin(probeCells: _*)), "vec_id"),
        storedCb, "vec_id", qvec0, k = 5, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromIndex == inPlan)
    assert(fromIndex.nonEmpty)
    rm(new java.io.File(pP))
  }

  test("appendPq codes history against the build-time quantizers, pure partition append") {
    val pA = s"${sys.props("java.io.tmpdir")}/graft_ivf_spec_pq_append"
    rm(new java.io.File(pA))
    IvfIndex.writePq(emb.filter(col("vec_id") < 250), "vec_id", "embedding",
      pA, numCentroids = 8, m = 4, k = 8, pqIters = 1)
    val frozenCb = spark.read.parquet(s"$pA/_codebook").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    IvfIndex.appendPq(spark, emb.filter(col("vec_id") >= 250), "vec_id",
      "embedding", pA)
    // neither side table was rewritten by the append
    val cbAfter = spark.read.parquet(s"$pA/_codebook").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    assert(cbAfter == frozenCb)
    assert(spark.read.parquet(s"$pA/_centroids").count() == 8)
    // every row (old and appended) carries the code the FROZEN codebook
    // assigns and sits in the cell the FROZEN float quantizer assigns
    val data = spark.read.parquet(pA)
    assert(data.count() == emb.count() * 4)
    val storedCb = spark.read.parquet(s"$pA/_codebook")
    val codesStored = data.select("vec_id", "sub", "code")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val codesInPlan = ProductQuantize
      .encode(emb, "vec_id", "embedding", storedCb, m = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(codesStored == codesInPlan)
    val cellsStored = data.select("vec_id", "cell").distinct()
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val cellsFloat = spark.read.parquet(path).select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cellsStored == cellsFloat)
    rm(new java.io.File(pA))
  }

  test("probeTwoTierPq == ADC cell cut composed with the exact float re-rank") {
    val pP = s"${sys.props("java.io.tmpdir")}/graft_ivf_spec_pq_twotier"
    rm(new java.io.File(pP))
    IvfIndex.writePq(emb, "vec_id", "embedding", pP, numCentroids = 8,
      m = 4, k = 8, pqIters = 1)
    val k = 7; val overfetch = 3
    val fromIndex = IvfIndex
      .probeTwoTierPq(spark, pP, emb, "vec_id", "embedding", qvec0,
        k = k, overfetch = overfetch, nprobe = 2, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val candIds = IvfIndex
      .probePq(spark, pP, "vec_id", qvec0, k = k * overfetch,
        nprobe = 2, excludeId = Some(0L))
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
    assert(fromIndex == expected)
    assert(fromIndex.size == k)
    rm(new java.io.File(pP))
  }

  test("residual PQ under Lloyd centroids beats raw PQ at equal m*k; raw seeds would NOT") {
    // raw: codebook over the vectors themselves
    val rawCb = ProductQuantize.train(emb, "vec_id", "embedding",
      m = 4, k = 8, iters = 1)
    val rawMse = ProductQuantize.reconstructionMse(emb, "vec_id",
      "embedding", rawCb, m = 4)
    // residual: the same m*k budget over v - centroid(cell); its
    // residual-space MSE IS the composed scheme's reconstruction error
    // (||v - (c + r_hat)||^2 = ||r - r_hat||^2)
    def resMseFor(kmeansIters: Int): Double = {
      val assign = IvfIndex.assignmentOf(emb, "vec_id", "embedding",
        numCentroids = 8, kmeansIters = kmeansIters)
      val cents =
        if (kmeansIters == 0)
          emb.select(col("vec_id").as("cid"),
              Similarity.toDoubleVec(col("embedding")).as("cv"))
            .orderBy(col("cid")).limit(8)
        else Similarity.kmeansCentroids(emb, "vec_id", "embedding",
          8, kmeansIters).select(col("cid"), col("cv"))
      val res = emb
        .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
        .join(assign, "vec_id")
        .join(broadcast(cents), col("cell") === col("cid"))
        .select(col("vec_id"),
          zip_with(col("v"), col("cv"), (a, b) => a - b).as("rv"))
      val resCb = ProductQuantize.train(res, "vec_id", "rv",
        m = 4, k = 8, iters = 1)
      ProductQuantize.reconstructionMse(res, "vec_id", "rv", resCb, m = 4)
    }
    // the FAISS lever pays under cluster-center centroids...
    assert(resMseFor(1) < rawMse,
      s"residual MSE ${resMseFor(1)} !< raw MSE $rawMse under Lloyd centroids")
    // ...and is a measured ANTI-pattern under raw lowest-id seeds
    // (subtracting a near-orthogonal vector adds energy) — the reason
    // writePqResidual's contract requires the refined quantizer
    assert(resMseFor(0) > rawMse,
      "if raw seeds ever beat raw PQ here, the scaladoc caveat is stale")
  }

  test("appendPqResidual codes history against BOTH frozen quantizers; append == write") {
    val pW = s"${sys.props("java.io.tmpdir")}/graft_ivf_spec_pqres_w"
    val pA = s"${sys.props("java.io.tmpdir")}/graft_ivf_spec_pqres_a"
    rm(new java.io.File(pW)); rm(new java.io.File(pA))
    IvfIndex.writePqResidual(emb, "vec_id", "embedding", pW,
      numCentroids = 8, m = 4, k = 8, pqIters = 1, kmeansIters = 1)
    // slice-built: both frozen artifacts (the slice's Lloyd centroids
    // AND the slice-trained residual codebook) genuinely differ from
    // the full-corpus ones — the append contract is exactly that rows
    // are coded against the STORED artifacts, whatever they are
    IvfIndex.writePqResidual(emb.filter(col("vec_id") < 250), "vec_id",
      "embedding", pA, numCentroids = 8, m = 4, k = 8, pqIters = 1,
      kmeansIters = 1)
    val frozenCb = spark.read.parquet(s"$pA/_codebook").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    IvfIndex.appendPqResidual(spark, emb.filter(col("vec_id") >= 250),
      "vec_id", "embedding", pA)
    // neither side table rewritten; every row present exactly once
    val cbAfter = spark.read.parquet(s"$pA/_codebook").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    assert(cbAfter == frozenCb)
    val data = spark.read.parquet(pA)
    assert(data.count() == emb.count() * 4)
    assert(data.groupBy("vec_id").count().filter(col("count") =!= 4).count() == 0)
    // probe equality on the FULL-build index: layout == in-plan answer
    // is covered by the judged oracle; here pin that a probe of the
    // ingest-built index returns k rows deterministically twice
    val p1 = IvfIndex.probePqResidual(spark, pA, "vec_id", qvec0,
      k = 5, nprobe = 2, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val p2 = IvfIndex.probePqResidual(spark, pA, "vec_id", qvec0,
      k = 5, nprobe = 2, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(p1 == p2 && p1.size == 5)
    // two-tier tail: composition law against the tier-1 cut
    val k = 6; val overfetch = 3
    val fromOp = IvfIndex.probeTwoTierPqResidual(spark, pW, emb, "vec_id",
        "embedding", qvec0, k = k, overfetch = overfetch, nprobe = 2,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val candIds = IvfIndex.probePqResidual(spark, pW, "vec_id", qvec0,
        k = k * overfetch, nprobe = 2, excludeId = Some(0L))
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
    rm(new java.io.File(pW)); rm(new java.io.File(pA))
  }

  test("probePqResidual refuses a ragged codebook loudly") {
    // adcTopK's consistency guard, mirrored: mixed codeword widths mean
    // a corrupted codebook, and slicing the query by max-width would
    // mis-score silently
    val pR = s"${sys.props("java.io.tmpdir")}/graft_ivf_spec_pqres_ragged"
    rm(new java.io.File(pR))
    IvfIndex.writePqResidual(emb.filter(col("vec_id") < 300), "vec_id",
      "embedding", pR, numCentroids = 8, m = 4, k = 8, pqIters = 1,
      kmeansIters = 1)
    // corrupt ONE codeword to a shorter width
    val cb = spark.read.parquet(s"$pR/_codebook")
    val ragged = cb.withColumn("cv",
      when(col("sub") === 0 && col("cid") === 0L, slice(col("cv"), 1, 2))
        .otherwise(col("cv")))
    ragged.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$pR/_codebook_ragged")
    // swap in the corrupted codebook
    val fs = new org.apache.hadoop.fs.Path(pR)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$pR/_codebook"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$pR/_codebook_ragged"),
      new org.apache.hadoop.fs.Path(s"$pR/_codebook"))
    val ex = intercept[IllegalArgumentException] {
      IvfIndex.probePqResidual(spark, pR, "vec_id", qvec0, k = 5, nprobe = 2)
    }
    assert(ex.getMessage.contains("ragged codebook"))
    rm(new java.io.File(pR))
  }

  test("delete masks every IVF probe flavor; purge physical; rebuild clears tombstones") {
    import spark.implicits._
    val pF = s"${sys.props("java.io.tmpdir")}/graft_ivf_spec_del_f"
    val pQ = s"${sys.props("java.io.tmpdir")}/graft_ivf_spec_del_q"
    val pP = s"${sys.props("java.io.tmpdir")}/graft_ivf_spec_del_p"
    val pR = s"${sys.props("java.io.tmpdir")}/graft_ivf_spec_del_r"
    Seq(pF, pQ, pP, pR).foreach(p => rm(new java.io.File(p)))
    IvfIndex.write(emb, "vec_id", "embedding", pF, numCentroids = 8)
    IvfIndex.writeQuantized(emb, "vec_id", "embedding", pQ, numCentroids = 8)
    IvfIndex.writePq(emb, "vec_id", "embedding", pP, numCentroids = 8,
      m = 4, k = 8, pqIters = 1)
    IvfIndex.writePqResidual(emb, "vec_id", "embedding", pR,
      numCentroids = 8, m = 4, k = 8, pqIters = 1, kmeansIters = 1)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSeq
    val before = ids(IvfIndex.probe(spark, pF, "vec_id", qvec0, k = 5,
      nprobe = 2, excludeId = Some(0L)))
    val doomed = before.take(2)
    val dDf = doomed.toDF("vec_id")
    Seq(pF, pQ, pP, pR).foreach(p => IvfIndex.delete(dDf, "vec_id", p))
    // every probe flavor masks
    val mF = ids(IvfIndex.probe(spark, pF, "vec_id", qvec0, k = 5,
      nprobe = 2, excludeId = Some(0L)))
    assert(doomed.forall(!mF.contains(_)))
    assert(mF.take(before.size - 2) == before.drop(2))
    assert(doomed.forall(!ids(IvfIndex.probeQuantized(spark, pQ, "vec_id",
      qvec0, k = 5, nprobe = 2, excludeId = Some(0L))).contains(_)))
    assert(doomed.forall(!ids(IvfIndex.probePq(spark, pP, "vec_id",
      qvec0, k = 5, nprobe = 2, excludeId = Some(0L))).contains(_)))
    assert(doomed.forall(!ids(IvfIndex.probePqResidual(spark, pR, "vec_id",
      qvec0, k = 5, nprobe = 2, excludeId = Some(0L))).contains(_)))
    // purge: rows gone, tombstones cleared, probe unchanged, frozen
    // centroids untouched
    val centsBefore = spark.read.parquet(s"$pF/_centroids").collect()
      .map(r => r.getLong(0)).sorted.toSeq
    IvfIndex.purge(spark, pF, "vec_id")
    assert(!new java.io.File(s"$pF/_tombstones").exists)
    assert(spark.read.parquet(pF)
      .filter(col("vec_id").isin(doomed: _*)).count() == 0)
    assert(ids(IvfIndex.probe(spark, pF, "vec_id", qvec0, k = 5,
      nprobe = 2, excludeId = Some(0L))) == mF)
    assert(spark.read.parquet(s"$pF/_centroids").collect()
      .map(r => r.getLong(0)).sorted.toSeq == centsBefore,
      "purge must never touch the frozen quantizer")
    // rebuild is the delete family's terminal compaction: deleted rows
    // don't enter the refreshed layout and _tombstones is cleared
    val doomed2 = mF.take(1)
    IvfIndex.delete(doomed2.toDF("vec_id"), "vec_id", pF)
    IvfIndex.rebuild(spark, pF, "vec_id", numCentroids = 8)
    assert(!new java.io.File(s"$pF/_tombstones").exists,
      "rebuild must clear the tombstones with the old layout")
    assert(spark.read.parquet(pF)
      .filter(col("vec_id").isin(doomed2: _*)).count() == 0,
      "rebuild must not carry deleted rows into the refreshed layout")
    Seq(pF, pQ, pP, pR).foreach(p => rm(new java.io.File(p)))
  }

  test("rebuild after appends == fresh write on the union corpus") {
    val pR = s"${sys.props("java.io.tmpdir")}/graft_ivf_spec_rebuild"
    rm(new java.io.File(pR))
    // ingest history: build on a slice that does NOT contain all seed
    // ids (vec_id >= 4 only has seeds 4..7), append the rest — the
    // frozen quantizer is now genuinely different from the fresh one,
    // so ONLY a rebuild can restore fresh-build equality
    IvfIndex.write(emb.filter(col("vec_id") >= 4), "vec_id", "embedding",
      pR, numCentroids = 8)
    IvfIndex.append(spark, emb.filter(col("vec_id") < 4), "vec_id",
      "embedding", pR)
    val frozenCents = spark.read.parquet(s"$pR/_centroids")
      .select("cid").collect().map(_.getLong(0)).sorted.toSeq
    assert(frozenCents == (4L until 12L), "premise: frozen quantizer differs")
    IvfIndex.rebuild(spark, pR, "vec_id", numCentroids = 8)
    // the rebuilt quantizer re-seeds from the union corpus (ids 0..7)
    val rebuiltCents = spark.read.parquet(s"$pR/_centroids")
      .select("cid").collect().map(_.getLong(0)).sorted.toSeq
    assert(rebuiltCents == (0L until 8L))
    def top(p: String) = IvfIndex
      .probe(spark, p, "vec_id", qvec0, k = 5, nprobe = 2,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top(pR) == top(path))
    assert(top(pR).nonEmpty)
    // full corpus survives the swap; per-vector cells equal fresh-built
    assert(spark.read.parquet(pR).count() == emb.count())
    val a = spark.read.parquet(pR).select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = spark.read.parquet(path).select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    rm(new java.io.File(pR))
  }

  test("kmeans-seeded index: stored cells == judged kmeans assignment; probe == in-plan ranking") {
    val pK = s"${sys.props("java.io.tmpdir")}/graft_ivf_spec_kmeans"
    rm(new java.io.File(pK))
    IvfIndex.write(emb, "vec_id", "embedding", pK, numCentroids = 8,
      kmeansIters = 1)
    // the layout's cell relation IS q82's kmeans assignment — the two
    // judged operators compose without a seam
    val cellsStored = spark.read.parquet(pK).select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val kmAssign = Similarity.kmeans(emb, "vec_id", "embedding", k = 8, iters = 1)
      .collect().map(r => r.getLong(0) -> s"c${r.getLong(1)}").toMap
    assert(cellsStored == kmAssign)
    // the stored quantizer is the refined centroid table, not raw rows
    val cents = spark.read.parquet(s"$pK/_centroids")
    assert(cents.count() == 8)
    // probe == exact ranking within the 2 best refined cells, in-plan
    val probeCells = IvfIndex.probeCellsOf(spark, pK, qvec0, nprobe = 2)
    val fromIndex = IvfIndex
      .probe(spark, pK, "vec_id", qvec0, k = 5, nprobe = 2,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    graft.functions.GraftFunctions.register(spark)
    val ndot = graft.functions.GraftFunctions.dotNative _
    val qv = typedlit(qvec0.toSeq)
    val assignDf = Similarity.kmeans(emb, "vec_id", "embedding", k = 8, iters = 1)
      .select(col("vec_id"), concat(lit("c"), col("cell")).as("cell"))
    val inPlan = emb
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
      .join(assignDf, "vec_id")
      .filter(col("cell").isin(probeCells: _*) && col("vec_id") =!= 0L)
      .withColumn("nrm", sqrt(ndot(col("v"), col("v"))))
      .select(col("vec_id"),
        round(ndot(col("v"), qv) /
          (col("nrm") * sqrt(ndot(qv, qv))), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromIndex == inPlan)
    assert(fromIndex.nonEmpty)
    rm(new java.io.File(pK))
  }

  test("kmeans seeding measurably improves cell balance over lowest-id seeding") {
    // cell balance IS the pruning ratio at scale: a probe reads
    // nprobe/numCentroids of the corpus only if populations are
    // comparable, so the refined quantizer must not be WORSE than the
    // geometry-blind one on the judged corpus — pin max-cell population
    // (the fat-cell statistic ProfileIvfDrift reports)
    def maxCell(iters: Int): Long = IvfIndex
      .assignmentOf(emb, "vec_id", "embedding", numCentroids = 8,
        kmeansIters = iters)
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    val lowestId = maxCell(0)
    val kmeans = maxCell(1)
    assert(kmeans < lowestId,
      s"kmeans max-cell $kmeans !< lowest-id max-cell $lowestId")
  }

  test("rebuild(kmeansIters=1) after appends == fresh kmeans-seeded write") {
    val pR = s"${sys.props("java.io.tmpdir")}/graft_ivf_spec_rebuild_km"
    val pF = s"${sys.props("java.io.tmpdir")}/graft_ivf_spec_fresh_km"
    rm(new java.io.File(pR)); rm(new java.io.File(pF))
    IvfIndex.write(emb.filter(col("vec_id") >= 4), "vec_id", "embedding",
      pR, numCentroids = 8, kmeansIters = 1)
    IvfIndex.append(spark, emb.filter(col("vec_id") < 4), "vec_id",
      "embedding", pR)
    IvfIndex.rebuild(spark, pR, "vec_id", numCentroids = 8, kmeansIters = 1)
    IvfIndex.write(emb, "vec_id", "embedding", pF, numCentroids = 8,
      kmeansIters = 1)
    def top(p: String) = IvfIndex
      .probe(spark, p, "vec_id", qvec0, k = 5, nprobe = 2,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top(pR) == top(pF))
    assert(top(pR).nonEmpty)
    val a = spark.read.parquet(pR).select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = spark.read.parquet(pF).select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    rm(new java.io.File(pR)); rm(new java.io.File(pF))
  }

  test("rebuild refuses the quantized layout loudly") {
    val pQ = s"${sys.props("java.io.tmpdir")}/graft_ivf_spec_rebuild_quant"
    rm(new java.io.File(pQ))
    IvfIndex.writeQuantized(emb, "vec_id", "embedding", pQ, numCentroids = 8)
    val e = intercept[IllegalArgumentException] {
      IvfIndex.rebuild(spark, pQ, "vec_id", numCentroids = 8)
    }
    assert(e.getMessage.contains("quantized layout"))
    // and the refusal left the index untouched
    assert(spark.read.parquet(pQ).count() == emb.count())
    rm(new java.io.File(pQ))
  }

  test("driftCheck: aligned batch never fires, a shifted batch does, rebuild+re-profile recovers") {
    val p = s"${sys.props("java.io.tmpdir")}/graft_ivf_spec_drift"
    rm(new java.io.File(p))
    IvfIndex.write(emb, "vec_id", "embedding", p, numCentroids = 8)
    IvfIndex.writeDriftProfile(spark, p)
    // the cross-engine-exact integer ratio the verdict compares:
    // (batch_max/batch_total) / (build_max/build_total), as a double
    // only for the spec's ordering assertions
    def ratio(batch: org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val r = IvfIndex.driftCheck(batch, "vec_id", "embedding", p).head()
      (r.getAs[Long]("batch_max").toDouble * r.getAs[Long]("build_total") /
        (r.getAs[Long]("build_max").toDouble * r.getAs[Long]("batch_total")),
        r.getAs[Boolean]("rebuild_fired"))
    }
    // a batch drawn from the build distribution keeps the ratio ~1
    val (alignedRatio, alignedFired) = ratio(emb.filter(col("vec_id") % 2 === 1))
    assert(!alignedFired && alignedRatio < 1.5)
    // |x| collapses the corpus into the positive orthant: assignment
    // concentrates, the max-cell fraction blows past 1.5x the build's
    val drifted = emb.select(col("vec_id"),
      transform(col("embedding"), x => abs(x)).as("embedding"))
    val (driftRatio, driftFired) = ratio(drifted)
    assert(driftFired && driftRatio > 1.5)
    // remediation: fold the drifted batch in, rebuild the quantizer
    // over the grown corpus (Lloyd-refined), re-profile — the SAME
    // batch's imbalance ratio drops sharply against the refreshed
    // baseline (the new geometry carves the positive orthant into its
    // own cells; the batch stays a skewed SLICE of the mixed corpus,
    // so the contract is a measured improvement, not ratio 1)
    IvfIndex.append(spark,
      drifted.select((col("vec_id") + 100000L).as("vec_id"), col("embedding")),
      "vec_id", "embedding", p)
    IvfIndex.rebuild(spark, p, "vec_id", numCentroids = 8, kmeansIters = 1)
    IvfIndex.writeDriftProfile(spark, p)
    val (rebuiltRatio, _) = ratio(drifted)
    assert(rebuiltRatio < driftRatio * 0.6,
      s"rebuild must sharply cut the drift ratio: $driftRatio -> $rebuiltRatio")
    rm(new java.io.File(p))
  }

  test("probeCellsOf: a zero-norm query degrades to cid order, never a NaN throw") {
    // qnrm = 0 makes every cell sim 0/0 = NaN; the probe must still
    // return nprobe cells (ranked last = all tied -> cid ascending),
    // matching ivfQuery's graceful NULL-sim degradation instead of
    // BigDecimal(NaN) throwing
    val cells = IvfIndex.probeCellsOf(spark, path, Array.fill(64)(0.0),
      nprobe = 3)
    assert(cells == Seq("c0", "c1", "c2"))
  }

  test("probeCellsOf ranks cells exactly as the in-plan centroid pick") {
    // driver-side round/dot must reproduce the in-plan (qsim desc, cid)
    // order — nprobe = numCentroids makes the FULL ranking observable
    val all = IvfIndex.probeCellsOf(spark, path, qvec0, nprobe = 8)
    assert(all.size == 8 && all.distinct.size == 8)
    val ndot = graft.functions.GraftFunctions.dotNative _
    graft.functions.GraftFunctions.register(spark)
    val qv = typedlit(qvec0.toSeq)
    val inPlan = spark.read.parquet(s"$path/_centroids")
      .select(col("cid"),
        round(ndot(col("cv"), qv) /
          (col("cnrm") * sqrt(ndot(qv, qv))), 6).as("qsim"))
      .orderBy(col("qsim").desc, col("cid"))
      .collect().map(r => s"c${r.getLong(0)}").toSeq
    assert(all == inPlan)
  }
}
