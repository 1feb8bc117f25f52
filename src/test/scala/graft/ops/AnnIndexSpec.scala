package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The at-rest ANN index's two contracts: (1) layout cannot change
  * results — the probe's top-k equals [[Similarity.annQuery]]'s over
  * the same corpus/planes; (2) the driver-side bucket computation is
  * bit-identical to the in-plan codegen'd one for EVERY vector (same
  * sequential double accumulation), so a stored row always lands in
  * the directory a probe will look in.
  */
class AnnIndexSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val path = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_ann_index_spec"
    AnnIndex.write(emb, "vec_id", "embedding", p, numPlanes = 8, dim = 64)
    p
  }

  test("probe == annQuery: index layout cannot change the top-k") {
    val qvec = emb.filter(col("vec_id") === 0L)
      .select(Similarity.toDoubleVec(col("embedding")))
      .head().getSeq[Double](0).toArray
    val fromIndex = AnnIndex
      .probe(spark, path, "vec_id", qvec, k = 5, numPlanes = 8,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val perQuery = Similarity
      .annQuery(emb, "vec_id", "embedding", queryId = 0L, k = 5,
        numPlanes = 8, dim = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromIndex == perQuery)
    assert(fromIndex.nonEmpty)
  }

  test("bucket drift contract: aligned no-fire, fold fires, rescale provably invisible") {
    AnnIndex.writeDriftProfile(spark, path)
    def check(batch: org.apache.spark.sql.DataFrame) =
      AnnIndex.driftCheck(batch, "vec_id", "embedding", path, numPlanes = 8)
        .head()
    // the build corpus replayed as a batch reproduces the profile
    // exactly — driftCheck buckets with append's arithmetic
    val self = check(emb)
    assert(self.getLong(0) == self.getLong(2) &&
      self.getLong(1) == self.getLong(3))
    assert(!self.getBoolean(4))
    // an aligned batch must not trigger a re-bucketing
    assert(!check(emb.filter(col("vec_id") % 2 === 1)).getBoolean(4))
    // a directional collapse concentrates sign patterns and fires
    assert(check(emb.select(col("vec_id"),
      transform(col("embedding"), x => abs(x)).as("embedding")))
      .getBoolean(4))
    // sign(3v·p) = sign(v·p): the rescale that fires the PQ
    // reconstruction monitor yields BIT-IDENTICAL bucket counts here —
    // the two monitors partition the failure modes between them
    val re = check(emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double") * lit(3.0))
        .as("embedding")))
    assert(re.getLong(0) == re.getLong(2) && re.getLong(1) == re.getLong(3))
    assert(!re.getBoolean(4))
  }

  test("crossDedupAgainstIndex == nearDupPairs' odd-vs-even restriction; tombstones mask") {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete(); ()
    }
    val p = s"${sys.props("java.io.tmpdir")}/graft_ann_spec_cross"
    rm(new java.io.File(p))
    // write/append decomposition: the ingest replay must be invisible
    AnnIndex.write(emb.filter(col("vec_id") % 4 === 0), "vec_id",
      "embedding", p, numPlanes = 8, dim = 64)
    AnnIndex.append(emb.filter(col("vec_id") % 4 === 2), "vec_id",
      "embedding", p, numPlanes = 8, dim = 64)
    val cross = AnnIndex.crossDedupAgainstIndex(
        emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", p,
        threshold = 0.2, numPlanes = 8, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val whole = Similarity.nearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.2, numPlanes = 8, dim = 64)
      .collect()
      .flatMap { r =>
        val (x, y, s) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        // orient each unordered pair as (odd, even); drop same-parity
        if (x % 2 == 1 && y % 2 == 0) Some((x, y, s))
        else if (y % 2 == 1 && x % 2 == 0) Some((y, x, s))
        else None
      }.toSet
    assert(cross == whole)
    assert(cross.nonEmpty)
    // evict one stored id: its pairs vanish without a rewrite
    import spark.implicits._
    val victim = cross.head._2
    AnnIndex.deleteFromIndex(Seq(victim).toDF("vec_id"), "vec_id", p)
    val masked = AnnIndex.crossDedupAgainstIndex(
        emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", p,
        threshold = 0.2, numPlanes = 8, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(masked == cross.filterNot(_._2 == victim))
    rm(new java.io.File(p))
  }

  test("cosinePairsFromIndex == nearDupPairs over the same corpus; tombstones mask the sweep") {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete(); ()
    }
    val p = s"${sys.props("java.io.tmpdir")}/graft_ann_spec_sweep"
    rm(new java.io.File(p))
    // write/append decomposition: where the vectors live and how they
    // arrived cannot change a pair
    AnnIndex.write(emb.filter(col("vec_id") % 2 === 0), "vec_id",
      "embedding", p, numPlanes = 8, dim = 64)
    AnnIndex.append(emb.filter(col("vec_id") % 2 === 1), "vec_id",
      "embedding", p, numPlanes = 8, dim = 64)
    val fromStore = AnnIndex.cosinePairsFromIndex(spark, p, "vec_id",
        threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inSession = Similarity.nearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.2, numPlanes = 8, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fromStore == inSession)
    assert(fromStore.nonEmpty)
    // a tombstoned id leaves the decision pass before the purge
    import spark.implicits._
    val victim = fromStore.head._1
    AnnIndex.deleteFromIndex(Seq(victim).toDF("vec_id"), "vec_id", p)
    val masked = AnnIndex.cosinePairsFromIndex(spark, p, "vec_id",
        threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(masked == fromStore.filterNot(t => t._1 == victim || t._2 == victim))
    rm(new java.io.File(p))
  }

  test("delete: mask hides rows from every probe; purge rewrites only affected buckets") {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles match {
        case null => ()
        case kids => kids.foreach(rm)
      }
      f.delete(); ()
    }
    val p = s"${sys.props("java.io.tmpdir")}/graft_ann_spec_del"
    rm(new java.io.File(p))
    AnnIndex.write(emb, "vec_id", "embedding", p, numPlanes = 8, dim = 64)
    val qvec = emb.filter(col("vec_id") === 0L)
      .select(Similarity.toDoubleVec(col("embedding")))
      .head().getSeq[Double](0).toArray
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSeq
    // delete the current top-2 of the MULTI-probe (its 1-ball union is
    // deep enough at this corpus size — a single LSH bucket holds ~2
    // rows): the mask must pull the next candidates in, on every
    // probe flavor
    val before = ids(AnnIndex.probeMulti(spark, p, "vec_id", qvec, k = 5,
      numPlanes = 8, excludeId = Some(0L)))
    assert(before.size >= 3, s"fixture too thin: ${before.size} candidates")
    val doomed = before.take(2)
    import spark.implicits._
    AnnIndex.deleteFromIndex(doomed.toDF("vec_id"), "vec_id", p)
    val maskedSingle = ids(AnnIndex.probe(spark, p, "vec_id", qvec, k = 5,
      numPlanes = 8, excludeId = Some(0L)))
    val maskedMulti = ids(AnnIndex.probeMulti(spark, p, "vec_id", qvec, k = 5,
      numPlanes = 8, excludeId = Some(0L)))
    assert(doomed.forall(!maskedSingle.contains(_)))
    assert(doomed.forall(!maskedMulti.contains(_)))
    assert(maskedMulti.take(before.size - 2) == before.drop(2),
      "mask must only REMOVE rows — survivors keep their relative order")
    // double delete: no-op; tombstone relation stays minimal
    AnnIndex.deleteFromIndex(doomed.toDF("vec_id"), "vec_id", p)
    assert(spark.read.parquet(s"$p/_tombstones").count() == 2)
    // purge: untouched buckets keep byte-identical file lists
    val doomedBuckets = spark.read.parquet(p)
      .filter(col("vec_id").isin(doomed: _*))
      .select("bucket").distinct().collect().map(_.getString(0)).toSet
    def fileList(bucket: String) = new java.io.File(s"$p/bucket=$bucket")
      .listFiles().map(f => f.getName -> f.lastModified).sortBy(_._1).toSeq
    val untouched = spark.read.parquet(p).select("bucket").distinct()
      .collect().map(_.getString(0)).filterNot(doomedBuckets).take(3)
    val filesBefore = untouched.map(b => b -> fileList(b)).toMap
    AnnIndex.purgeIndex(spark, p, "vec_id")
    untouched.foreach(b => assert(fileList(b) == filesBefore(b),
      s"purge must not touch bucket $b"))
    assert(!new java.io.File(s"$p/_tombstones").exists)
    assert(spark.read.parquet(p).filter(col("vec_id").isin(doomed: _*)).count() == 0)
    assert(ids(AnnIndex.probe(spark, p, "vec_id", qvec, k = 5,
      numPlanes = 8, excludeId = Some(0L))) == maskedSingle,
      "purge must not change any probe")
    // compact-copy purges too: a destination with no _tombstones dir
    // must not resurrect deleted rows
    rm(new java.io.File(s"${p}_rt"))
    AnnIndex.write(emb, "vec_id", "embedding", s"${p}_rt",
      numPlanes = 8, dim = 64)
    AnnIndex.deleteFromIndex(doomed.toDF("vec_id"), "vec_id", s"${p}_rt")
    rm(new java.io.File(s"${p}_rt_dst"))
    AnnIndex.compact(spark, s"${p}_rt", s"${p}_rt_dst")
    assert(spark.read.parquet(s"${p}_rt_dst")
      .filter(col("vec_id").isin(doomed: _*)).count() == 0,
      "compact copy must not resurrect deleted rows")
    rm(new java.io.File(p)); rm(new java.io.File(s"${p}_rt"))
    rm(new java.io.File(s"${p}_rt_dst"))
  }

  test("driver-side bucketOf matches the stored partition value for every vector") {
    val planes = Similarity.lshPlanes(8, 64)
    val stored = spark.read.parquet(path)
      .select(col("vec_id"), col("bucket"), col("v"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getSeq[Double](2).toArray))
      .toMap
    assert(stored.nonEmpty)
    stored.foreach { case (id, (bucket, v)) =>
      assert(AnnIndex.bucketOf(v, 8) == bucket, s"vec $id bucket drift")
    }
    // and the in-plan expression agrees too
    val inPlan = emb
      .select(col("vec_id"),
        concat(lit("b"), Similarity.lshBucket(
          Similarity.toDoubleVec(col("embedding")), planes)).as("bk"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    stored.foreach { case (id, (bucket, _)) =>
      assert(inPlan(id) == bucket, s"vec $id in-plan bucket drift")
    }
  }

  test("append-built index == write-built index: ingest path cannot change the top-k") {
    val p2 = s"${sys.props("java.io.tmpdir")}/graft_ann_index_spec_append"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(p2))
    // three uneven batches, appended in sequence — partition dirs gain
    // files per batch, nothing is rewritten
    for (k <- 0 to 2)
      AnnIndex.append(emb.filter(col("vec_id") % 3 === k), "vec_id",
        "embedding", p2, numPlanes = 8, dim = 64)
    val qvec = emb.filter(col("vec_id") === 0L)
      .select(Similarity.toDoubleVec(col("embedding")))
      .head().getSeq[Double](0).toArray
    def top(p: String) = AnnIndex
      .probe(spark, p, "vec_id", qvec, k = 5, numPlanes = 8,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top(p2) == top(path))
    // and the appended index holds the full corpus, partitioned
    assert(spark.read.parquet(p2).count() == emb.count())
    rm(new java.io.File(p2))
  }

  test("compact: one file per bucket, byte-identical probe, full corpus kept") {
    val frag = s"${sys.props("java.io.tmpdir")}/graft_ann_index_spec_frag"
    val comp = s"${sys.props("java.io.tmpdir")}/graft_ann_index_spec_comp"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(frag))
    for (k <- 0 to 3)
      AnnIndex.append(emb.filter(col("vec_id") % 4 === k), "vec_id",
        "embedding", frag, numPlanes = 8, dim = 64)
    def filesPerBucket(p: String): Map[String, Int] =
      new java.io.File(p).listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    // precondition — the streaming-append outcome compaction exists for:
    // at least one bucket directory is fragmented into multiple files
    val before = filesPerBucket(frag)
    assert(before.values.exists(_ > 1),
      s"append never fragmented a bucket — the test premise is gone: $before")
    AnnIndex.compact(spark, frag, comp)
    val after = filesPerBucket(comp)
    assert(after.nonEmpty && after.values.forall(_ == 1),
      s"compaction must leave exactly one file per bucket: $after")
    assert(after.keySet == before.keySet, "compaction dropped/added buckets")
    // layout-only: same corpus, same probe answer
    assert(spark.read.parquet(comp).count() == emb.count())
    val qvec = emb.filter(col("vec_id") === 0L)
      .select(Similarity.toDoubleVec(col("embedding")))
      .head().getSeq[Double](0).toArray
    def top(p: String) = AnnIndex
      .probe(spark, p, "vec_id", qvec, k = 5, numPlanes = 8,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top(comp) == top(frag))
    rm(new java.io.File(frag))
    rm(new java.io.File(comp))
  }

  test("quantized index probe == in-plan quantized ranking within the float bucket") {
    val qp = s"${sys.props("java.io.tmpdir")}/graft_ann_index_spec_quant"
    AnnIndex.writeQuantized(emb, "vec_id", "embedding", qp,
      numPlanes = 8, dim = 64)
    // floats are NOT stored — the candidate tier is int8-only
    val sch = spark.read.parquet(qp).schema
    assert(!sch.fieldNames.contains("v"))
    assert(sch("qv").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.typeName == "byte")
    val qvec = emb.filter(col("vec_id") === 0L)
      .select(Similarity.toDoubleVec(col("embedding")))
      .head().getSeq[Double](0).toArray
    val got = AnnIndex
      .probeQuantized(spark, qp, "vec_id", qvec, k = 5, numPlanes = 8,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // reference semantics, assembled in-plan from the two judged halves:
    // bucket membership from the FLOAT vector, ranking from the int8 form
    val planes = Similarity.lshPlanes(8, 64)
    val qb = AnnIndex.bucketOf(qvec, 8)
    val qz = Quantize.quantize(emb, "vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("qv"), x => x.cast("double")).as("qd"))
    val qv0 = qz.filter(col("vec_id") === 0L).head().getSeq[Double](1)
    val expected = qz
      .join(emb.select(col("vec_id"),
        concat(lit("b"), Similarity.lshBucket(
          Similarity.toDoubleVec(col("embedding")), planes)).as("bucket")),
        "vec_id")
      .filter(col("bucket") === qb && col("vec_id") =!= 0L)
      .select(col("vec_id"),
        round(Similarity.dot(col("qd"), typedlit(qv0)) /
          (sqrt(Similarity.dot(col("qd"), col("qd"))) *
            math.sqrt(qv0.map(x => x * x).sum)), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("salted write == unsalted probe; files per bucket bounded by the salt") {
    // 2 planes -> 4 fat buckets (~125 rows each), so the salt actually
    // splits writer tasks instead of disappearing into 1-row buckets
    val plain = s"${sys.props("java.io.tmpdir")}/graft_ann_index_spec_nosalt"
    val salted = s"${sys.props("java.io.tmpdir")}/graft_ann_index_spec_salt"
    AnnIndex.write(emb, "vec_id", "embedding", plain, numPlanes = 2, dim = 64)
    // AQE coalesces this KB-scale shuffle to one partition (one writer
    // task → one file per bucket regardless of salt); pin it off for
    // the write so the test sees the at-scale writer fan-out, where
    // partitions are far above the coalesce target and never merge
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try AnnIndex.write(emb, "vec_id", "embedding", salted, numPlanes = 2,
      dim = 64, saltBuckets = 4)
    finally prev match {
      case Some(v) => spark.conf.set(coalesceKey, v)
      case None => spark.conf.unset(coalesceKey)
    }
    def filesPerBucket(p: String): Map[String, Int] =
      new java.io.File(p).listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    val fpb = filesPerBucket(salted)
    assert(fpb.keySet == filesPerBucket(plain).keySet,
      "salting changed the bucket layout")
    assert(fpb.values.forall(_ <= 4), s"more files than salt values: $fpb")
    // the salt's point: a fat bucket no longer writes through ONE task
    assert(fpb.values.exists(_ > 1),
      s"salt never split a fat bucket — the premise is gone: $fpb")
    val qvec = emb.filter(col("vec_id") === 0L)
      .select(Similarity.toDoubleVec(col("embedding")))
      .head().getSeq[Double](0).toArray
    def top(p: String) = AnnIndex
      .probe(spark, p, "vec_id", qvec, k = 5, numPlanes = 2,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top(salted) == top(plain))
    assert(top(salted).nonEmpty)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(plain)); rm(new java.io.File(salted))
  }

  test("compactBuckets: only over-threshold buckets rewritten, probe preserved") {
    val p = s"${sys.props("java.io.tmpdir")}/graft_ann_index_spec_optimize"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(p))
    // 4 appends over 4 fat buckets -> every bucket holds 4 part files
    for (k <- 0 to 3)
      AnnIndex.append(emb.filter(col("vec_id") % 4 === k), "vec_id",
        "embedding", p, numPlanes = 2, dim = 64)
    def fileNames(pp: String): Map[String, Set[String]] =
      new java.io.File(pp).listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .map(d => d.getName ->
          d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet)
        .toMap
    val before = fileNames(p)
    assert(before.values.forall(_.size == 4), s"fragmentation premise: $before")
    val qvec = emb.filter(col("vec_id") === 0L)
      .select(Similarity.toDoubleVec(col("embedding")))
      .head().getSeq[Double](0).toArray
    def top() = AnnIndex
      .probe(spark, p, "vec_id", qvec, k = 5, numPlanes = 2,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val expected = top()
    // threshold ABOVE the fragmentation: nothing rewritten, names intact
    assert(AnnIndex.compactBuckets(spark, p, maxFilesPerBucket = 4).isEmpty)
    assert(fileNames(p) == before, "a no-op maintenance pass touched files")
    // threshold below: every bucket compacts to ONE file, probe unchanged
    val done = AnnIndex.compactBuckets(spark, p, maxFilesPerBucket = 2)
    assert(done.sorted == before.keySet.map(_.stripPrefix("bucket=")).toSeq.sorted)
    val after = fileNames(p)
    assert(after.keySet == before.keySet)
    assert(after.values.forall(_.size == 1), s"per-bucket OPTIMIZE must leave one file: $after")
    assert(spark.read.parquet(p).count() == emb.count())
    assert(top() == expected)
    // steady state: a fresh small append re-fragments to 2 files; the
    // same threshold now leaves it alone (2 is not > 2)
    AnnIndex.append(emb.filter(col("vec_id") === 1L), "vec_id",
      "embedding", p, numPlanes = 2, dim = 64)
    assert(AnnIndex.compactBuckets(spark, p, maxFilesPerBucket = 2).isEmpty)
    assert(top() == expected)
    rm(new java.io.File(p))
  }

  test("probe of a vector NOT in the corpus still resolves (no exclusion)") {
    // a synthetic query vector: all ones — deterministic bucket, k rows
    val qvec = Array.fill(64)(1.0)
    val out = AnnIndex.probe(spark, path, "vec_id", qvec, k = 3,
      numPlanes = 8)
    assert(out.columns.toSeq == Seq("vec_id", "sim"))
    assert(out.count() <= 3)
  }

  test("probeMulti == the in-memory Hamming-1 union; candidates strictly widen") {
    val qvec = emb.filter(col("vec_id") === 0L)
      .select(Similarity.toDoubleVec(col("embedding")))
      .head().getSeq[Double](0).toArray
    // the at-rest union must be EXACTLY the in-memory 1-ball: same md5
    // planes ⇒ same probeBucketsOf values ⇒ same candidate membership —
    // this closes the loop between q112's judged multiprobe recall
    // regime and the serving layout
    val got = AnnIndex
      .probeMulti(spark, path, "vec_id", qvec, k = 5, numPlanes = 8,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val planes = Similarity.lshPlanes(8, 64)
    val buckets = AnnIndex.probeBucketsOf(qvec, 8)
    assert(buckets.size == 9 && buckets.distinct.size == 9)
    val qnrm = math.sqrt(qvec.map(x => x * x).sum)
    val expected = emb
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"),
        concat(lit("b"), Similarity.lshBucket(
          Similarity.toDoubleVec(col("embedding")), planes)).as("bucket"))
      .filter(col("bucket").isin(buckets: _*) && col("vec_id") =!= 0L &&
        exists(col("v"), x => x =!= 0.0))
      .select(col("vec_id"),
        round(Similarity.dot(col("v"), typedlit(qvec.toSeq)) /
          (sqrt(Similarity.dot(col("v"), col("v"))) * qnrm), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
    // recall premise: the 1-ball candidate set strictly contains the
    // single bucket's (k far above corpus size ⇒ full candidate sets)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet
    val single = ids(AnnIndex.probe(spark, path, "vec_id", qvec,
      k = 10000, numPlanes = 8, excludeId = Some(0L)))
    val multi = ids(AnnIndex.probeMulti(spark, path, "vec_id", qvec,
      k = 10000, numPlanes = 8, excludeId = Some(0L)))
    assert(single.subsetOf(multi), "multi-probe lost single-bucket candidates")
    assert(multi.size > single.size,
      s"the 1-ball never widened the candidate set (single=${single.size})")
  }

  test("appendQuantized-built index == writeQuantized-built: int8 ingest is layout-only") {
    val w = s"${sys.props("java.io.tmpdir")}/graft_ann_index_spec_qwrite"
    val a = s"${sys.props("java.io.tmpdir")}/graft_ann_index_spec_qappend"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(a))
    AnnIndex.writeQuantized(emb, "vec_id", "embedding", w,
      numPlanes = 8, dim = 64)
    for (k <- 0 to 2)
      AnnIndex.appendQuantized(emb.filter(col("vec_id") % 3 === k),
        "vec_id", "embedding", a, numPlanes = 8, dim = 64)
    val qvec = emb.filter(col("vec_id") === 0L)
      .select(Similarity.toDoubleVec(col("embedding")))
      .head().getSeq[Double](0).toArray
    def top(p: String) = AnnIndex
      .probeQuantized(spark, p, "vec_id", qvec, k = 5, numPlanes = 8,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top(a) == top(w))
    assert(top(a).nonEmpty)
    assert(spark.read.parquet(a).count() == emb.count())
    rm(new java.io.File(w)); rm(new java.io.File(a))
  }

  test("probeQuantizedMulti == quantized ranking over the in-memory 1-ball union") {
    val qp = s"${sys.props("java.io.tmpdir")}/graft_ann_index_spec_qmulti"
    AnnIndex.writeQuantized(emb, "vec_id", "embedding", qp,
      numPlanes = 8, dim = 64)
    val qvec = emb.filter(col("vec_id") === 0L)
      .select(Similarity.toDoubleVec(col("embedding")))
      .head().getSeq[Double](0).toArray
    val got = AnnIndex
      .probeQuantizedMulti(spark, qp, "vec_id", qvec, k = 5, numPlanes = 8,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // reference: quantized corpus (q122's pinned scheme) restricted to
    // the Hamming-1 bucket union (q123's pinned set), ranked in-plan
    val planes = Similarity.lshPlanes(8, 64)
    val buckets = AnnIndex.probeBucketsOf(qvec, 8)
    val qz = Quantize.quantize(emb, "vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("qv"), x => x.cast("double")).as("qd"))
    val qv0 = qz.filter(col("vec_id") === 0L).head().getSeq[Double](1)
    val expected = qz
      .join(emb.select(col("vec_id"),
        concat(lit("b"), Similarity.lshBucket(
          Similarity.toDoubleVec(col("embedding")), planes)).as("bucket")),
        "vec_id")
      .filter(col("bucket").isin(buckets: _*) && col("vec_id") =!= 0L &&
        exists(col("qd"), x => x =!= 0.0))
      .select(col("vec_id"),
        round(Similarity.dot(col("qd"), typedlit(qv0)) /
          (sqrt(Similarity.dot(col("qd"), col("qd"))) *
            math.sqrt(qv0.map(x => x * x).sum)), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
    // candidate widening, quantized edition: 1-ball ⊋ single bucket
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet
    val single = ids(AnnIndex.probeQuantized(spark, qp, "vec_id", qvec,
      k = 10000, numPlanes = 8, excludeId = Some(0L)))
    val multi = ids(AnnIndex.probeQuantizedMulti(spark, qp, "vec_id", qvec,
      k = 10000, numPlanes = 8, excludeId = Some(0L)))
    assert(single.subsetOf(multi) && multi.size > single.size)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(qp))
  }

  test("probeTwoTier == tier-1 quantized cut composed with an exact float re-rank") {
    val qp = s"${sys.props("java.io.tmpdir")}/graft_ann_index_spec_twotier"
    AnnIndex.writeQuantized(emb, "vec_id", "embedding", qp,
      numPlanes = 8, dim = 64)
    val qvec = emb.filter(col("vec_id") === 0L)
      .select(Similarity.toDoubleVec(col("embedding")))
      .head().getSeq[Double](0).toArray
    val got = AnnIndex
      .probeTwoTier(spark, qp, emb, "vec_id", "embedding", qvec,
        k = 3, overfetch = 4, numPlanes = 8, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // reference: the judged tier-1 op's cut (probeQuantized — q122's
    // pinned semantics), re-ranked by exact cosine assembled in-plan
    val candIds = AnnIndex
      .probeQuantized(spark, qp, "vec_id", qvec, k = 3 * 4, numPlanes = 8,
        excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSet
    assert(candIds.nonEmpty)
    val qnrm = math.sqrt(qvec.map(x => x * x).sum)
    val expected = emb
      .filter(col("vec_id").isin(candIds.toSeq: _*))
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
      .select(col("vec_id"),
        round(Similarity.dot(col("v"), typedlit(qvec.toSeq)) /
          (sqrt(Similarity.dot(col("v"), col("v"))) * qnrm), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
    // multiProbe = true composes with the q126 tier instead: same
    // re-rank over probeQuantizedMulti's (1-ball) cut
    val gotMulti = AnnIndex
      .probeTwoTier(spark, qp, emb, "vec_id", "embedding", qvec,
        k = 3, overfetch = 4, numPlanes = 8, excludeId = Some(0L),
        multiProbe = true)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val candMulti = AnnIndex
      .probeQuantizedMulti(spark, qp, "vec_id", qvec, k = 3 * 4,
        numPlanes = 8, excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSet
    val expMulti = emb
      .filter(col("vec_id").isin(candMulti.toSeq: _*))
      .select(col("vec_id"), Similarity.toDoubleVec(col("embedding")).as("v"))
      .select(col("vec_id"),
        round(Similarity.dot(col("v"), typedlit(qvec.toSeq)) /
          (sqrt(Similarity.dot(col("v"), col("v"))) * qnrm), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(gotMulti == expMulti)
    assert(candMulti.size > candIds.size,
      "the multiprobe tier-1 cut never widened past the single bucket")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(qp))
  }
}
