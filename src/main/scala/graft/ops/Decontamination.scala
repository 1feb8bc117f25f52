package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training-corpus documents that share
  * k-gram shingles with a held-out benchmark/eval set — the overlap
  * check a training-data pipeline runs before a corpus ships (an eval
  * question leaking into pretraining data invalidates the eval).
  *
  * Scale design: the join is keyed on the shingle string, so the
  * shuffle carries (shingle → doc list) groups, never a pair space.
  * The benchmark side is the small one by construction (evals are
  * thousands of docs, corpora are billions) — Catalyst/AQE broadcasts
  * its shingle relation and the corpus-sized side is scanned in place.
  * The skew lever is `maxBenchShingleDf`: a shingle occurring in many
  * benchmark docs fans every matching corpus doc out to all of them;
  * capping benchmark-side document frequency drops those stop-shingles
  * (they carry no contamination signal — boilerplate, not leakage)
  * and bounds the per-shingle fan-out.
  */
object Decontamination {

  /** One row per (corpus doc, benchmark doc) sharing at least
    * `minOverlap` distinct k-gram shingles: (corpus_id, bench_id,
    * n_overlap). Shingling matches [[Dedup.shingleTable]] (lowercased
    * whitespace tokens, distinct k-grams per doc).
    *
    * @param maxBenchShingleDf drop shingles appearing in more than
    *   this many benchmark docs (0 = keep all). See class doc.
    */
  def overlapReport(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, k: Int = 5, minOverlap: Int = 3,
      maxBenchShingleDf: Int = 0): DataFrame = {
    val corpusSh = Dedup.shingleTable(corpus, idCol, textCol, k)
      .toDF("corpus_id", "sh")
    val benchShRaw = Dedup.shingleTable(benchmark, idCol, textCol, k)
      .toDF("bench_id", "sh")
    val benchSh =
      if (maxBenchShingleDf <= 0) benchShRaw
      else {
        // document frequency over the (small) benchmark side only — one
        // aggregate over benchmark shingles, never over the corpus
        val hot = benchShRaw.groupBy("sh")
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > maxBenchShingleDf)
          .select("sh")
        benchShRaw.join(broadcast(hot), Seq("sh"), "left_anti")
      }
    corpusSh.join(benchSh, "sh")
      .groupBy("corpus_id", "bench_id")
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** Per-corpus-doc contamination verdict: worst overlapping benchmark
    * doc and the overlap count — the per-document drop/keep signal.
    */
  def contaminatedDocs(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, k: Int = 5, minOverlap: Int = 3,
      maxBenchShingleDf: Int = 0): DataFrame =
    overlapReport(corpus, benchmark, idCol, textCol, k, minOverlap, maxBenchShingleDf)
      .groupBy("corpus_id")
      .agg(max(struct(col("n_overlap"), col("bench_id"))).as("worst"))
      .select(col("corpus_id"), col("worst.bench_id").as("bench_id"),
        col("worst.n_overlap").as("n_overlap"))

  // -------------------------------------------------- benchmark at rest

  /** Persist the benchmark's shingle relation — the production shape:
    * the eval set is FROZEN the day it ships (that is what makes it an
    * eval), so its shingles are computed ONCE — stop-shingle cap
    * included, it is a property of the frozen benchmark — and every
    * incoming training batch probes the stored relation without the
    * eval text ever being re-read (or even being co-located with the
    * training pipeline: shipping eval TEXT to the training cluster is
    * itself a leak vector; shingles are one-way enough for the overlap
    * check). `_layout` records (k, max_bench_shingle_df) so probes
    * replay the build contract exactly.
    */
  def writeBenchIndex(benchmark: DataFrame, idCol: String, textCol: String,
      path: String, k: Int = 5, maxBenchShingleDf: Int = 0): Unit =
    writeBenchVersion(benchmark, idCol, textCol, path, "v0",
      k, maxBenchShingleDf)

  /** Add a benchmark VERSION to the index — real pipelines rotate eval
    * releases (v1 ships, v2 supersedes it, v1 is retired), so the
    * store is partitioned `bench_sh/ver=<version>/` with one frozen
    * `_layout` for all of them: k and the df cap are properties of the
    * INDEX (an overlap count must mean the same thing across
    * versions), frozen at bootstrap — later versions reuse them and
    * the passed parameters are ignored. Each version overwrites only
    * its own partition (idempotent retry); the df cap is applied
    * within the version (it is a property of that frozen eval set).
    */
  def writeBenchVersion(benchmark: DataFrame, idCol: String, textCol: String,
      path: String, version: String, k: Int = 5,
      maxBenchShingleDf: Int = 0): Unit = {
    requireVersionToken(version)
    import benchmark.sparkSession.implicits._
    val spark = benchmark.sparkSession
    val (kUse, capUse) = layoutOf(spark, path).getOrElse((k, maxBenchShingleDf))
    // freeze the layout BEFORE the version's shingles land: probes
    // require `_layout` to exist, so a crash between the two writes
    // must leave a layout with no shingles (harmless — the version
    // retry rebuilds at the frozen k), never shingles built at a k a
    // later bootstrap could silently re-freeze differently
    if (layoutOf(spark, path).isEmpty)
      Seq((kUse, capUse)).toDF("k", "max_bench_shingle_df")
        .coalesce(1).write
        .mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$path/_layout")
    val benchShRaw = Dedup.shingleTable(benchmark, idCol, textCol, kUse)
      .toDF("bench_id", "sh")
    val benchSh =
      if (capUse <= 0) benchShRaw
      else {
        val hot = benchShRaw.groupBy("sh")
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > capUse)
          .select("sh")
        benchShRaw.join(broadcast(hot), Seq("sh"), "left_anti")
      }
    benchSh.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/bench_sh/ver=$version")
  }

  /** A version must be a plain partition token everywhere it names a
    * directory — enforced at BOTH the write and retire entry points
    * AND re-checked on every ledger value [[purgeBenchIndex]] is about
    * to turn into a delete path: a ledger row containing '/' or '..'
    * segments would otherwise resolve at the filesystem level and
    * delete outside the store. The non-digit requirement keeps Spark's
    * partition-type inference from re-typing an all-digit `ver=2024`
    * directory as int (which would break every string-keyed mask).
    */
  private def requireVersionToken(version: String): Unit =
    require(version.matches("[A-Za-z0-9_-]+") && !version.matches("[0-9]+"),
      s"version '$version' must be a plain non-all-digit partition token")

  private def layoutOf(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[(Int, Int)] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(s"$path/_layout")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val r = spark.read.parquet(p.toString).head()
      Some((r.getInt(0), r.getInt(1)))
    }
  }

  /** RETIRE a benchmark version — the eval-rotation eviction: one row
    * appended to the `_retired/` ledger; every probe masks the
    * version's partition out, so retiring ≡ never having indexed it
    * (the q166 mask law for this store). The shingles stay on disk
    * until [[purgeBenchIndex]]; re-retiring is a no-op by read-side
    * dedup.
    */
  def retireBenchVersion(spark: org.apache.spark.sql.SparkSession,
      path: String, version: String): Unit = {
    requireVersionToken(version)
    import spark.implicits._
    Seq(version).toDF("ver").coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"$path/_retired")
  }

  private def retiredVersions(spark: org.apache.spark.sql.SparkSession,
      path: String): Set[String] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(s"$path/_retired")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else spark.read.parquet(p.toString).collect().map(_.getString(0)).toSet
  }

  /** Physically remove retired versions' shingle partitions (the
    * purge): each retired `ver=` directory is deleted whole — no other
    * partition is touched, no statistics exist to heal. The `_retired`
    * ledger is kept: a retired version stays retired (re-adding the
    * eval is a NEW version by contract).
    */
  def purgeBenchIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(s"$path/bench_sh")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    retiredVersions(spark, path).foreach { v =>
      // re-validate each ledger value before it becomes a delete path:
      // the ledger is data, and fs.delete resolves '/'-or-'..' segments
      requireVersionToken(v)
      fs.delete(new Path(s"$path/bench_sh/ver=$v"), true)
    }
  }

  /** [[overlapReport]] against the STORED benchmark: the batch is
    * shingled with the index's frozen k and joined against the LIVE
    * (non-retired) versions of `bench_sh/` — broadcast by construction
    * (evals are thousands of docs; the 100 TB side is the batch,
    * scanned in place and never shuffled). Where the benchmark
    * shingles live — and which retired versions still sit on disk —
    * cannot change an overlap count. With several live versions the
    * bench relation is deduped on (bench_id, sh) so an eval doc
    * carried by two releases cannot double-count an overlap; the
    * single-version store skips that exchange (the q179 plan).
    */
  def overlapFromIndex(corpus: DataFrame, idCol: String, textCol: String,
      path: String, minOverlap: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    val k = spark.read.parquet(s"$path/_layout").head().getInt(0)
    overlapFromIndexShingles(
      Dedup.shingleTable(corpus, idCol, textCol, k).toDF("corpus_id", "sh"),
      path, minOverlap)
  }

  /** The probe over an ALREADY-SHINGLED corpus relation (corpus_id,
    * sh) — the shared-tokenize composition hook: a pipeline that has
    * the corpus's shingle relation in hand (q196's one-tokenize
    * curation pass) probes the stored benchmark without re-reading
    * text. The caller owns shingling at the index's frozen k; the
    * version mask and multi-live dedup are identical to
    * [[overlapFromIndex]]'s (this IS its tail).
    */
  def overlapFromIndexShingles(corpusSh: DataFrame, path: String,
      minOverlap: Int = 3): DataFrame = {
    val spark = corpusSh.sparkSession
    val retired = retiredVersions(spark, path)
    // ver pinned back to string ([[CountLsm.readDeltas]]'s rule): the
    // write path rejects all-digit versions, but a hand-built store
    // must still read by contract, not by inference
    val benchAll = spark.read.parquet(s"$path/bench_sh")
      .withColumn("ver", col("ver").cast("string"))
      .filter(!col("ver").isin(retired.toSeq.map(x => x: Any): _*))
    val liveVers = benchAll.select(col("ver")).distinct()
      .collect().map(_.getString(0))
    val bench0 = benchAll.select(col("bench_id"), col("sh"))
    val bench =
      if (liveVers.length <= 1) bench0
      else bench0.dropDuplicates("bench_id", "sh")
    corpusSh
      .join(broadcast(bench), "sh")
      .groupBy("corpus_id", "bench_id")
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }
}
