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
}
