package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Keyword retrieval scoring over the token relation — the ranking step
  * between a text corpus and a search/eval harness. BM25 extends q61's
  * TF-IDF with document-length normalization and term-frequency
  * saturation (Robertson/Spärck Jones; the public formula every search
  * engine documents).
  *
  * Scale shape: per-term statistics (df) and per-document statistics
  * (dl) are grouped aggregates over the token relation; the query-term
  * filter lands BEFORE the tf aggregation, so the scored relation is
  * |query terms| × matching docs, never the corpus × vocabulary. The
  * global (N, avgdl) pair is a 1-row aggregate broadcast back — never a
  * keyless window. Top-k is a rank-and-limit on the scored relation.
  *
  * Cross-engine determinism: each term's contribution is computed in
  * doubles on identical operands, rounded to 9 decimals, and summed as
  * DECIMAL (exact, order-invariant — a plain double sum would depend on
  * aggregation order); the final score rounds to 6.
  */
object Retrieval {

  /** Top-`k` documents by BM25 for `query` terms:
    * (doc id, score). k1/b are the standard defaults.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String], k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark: SparkSession = docs.sparkSession
    val toks = TextAnalysis.tokenTable(docs, idCol, textCol)
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val qToks = toks.filter(col("tok").isin(query.map(x => x: Any): _*))
    val tf = qToks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = qToks.dropDuplicates(idCol, "tok")
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val tfd = col("tf").cast("double")
    val contrib = (idf * (tfd * lit(k1 + 1.0))) /
      (tfd + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    val scored = tf
      .join(broadcast(dfreq), "tok")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        round(contrib, 9).cast(DecimalType(28, 10)).as("c"))
      .groupBy(col(idCol))
      .agg(round(sum(col("c")).cast("double"), 6).as("score"))
    // global top-k = sort+limit, which Spark plans as TakeOrderedAndProject
    // (per-partition top-k, then a k·partitions-row merge) — never a
    // keyless window funneling the scored relation through one partition
    scored.orderBy(col("score").desc, col(idCol)).limit(k)
  }
}
