package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multinomial Naive Bayes document classifier — the trained
  * quality/domain classifier of the fasttext-filter lineage (GPT-3/
  * Llama-style "does this look like the reference corpus?" gating,
  * domain routing, language verification): next to the UNtrained
  * heuristics ([[TextAnalysis.langId]], [[TextAnalysis.qualityScore]])
  * and the generative [[LanguageModel]] gate, this is the supervised
  * member of the curation family — it learns per-label token
  * likelihoods from a labeled slice and scores any later batch.
  *
  * Model (add-one Laplace, event model = token occurrences):
  *  - prior      `lp(y)  = ln(n_docs(y) / n_docs)`
  *  - likelihood `ll(y,t) = ln((c(y,t) + 1) / (n_tok(y) + V))`
  *  - floor      `fl(y)  = ln(1 / (n_tok(y) + V))` — the smoothed mass
  *    for tokens unseen under label y (including tokens outside the
  *    training vocabulary entirely), so held-out scoring is total:
  *    no token is ever dropped (the [[Bpe.docTokenCounts]] OOV lesson).
  *  - score(d,y) = lp(y) + Σ_occurrences ll/fl; prediction = argmax,
  *    ties broken by label ascending.
  *
  * Two serving shapes, the [[LanguageModel]] contract: [[trainModel]] +
  * [[classify]] fused in one session, or [[writeModel]] /
  * [[readModel]] persisting the model as two tables (`priors/` —
  * per-label scalars lp + fl, |labels| rows; `lik/` — (label, tok,
  * ll), vocabulary×labels-proportional) so a production gate scores
  * every future batch against the FROZEN counts: a document's class
  * must not depend on what arrived after it.
  *
  * Scale shape: training is two grouped aggregates over the token
  * relation (map-side combined) plus |labels|-row scalars; scoring
  * equi-joins the batch's token occurrences against the likelihood
  * table on (label, tok) — batch-sized vs vocabulary-sized, never a
  * cross product against the corpus; priors/floors ride a broadcast.
  * Per-doc sums follow the BM25 determinism discipline: contributions
  * rounded to 9 and summed as DECIMAL (order-invariant), the final
  * score rounded to 6 — so a DuckDB oracle replays the arithmetic
  * bit-exactly. The label fan-out multiplies the batch token relation
  * by |labels| (small: a classifier with thousands of labels would
  * instead prune candidates first); the argmax window partitions by
  * document with |labels| rows per partition — no skew possible.
  */
object NaiveBayes {

  /** Whitespace tokens, lowercased, empties dropped — the shared
    * tokenizer of [[TextAnalysis.tokens]]/[[LanguageModel]].
    */
  private def words(textCol: String) =
    filter(split(lower(col(textCol)), " "), x => x =!= "")

  /** The trained model: `priors` = (label, lp, fl) — one row per label;
    * `lik` = (label, tok, ll) — one row per (label, training token).
    */
  final case class Model(priors: DataFrame, lik: DataFrame)

  /** Train on `docs` (labelCol is the supervision). Documents with no
    * tokens still count toward the prior (they are labeled evidence),
    * they just contribute no likelihood rows.
    */
  def trainModel(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String): Model = {
    val tok = docs
      .select(col(labelCol).as("label"), explode(words(textCol)).as("tok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nl = tok.groupBy(col("label")).agg(count(lit(1)).as("n_tok"))
    val v = tok.agg(countDistinct(col("tok")).as("v"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val priors = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_y"))
      .crossJoin(broadcast(nDocs))
      .join(nl, Seq("label"))
      .crossJoin(broadcast(v))
      .select(col("label"),
        round(log(col("n_y").cast("double") / col("n_docs").cast("double")),
          9).as("lp"),
        round(log(lit(1.0) / (col("n_tok") + col("v")).cast("double")),
          9).as("fl"))
    val lik = tok.groupBy(col("label"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .join(nl, Seq("label"))
      .crossJoin(broadcast(v))
      .select(col("label"), col("tok"),
        round(log((col("c") + 1).cast("double") /
          (col("n_tok") + col("v")).cast("double")), 9).as("ll"))
    Model(
      CacheLifecycle.resolveAndRelease(priors),
      CacheLifecycle.resolveAndRelease(lik, tok))
  }

  /** Score `docs` against a (frozen or fresh) model: (id, pred_label,
    * score). Every token occurrence contributes — OOV and
    * label-unseen tokens land at the label's Laplace floor. Documents
    * with zero tokens are excluded (no evidence; mirror of
    * [[LanguageModel]]'s `len >= 2` rule).
    */
  def classify(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(words(textCol)).as("tok"))
    val scored = toks
      .crossJoin(broadcast(model.priors))
      .join(model.lik, Seq("label", "tok"), "left")
      .select(col(idCol), col("label"), col("lp"),
        coalesce(col("ll"), col("fl"))
          .cast(DecimalType(28, 10)).as("c"))
      .groupBy(col(idCol), col("label"), col("lp"))
      .agg(sum(col("c")).as("s"))
      .select(col(idCol), col("label"),
        round(col("lp") + col("s").cast("double"), 6).as("score"))
    val arg = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("label").asc)
    scored
      .withColumn("rk", row_number().over(arg))
      .filter(col("rk") === 1)
      .select(col(idCol), col("label").as("pred_label"), col("score"))
  }

  /** Persist a trained model: `priors/` (|labels| rows, coalesced to
    * one file) + `lik/` (vocabulary×labels rows).
    */
  def writeModel(model: Model, path: String): Unit = {
    val mode = org.apache.spark.sql.SaveMode.Overwrite
    model.priors.coalesce(1).write.mode(mode).parquet(s"$path/priors")
    model.lik.write.mode(mode).parquet(s"$path/lik")
  }

  /** Read a stored model back — scoring against it is byte-identical
    * to scoring against the in-session relations (where the counts
    * live cannot change a posterior).
    */
  def readModel(spark: SparkSession, path: String): Model =
    Model(spark.read.parquet(s"$path/priors"),
      spark.read.parquet(s"$path/lik"))
}
